"""Minimal dependency-free XLSX writer.

The reference's basin analysis exports one XLSX per basin
(Basin_TWSA_Comparison_GRACE_Downscaled.ipynb cell 4, `df.to_excel`).
openpyxl is not in this image, but an .xlsx file is just a zip of XML
parts (ECMA-376 SpreadsheetML), so a single-sheet numeric/string table
needs ~100 lines of plain stdlib. Files open in Excel / LibreOffice /
pandas.read_excel.
"""
from __future__ import annotations

import zipfile
from pathlib import Path
from typing import Sequence
from xml.sax.saxutils import escape

import numpy as np

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(i: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    s = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def _cell(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, (np.integer, np.floating)):
        value = value.item()        # numpy scalars write as numbers, not text
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if value != value:          # NaN: emit an empty cell
            return ""
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    # inline string cell (no shared-strings table needed)
    return (f'<c r="{ref}" t="inlineStr"><is><t>'
            f"{escape(str(value))}</t></is></c>")


def write_xlsx(
    path,
    columns: Sequence[str],
    rows: Sequence[Sequence],
    sheet_name: str = "Sheet1",
) -> str:
    """Write a single-sheet table to `path`. `columns` become a header row;
    `rows` hold numbers (floats/ints; NaN -> blank) or strings."""
    lines = ["<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>",
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>']
    header = "".join(_cell(f"{_col_letter(j)}1", name)
                     for j, name in enumerate(columns))
    lines.append(f'<row r="1">{header}</row>')
    for i, row in enumerate(rows):
        r = i + 2
        cells = "".join(_cell(f"{_col_letter(j)}{r}", val)
                        for j, val in enumerate(row))
        lines.append(f'<row r="{r}">{cells}</row>')
    lines.append("</sheetData></worksheet>")
    sheet_xml = "\n".join(lines)

    path = Path(path)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml",
                   _WORKBOOK.format(name=escape(sheet_name[:31] or "Sheet1")))
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return str(path)
