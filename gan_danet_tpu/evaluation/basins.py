"""Per-basin TWSA analysis (capability parity:
Basin_TWSA_Comparison_GRACE_Downscaled.ipynb), without geopandas.

The reference loads `Union/TP_basins.shp` with geopandas, builds
point-in-polygon masks on both grids, and exports per-basin mean time
series. geopandas is not available here, so this module includes a minimal
pure-NumPy ESRI shapefile reader (polygon records) and an even-odd
ray-casting point-in-polygon test vectorised over grid points.
"""
from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np


def read_shapefile_polygons(shp_path) -> List[List[np.ndarray]]:
    """Parse polygon records from a .shp file.

    Returns a list of shapes; each shape is a list of rings, each ring an
    (n, 2) array of (x, y) = (lon, lat). Supports shape types 5 (Polygon)
    and 15 (PolygonZ).
    """
    data = Path(shp_path).read_bytes()
    if struct.unpack(">i", data[0:4])[0] != 9994:
        raise ValueError("not an ESRI shapefile")
    shapes: List[List[np.ndarray]] = []
    pos = 100
    n = len(data)
    while pos + 8 <= n:
        (_, content_len) = struct.unpack(">ii", data[pos : pos + 8])
        pos += 8
        rec_end = pos + content_len * 2
        (shape_type,) = struct.unpack("<i", data[pos : pos + 4])
        if shape_type in (5, 15):
            num_parts, num_points = struct.unpack(
                "<ii", data[pos + 36 : pos + 44])
            parts = np.frombuffer(data, "<i4", num_parts, pos + 44)
            pts_off = pos + 44 + 4 * num_parts
            pts = np.frombuffer(data, "<f8", num_points * 2, pts_off)
            pts = pts.reshape(num_points, 2)
            bounds = np.append(parts, num_points)
            shapes.append([pts[bounds[i] : bounds[i + 1]].copy()
                           for i in range(num_parts)])
        elif shape_type == 0:  # null shape
            shapes.append([])
        pos = rec_end
    return shapes


def read_shapefile_names(dbf_path, field: Optional[str] = None) -> List[str]:
    """Pull a string attribute per record from the companion .dbf
    (dBase III) file; defaults to the first character field."""
    data = Path(dbf_path).read_bytes()
    n_records = struct.unpack("<i", data[4:8])[0]
    header_size, record_size = struct.unpack("<hh", data[8:12])
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\x00")[0].decode("ascii", "ignore")
        ftype = chr(data[pos + 11])
        length = data[pos + 16]
        fields.append((name, ftype, length))
        pos += 32
    target = field or next(
        (f[0] for f in fields if f[1] == "C"), fields[0][0])
    names = []
    rec_pos = header_size
    for _ in range(n_records):
        off = rec_pos + 1
        for name, _ftype, length in fields:
            if name == target:
                raw = data[off : off + length]
                names.append(raw.decode("ascii", "ignore").strip())
                break
            off += length
        rec_pos += record_size
    return names


def points_in_polygon(lon: np.ndarray, lat: np.ndarray,
                      rings: List[np.ndarray]) -> np.ndarray:
    """Even-odd ray casting across all rings (outer boundaries + holes),
    vectorised over flat (lon, lat) point arrays."""
    inside = np.zeros(lon.shape, dtype=bool)
    for ring in rings:
        x, y = ring[:, 0], ring[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        for xi, yi, xj, yj in zip(x, y, x2, y2):
            crosses = ((yi > lat) != (yj > lat)) & (
                lon < (xj - xi) * (lat - yi) / (yj - yi + 1e-300) + xi
            )
            inside ^= crosses
    return inside


def basin_masks(
    shp_path,
    grid_hw: Tuple[int, int],
    lat_range: Tuple[float, float],
    lon_range: Tuple[float, float],
    dbf_field: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """{basin_name: (H, W) bool mask} on a regular (lat, lon) grid."""
    shapes = read_shapefile_polygons(shp_path)
    dbf = Path(shp_path).with_suffix(".dbf")
    if dbf.exists():
        names = read_shapefile_names(dbf, dbf_field)
    else:
        names = [f"basin_{i}" for i in range(len(shapes))]

    h, w = grid_hw
    lat = np.linspace(lat_range[0], lat_range[1], h)
    lon = np.linspace(lon_range[0], lon_range[1], w)
    lat2, lon2 = np.meshgrid(lat, lon, indexing="ij")
    out = {}
    for name, rings in zip(names, shapes):
        if not rings:
            continue
        mask = points_in_polygon(lon2.ravel(), lat2.ravel(), rings)
        out[name or f"basin_{len(out)}"] = mask.reshape(h, w)
    return out


def basin_series(
    cube: np.ndarray,
    masks: Dict[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """Per-basin spatial-mean time series from a (T, H, W) cube."""
    out = {}
    for name, mask in masks.items():
        if mask.any():
            out[name] = np.nanmean(np.where(mask[None], cube, np.nan),
                                   axis=(1, 2))
    return out


def export_basin_analysis(
    cube_downscaled: np.ndarray,
    cube_grace: np.ndarray,
    masks_low: Dict[str, np.ndarray],
    masks_high: Dict[str, np.ndarray],
    out_dir,
) -> None:
    """Per-basin comparison tables + figures (the reference's
    Basin_TWSA_Comparison notebook writes an XLSX and PNG per basin;
    we emit XLSX via the stdlib writer in utils/xlsx.py, plus CSV and
    PNG)."""
    import pandas as pd

    from gan_danet_tpu.evaluation.plots import _plt
    from gan_danet_tpu.utils.xlsx import write_xlsx

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    ds = basin_series(cube_downscaled, masks_high)
    gs = basin_series(cube_grace, masks_low)
    plt = _plt()
    for name in ds:
        if name not in gs:
            continue
        n = min(len(ds[name]), len(gs[name]))
        df = pd.DataFrame({"downscaled": ds[name][:n], "grace": gs[name][:n]})
        safe = "".join(c if c.isalnum() else "_" for c in name)
        df.to_csv(out / f"basin_{safe}.csv", index=False)
        write_xlsx(out / f"basin_{safe}.xlsx", list(df.columns),
                   df.to_numpy().tolist(), sheet_name=name[:31] or "basin")
        fig, ax = plt.subplots(figsize=(10, 4))
        ax.plot(df["grace"], label="GRACE")
        ax.plot(df["downscaled"], label="Downscaled")
        ax.set_title(name)
        ax.legend()
        fig.savefig(out / f"basin_{safe}.png", dpi=150, bbox_inches="tight")
        plt.close(fig)
