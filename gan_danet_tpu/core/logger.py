"""Structured metrics logging.

The reference's observability is print() statements and matplotlib figures
(SURVEY.md §5). Here every metric event is a JSONL record (machine-parseable
for the bench harness) plus an optional mirrored print.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = Path(path) if path else None
        self.echo = echo
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(self.path, "a")
        else:
            self._fh = None
        self._t0 = time.time()

    def log(self, event: str, **fields):
        rec = {"event": event, "t": round(time.time() - self._t0, 3), **fields}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.echo:
            kv = ", ".join(
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in fields.items()
            )
            print(f"[{event}] {kv}", file=sys.stderr)

    def close(self):
        if self._fh:
            self._fh.close()
