"""Structured logging.

The reference logs with bare ``print`` (SURVEY §5.5). This module provides a
JSON-lines metric logger (one file per run) plus a console mirror — enough to
plot training curves and feed dashboards without a heavyweight dependency.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional, TextIO


class RunLogger:
    def __init__(self, log_dir: Optional[str] = None, run_name: str = "run",
                 console: bool = True, stream: TextIO = sys.stderr):
        self.console = console
        self.stream = stream
        self._fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            path = os.path.join(log_dir, f"{run_name}-{int(time.time())}.jsonl")
            self._fh = open(path, "a")
            self.path = path
        else:
            self.path = None
        self._t0 = time.time()

    def log(self, event: str, **fields: Any) -> Dict[str, Any]:
        rec = {"t": round(time.time() - self._t0, 3), "event": event, **fields}
        line = json.dumps(rec, default=_json_safe)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.console:
            short = " ".join(f"{k}={_fmt(v)}" for k, v in fields.items())
            print(f"[{rec['t']:9.2f}s] {event}: {short}", file=self.stream)
        return rec

    def metrics(self, step: int, **metrics: float):
        return self.log("metrics", step=step, **metrics)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


def _json_safe(o):
    try:
        return float(o)
    except Exception:
        return str(o)


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.4g}"
    return v
