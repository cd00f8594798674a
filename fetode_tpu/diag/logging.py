"""Structured metric logging (jsonl) + stdout formatting.

The reference logs with bare prints (SURVEY.md §5.5); this adds the
structured sink the framework needs: one JSON object per event appended to
a run file, plus an optional pretty console line.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            # truncate previous run
            open(path, "w").close()

    def log(self, step: int, **metrics):
        rec = {"step": step, "wall": round(time.time() - self._t0, 3),
               **{k: (float(v) if hasattr(v, "__float__") else v)
                  for k, v in metrics.items()}}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self.echo:
            parts = " | ".join(f"{k} {v:.6g}" if isinstance(v, float)
                               else f"{k} {v}" for k, v in rec.items()
                               if k not in ("wall",))
            print(parts, flush=True)
        return rec

    def read(self):
        if not self.path or not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(l) for l in f if l.strip()]
