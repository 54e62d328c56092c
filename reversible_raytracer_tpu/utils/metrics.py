"""Structured per-step metrics (SURVEY.md §5.5: the reference printed the
loss per iteration; here every step emits a structured record to stdout
and/or a JSONL file)."""

from __future__ import annotations

import json
import os
import sys
import time
from dataclasses import dataclass, field


@dataclass
class MetricsLogger:
    jsonl_path: str | None = None
    echo: bool = True
    _fh: object = field(default=None, repr=False)
    _t0: float = field(default_factory=time.perf_counter, repr=False)

    def __post_init__(self):
        if self.jsonl_path:
            os.makedirs(os.path.dirname(os.path.abspath(self.jsonl_path)), exist_ok=True)
            self._fh = open(self.jsonl_path, "a", buffering=1)

    def log(self, **record) -> None:
        record.setdefault("t", round(time.perf_counter() - self._t0, 6))
        if self._fh is not None:
            self._fh.write(json.dumps(record) + "\n")
        if self.echo:
            parts = []
            for k, v in record.items():
                if isinstance(v, float):
                    parts.append(f"{k}={v:.6g}")
                else:
                    parts.append(f"{k}={v}")
            print("  ".join(parts), file=sys.stderr)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
