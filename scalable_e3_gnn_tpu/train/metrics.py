"""Structured per-step metrics: JSONL + stdout (SURVEY.md §5.5).

The reference has no observability at all (not even a live print); the
framework logs loss, throughput (edges/s), timing, and any user scalars as
one JSON object per step, machine-parseable and cheap.
"""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional

__all__ = ["MetricsLogger"]


class MetricsLogger:
    def __init__(
        self,
        path: Optional[str] = None,
        stdout_every: int = 100,
        stream: Optional[IO] = None,
    ) -> None:
        self._file = open(path, "a") if path else None
        self._stdout_every = stdout_every
        self._stream = stream or sys.stdout
        self._t_last = time.time()

    def log(self, step: int, scalars: dict, edges: Optional[int] = None) -> None:
        now = time.time()
        dt = now - self._t_last
        self._t_last = now
        rec = {"step": step, "time_s": round(dt, 5)}
        rec.update({k: float(v) for k, v in scalars.items()})
        if edges is not None and dt > 0:
            rec["edges_per_s"] = round(edges / dt, 1)
        line = json.dumps(rec)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self._stdout_every and step % self._stdout_every == 0:
            print(line, file=self._stream, flush=True)

    def close(self) -> None:
        if self._file:
            self._file.close()
