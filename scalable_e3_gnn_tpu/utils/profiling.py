"""Tracing / profiling hooks (SURVEY.md §5.1).

Thin wrappers over jax.profiler: named trace annotations around the
build/gather/exchange/TP/scatter phases, a block-until-ready step timer, and
an on-demand trace dump for offline viewing (tensorboard/xprof format).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["annotate", "StepTimer", "trace_to"]


def annotate(name: str):
    """Trace annotation context (shows up in xprof timelines)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace_to(logdir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with device synchronization.

    Usage::
        timer = StepTimer()
        for batch in data:
            state, metrics = step(state, *batch)
            dt = timer.tick(metrics)   # blocks on metrics, returns seconds
    """

    def __init__(self) -> None:
        self._last: Optional[float] = None

    def tick(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        now = time.time()
        dt = 0.0 if self._last is None else now - self._last
        self._last = now
        return dt
