"""Tracing/profiling hooks.

The reference has wall-clock timers only (run_train.py:270-271, :338-340);
this module keeps those (the loop logs per-chunk/epoch timings) and adds
real device profiling: ``trace(dir)`` wraps a region in a
``jax.profiler`` trace viewable in TensorBoard/XProf, and ``Timer``
provides the coarse host-side timers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

__all__ = ["trace", "Timer"]


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Device profiler trace when ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        return dt
