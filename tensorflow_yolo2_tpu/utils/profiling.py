"""Profiling / tracing support.

The reference's only tracing is the wall-clock Timer around sess.run
(SURVEY §5.1); the rebuild adds optional ``jax.profiler`` trace capture
(TensorBoard-viewable) around any code region, plus a step-rate reporter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


@contextlib.contextmanager
def maybe_trace(logdir: str | None) -> Iterator[None]:
    """Capture a jax.profiler trace into ``logdir`` when set."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepRate:
    """Images/sec estimator over a sliding window (the Timer's running
    average, but windowed so it tracks the steady state)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []

    def tick(self) -> None:
        self._times.append(time.perf_counter())
        if len(self._times) > self.window:
            self._times.pop(0)

    def rate(self, items_per_step: int = 1) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) * items_per_step / max(dt, 1e-9)
