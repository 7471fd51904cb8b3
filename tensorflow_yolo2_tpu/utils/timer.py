"""Wall-clock step timer (capability of reference src/utils/timer.py:10-32).

Uses ``time.perf_counter`` and is meant to wrap device steps whose results
have been ``block_until_ready``'d, so the measured interval is real step
time rather than async dispatch time.
"""

from __future__ import annotations

import time


class Timer:
    """tic/toc timer with running totals and average."""

    def __init__(self) -> None:
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0

    def tic(self) -> None:
        self.start_time = time.perf_counter()

    def toc(self, average: bool = True) -> float:
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff
