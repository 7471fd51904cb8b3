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


# Analytic FLOPs model for the served detection graph, so throughput can
# be reported as model FLOPs utilization (MFU = achieved FLOP/s ÷ peak)
# and perf regressions show up in efficiency terms, not just img/s.
#
# The Darknet19 detection schedule (models/darknet.py, mirroring the
# reference darknet.py:126-201): (kernel, out_channels) convs, "M" = 2×2
# stride-2 maxpool. Elementwise BN/leaky/pool work is excluded — MFU
# conventionally counts the matmul/conv MACs only.
DARKNET19_DETECTION_SCHEDULE = (
    (3, 32), "M", (3, 64), "M", (3, 128), (1, 64), (3, 128), "M",
    (3, 256), (1, 128), (3, 256), "M", (3, 512), (1, 256), (3, 512),
    (1, 256), (3, 512), "M", (3, 1024), (1, 512), (3, 1024), (1, 512),
    (3, 1024),
    # detection head (darknet.py:182-201)
    (3, 1024), (3, 1024), (3, 1024), (1, 30))

# Per-chip peak dense compute, TPU v5e (public spec: 197 TFLOP/s bf16;
# int8 runs the MXU at double rate).
V5E_PEAK_FLOPS = {"bf16": 197e12, "int8": 394e12}


def conv_flops_per_image(image_size: int,
                         schedule=DARKNET19_DETECTION_SCHEDULE,
                         in_channels: int = 3) -> float:
    """Forward-pass conv FLOPs (2 × MACs) for one image through a
    (kernel, channels)/"M" schedule at ``image_size``²."""
    hw = image_size
    cin = in_channels
    flops = 0.0
    for item in schedule:
        if item == "M":
            hw = (hw + 1) // 2
            continue
        k, cout = item
        flops += 2.0 * hw * hw * k * k * cin * cout
        cin = cout
    return flops


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
