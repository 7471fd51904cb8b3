"""Metrics / observability writer.

Capability of the reference's TensorBoard summary plumbing (per-loss
scalars + histograms inside the loss, net_utils.py:361-370; train/val
writer dirs per (net, dataset), config.py:55-75; print-based step logs in
every entry script): scalars and histogram summaries written as both

- JSONL (``events.jsonl`` — machine-readable, no deps), and
- TensorBoard event files via ``tensorboardX`` when available.

Writers are cheap; callers pass already-realized host scalars (the Trainer
fetches metrics asynchronously so logging never syncs the device early).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping

import numpy as np

try:
    from tensorboardX import SummaryWriter  # type: ignore
except Exception:  # pragma: no cover
    SummaryWriter = None


class MetricsWriter:
    """Scalar/histogram writer for one stream (train or val)."""

    def __init__(self, logdir: str, tensorboard: bool = True):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "events.jsonl"), "a",
                           buffering=1)
        self._tb = (SummaryWriter(logdir)
                    if tensorboard and SummaryWriter is not None else None)

    def scalars(self, step: int, values: Mapping[str, Any]) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            rec[k] = float(np.asarray(v))
            if self._tb is not None:
                self._tb.add_scalar(k, rec[k], step)
        self._jsonl.write(json.dumps(rec) + "\n")

    def histogram(self, step: int, name: str, values: Any) -> None:
        arr = np.asarray(values).ravel()
        if self._tb is not None:
            self._tb.add_histogram(name, arr, step)
        qs = np.percentile(arr, [0, 25, 50, 75, 100]).tolist()
        self._jsonl.write(json.dumps(
            {"step": int(step), "hist": name, "quantiles": qs}) + "\n")

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
