"""Shared in-memory imdb: lock-guarded cursor/shuffle over arrays.

The uniform batch-getter logic (cursor advance, epoch-end reshuffle,
[-1, 1] scaling) for every dataset that fits in host RAM — MNIST,
CIFAR-10, prepared shards, synthetic fixtures. Cursor bookkeeping runs
under a lock so ``PrefetchLoader(thread_safe=True)`` workers can share
one imdb (the contract of data/prefetch.py; the reference's analog is
the per-batch readiness-flag assertion of
ilsvrc2017_cls_multithread.py:133-135).
"""

from __future__ import annotations

import threading

import numpy as np


class InMemoryImdb:
    """Base imdb over in-memory (images, labels) arrays.

    Subclasses set ``batch_size``, ``_images`` (uint8, scaled to [-1, 1]
    at batch time, or float32 passed through) and ``_labels``, then call
    :meth:`_init_order`.
    """

    batch_size: int
    # Optional per-image preprocessing override (the slim
    # preprocessing_name path, train_image_classifier.py:428-435): a
    # fn(uint8 HWC image) -> float32 image applied instead of the
    # default [-1, 1] scaling. Images are passed in their stored
    # channel order (RGB for CIFAR-10, single-channel for MNIST).
    preprocess_fn = None

    def _init_order(self, seed: int) -> None:
        self._rng = np.random.RandomState(seed)
        self._order = self._rng.permutation(len(self._labels))
        self.cursor = 0
        self.epoch = 1
        self._lock = threading.Lock()

    @property
    def total_batch(self) -> int:
        return max(1, len(self._labels) // self.batch_size)

    def _pick(self) -> list:
        """Advance the cursor by one batch under the lock."""
        with self._lock:
            idx = []
            for _ in range(self.batch_size):
                idx.append(self._order[self.cursor])
                self.cursor += 1
                if self.cursor >= len(self._order):
                    self._order = self._rng.permutation(len(self._labels))
                    self.cursor = 0
                    self.epoch += 1
        return idx

    def get(self) -> tuple[np.ndarray, np.ndarray]:
        idx = self._pick()
        images = self._images[idx]
        if self.preprocess_fn is not None:
            images = np.stack([self.preprocess_fn(im) for im in images])
        elif images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0 * 2.0 - 1.0
        return images, self._labels[idx]
