"""ProcessPrefetchLoader: the multi-process producer (the reference's
10-worker pool semantics, ilsvrc2017_cls_multithread.py:119-154).

Same contract points as the thread-pool tests: no batch dropped or
duplicated across workers, end-of-stream after every worker drains, and
a worker exception surfaces in the parent (after delivery of whatever
already reached the queue). Factories are module-level so they pickle
under the spawn start method.
"""

import numpy as np
import pytest

from tensorflow_yolo2_tpu.data.prefetch import (
    EpochShardedStream,
    ProcessPrefetchLoader,
)

N_ITEMS = 24


def _sharded_factory(worker_id: int, num_workers: int):
    """Modulo-sharded stream (the reference's schedule): worker w yields
    w, w+n, w+2n, ... — together exactly range(N_ITEMS), once each."""
    it = iter(range(worker_id, N_ITEMS, num_workers))

    def get_batch():
        return ("item", next(it))

    return get_batch


def _failing_factory(worker_id: int, num_workers: int):
    state = {"n": 0}

    def get_batch():
        state["n"] += 1
        if worker_id == 0 and state["n"] > 2:
            raise ValueError("boom in worker 0")
        return (worker_id, state["n"])

    return get_batch


def test_no_drop_no_dup_across_workers():
    with ProcessPrefetchLoader(_sharded_factory, num_workers=2,
                               prefetch_size=4) as loader:
        got = sorted(item for _, item in loader)
    assert got == list(range(N_ITEMS))


def test_worker_error_propagates():
    loader = ProcessPrefetchLoader(_failing_factory, num_workers=2,
                                   prefetch_size=4)
    with pytest.raises(RuntimeError, match="boom in worker 0"):
        # worker 1 streams forever, so the error is guaranteed to be
        # reached rather than racing a StopIteration
        for _ in range(10_000):
            next(loader)
    loader.close()


class _FakeImdb:
    """Minimal classification-imdb duck type: gt_labels + image_read."""

    def __init__(self, n=N_ITEMS):
        self.gt_labels = [(str(i), i) for i in range(n)]

    def image_read(self, path):
        return np.full((2, 2, 3), int(path), np.float32)


def _fake_imdb_factory():
    return _FakeImdb()


def test_epoch_sharded_partition_per_epoch():
    """Worker slices of each epoch partition the dataset exactly, and the
    permutation changes between epochs (the reference's coordinated
    reshuffle, ilsvrc2017_cls_multithread.py:269-284)."""
    stream = EpochShardedStream(_fake_imdb_factory, batch_size=4, seed=3)
    per_epoch = []
    for epoch in (0, 1):
        merged = []
        for w in (0, 1, 2):
            merged += stream.epoch_slice(epoch, w, 3, N_ITEMS)
        assert sorted(merged) == list(range(N_ITEMS))  # exact partition
        per_epoch.append(merged)
    assert per_epoch[0] != per_epoch[1]  # reshuffled across epochs


def test_epoch_sharded_stream_exactly_once():
    """Run the worker-side streams in-process: 2 epochs × 3 workers
    deliver every example exactly twice, labels match image payloads."""
    stream = EpochShardedStream(_fake_imdb_factory, batch_size=4,
                                epochs=2, seed=1)
    seen = []
    for w in (0, 1, 2):
        get_batch = stream(w, 3)
        while True:
            try:
                images, labels = get_batch()
            except StopIteration:
                break
            assert (images[:, 0, 0, 0] == labels).all()
            seen += labels.tolist()
    assert sorted(seen) == sorted(list(range(N_ITEMS)) * 2)


def test_epoch_sharded_through_process_loader():
    """End-to-end through the process pool: exactly-once per epoch across
    worker PROCESSES, clean end-of-stream after the final epoch."""
    stream = EpochShardedStream(_fake_imdb_factory, batch_size=4,
                                epochs=2, seed=0)
    seen = []
    with ProcessPrefetchLoader(stream, num_workers=2,
                               prefetch_size=4) as loader:
        for images, labels in loader:
            seen += labels.tolist()
    assert sorted(seen) == sorted(list(range(N_ITEMS)) * 2)


def test_epoch_sharded_drop_remainder():
    """drop_remainder=True keeps every delivered batch full-size (static
    device shapes); at most batch·workers-1 examples drop per epoch."""
    stream = EpochShardedStream(_fake_imdb_factory, batch_size=5,
                                epochs=1, seed=0, drop_remainder=True)
    seen = []
    for w in (0, 1):
        get_batch = stream(w, 2)
        while True:
            try:
                images, labels = get_batch()
            except StopIteration:
                break
            assert labels.shape == (5,)
            seen += labels.tolist()
    assert len(seen) == len(set(seen)) == 20  # 2 workers × 2 full batches


def test_close_terminates_workers():
    loader = ProcessPrefetchLoader(_sharded_factory, num_workers=2,
                                   prefetch_size=2)
    next(loader)
    loader.close()
    assert not any(p.is_alive() for p in loader._procs)
