"""ProcessPrefetchLoader: the multi-process producer (the reference's
10-worker pool semantics, ilsvrc2017_cls_multithread.py:119-154).

Same contract points as the thread-pool tests: no batch dropped or
duplicated across workers, end-of-stream after every worker drains, and
a worker exception surfaces in the parent (after delivery of whatever
already reached the queue). Factories are module-level so they pickle
under the spawn start method.
"""

import pytest

from tensorflow_yolo2_tpu.data.prefetch import ProcessPrefetchLoader

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


def test_close_terminates_workers():
    loader = ProcessPrefetchLoader(_sharded_factory, num_workers=2,
                                   prefetch_size=2)
    next(loader)
    loader.close()
    assert not any(p.is_alive() for p in loader._procs)
