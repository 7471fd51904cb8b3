"""Host→device prefetch pipeline.

TPU-native replacement for the reference's hand-rolled data parallelism
(ilsvrc2017_cls_multithread.py:119-318): 10 multiprocessing workers with
paired queues, shared readiness flags and modulo-scheduled refills. Here:

- :class:`PrefetchLoader` — a thread pool calls ``imdb.get()`` (or any
  batch factory) concurrently into a bounded queue, keeping the host
  decode/augment work off the critical path. cv2/numpy release the GIL for
  the heavy work, so threads give process-level throughput without the
  pickling tax the reference pays on every queue transfer.
- :class:`ProcessPrefetchLoader` — the same contract over worker
  *processes* (each building its own imdb via a picklable factory), the
  direct analog of the reference's 10-process pool, for python-bound
  (GIL-holding) pipelines on multi-core hosts.
- :func:`device_prefetch` — wraps any host batch iterator with a
  ``jax.device_put`` double buffer: batch N+1 is already on (or on its way
  to) the device while batch N computes, so the step never waits on PCIe.
  With a sharding, the put lands each shard on its mesh device — the
  per-host sharded-batch feed for data-parallel training (SURVEY §2.3).

Together these fix the reference's #1 perf bug: the sequential per-image
cv2 decode inside the train loop stalling the accelerator
(pascal_voc.py:42-58 called synchronously at pascal_train_darknet.py:96).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax


class _NullLock:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class PrefetchLoader:
    """Concurrent batch producer over a ``get()``-style imdb.

    Semantics match the reference machinery: steady-state full pipelining,
    epoch handling inside the imdb, no batch dropped or duplicated.
    With several workers, delivery order may interleave (a worker can be
    descheduled between producing and enqueuing); ``num_workers=1``
    preserves exact sequential batch order.
    """

    def __init__(self, get_batch: Callable[[], Any], num_workers: int = 4,
                 prefetch_size: int = 8, thread_safe: bool = False):
        """``thread_safe=True`` declares that concurrent ``get_batch()``
        calls are safe (the imdbs in ``data`` do their cursor bookkeeping
        under an internal lock and decode outside it) — workers then run
        the heavy decode/augment work truly in parallel. The default
        serializes calls for arbitrary callables."""
        self._get_batch = get_batch
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch_size)
        self._stop = threading.Event()    # no further get_batch() calls
        self._closed = threading.Event()  # abandon in-flight puts (close())
        self._error: Optional[BaseException] = None
        self._get_lock = (threading.Lock() if not thread_safe
                          else _NullLock())
        self._threads = [
            threading.Thread(target=self._worker, daemon=True,
                             name=f"prefetch-{i}")
            for i in range(num_workers)
        ]
        for t in self._threads:
            t.start()

    def _worker(self) -> None:
        while not self._stop.is_set():
            try:
                with self._get_lock:
                    if self._stop.is_set():
                        return
                    batch = self._get_batch()
            except BaseException as e:  # surface after the queue drains
                self._error = e
                self._stop.set()
                return
            # deliver even when another worker stopped the pool (an error
            # elsewhere must not drop this already-produced batch); only
            # close() abandons in-flight puts
            while not self._closed.is_set():
                try:
                    self._queue.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> "PrefetchLoader":
        return self

    def __next__(self) -> Any:
        # drain-first semantics: every batch that reached the queue is
        # delivered before a stored error / end-of-stream is surfaced
        while True:
            try:
                return self._queue.get(timeout=0.05)
            except queue.Empty:
                if self._stop.is_set() and \
                        not any(t.is_alive() for t in self._threads):
                    # a worker can enqueue its final batch and exit between
                    # the timed get above and the aliveness check — drain
                    # that straggler before surfacing end-of-stream
                    try:
                        return self._queue.get_nowait()
                    except queue.Empty:
                        pass
                    if self._error is not None and \
                            not isinstance(self._error, StopIteration):
                        raise self._error
                    raise StopIteration
                continue

    def close(self) -> None:
        self._stop.set()
        self._closed.set()
        # drain so workers blocked on put() can exit, then join them so no
        # worker keeps consuming the shared imdb cursor after close()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        for t in self._threads:
            t.join(timeout=5.0)
        # a worker's final put can land after the drain above
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self) -> "PrefetchLoader":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()


class _WorkerDone:
    """End-of-stream sentinel (one per worker)."""


class _WorkerError:
    def __init__(self, formatted: str):
        self.formatted = formatted


def _pp_worker(factory, worker_id: int, num_workers: int, q, stop) -> None:
    """Child-process body: build this worker's own producer and stream.

    Top-level so it pickles under the spawn start method.
    """
    try:
        get_batch = factory(worker_id, num_workers)
        while not stop.is_set():
            try:
                batch = get_batch()
            except StopIteration:
                q.put(_WorkerDone())
                return
            while not stop.is_set():
                try:
                    q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue
    except BaseException:  # surfaced in the parent's __next__
        import traceback

        try:
            q.put(_WorkerError(traceback.format_exc()), timeout=5.0)
        except queue.Full:
            pass


class ProcessPrefetchLoader:
    """Multi-PROCESS batch producer — the reference's 10-worker
    multiprocessing pool (ilsvrc2017_cls_multithread.py:119-154) for
    pipelines whose per-batch python work does NOT release the GIL
    (pure-numpy augmentation, label-grid building, pickle parsing) and
    therefore cannot scale on :class:`PrefetchLoader`'s threads.

    ``factory(worker_id, num_workers)`` is a picklable module-level
    callable that builds and returns this worker's ``get_batch`` inside
    the child process — each worker owns a private imdb (no shared
    cursor, no lock). For shuffled training streams a per-worker seed is
    all the sharding needed; when every example must appear exactly once
    per epoch, shard inside the factory (e.g. take every
    ``num_workers``-th entry starting at ``worker_id`` — the reference's
    modulo schedule).

    Costs vs threads: one fork/spawn + imdb build per worker at startup,
    and a pickle/unpickle per batch transfer (~30 MB for a 48×224² f32
    batch) — the same tax the reference pays on every queue hop. Measure
    with ``benchmarks/host_pipeline.py`` before choosing; on a 1-core
    host threads win, processes only pay off with real cores.
    """

    def __init__(self, factory: Callable[[int, int], Callable[[], Any]],
                 num_workers: int = 4, prefetch_size: int = 8,
                 start_method: str = "spawn"):
        import multiprocessing as mp

        # spawn by default: forking a parent whose JAX/TPU-tunnel state is
        # live can deadlock the child; spawn children start clean
        ctx = mp.get_context(start_method)
        self._queue = ctx.Queue(maxsize=prefetch_size)
        self._stop = ctx.Event()
        self._live = num_workers
        self._procs = [
            ctx.Process(target=_pp_worker,
                        args=(factory, i, num_workers, self._queue,
                              self._stop),
                        daemon=True, name=f"prefetch-proc-{i}")
            for i in range(num_workers)
        ]
        for proc in self._procs:
            proc.start()

    def __iter__(self) -> "ProcessPrefetchLoader":
        return self

    def __next__(self) -> Any:
        while True:
            try:
                item = self._queue.get(timeout=0.1)
            except queue.Empty:
                if self._live <= 0 or \
                        not any(p.is_alive() for p in self._procs):
                    # all workers gone; anything still buffered was
                    # delivered by the timed get above
                    raise StopIteration
                continue
            if isinstance(item, _WorkerDone):
                self._live -= 1
                if self._live <= 0:
                    raise StopIteration
                continue
            if isinstance(item, _WorkerError):
                self.close()
                raise RuntimeError(
                    "prefetch worker process failed:\n" + item.formatted)
            return item

    def close(self) -> None:
        if getattr(self, "_pp_closed", False):  # idempotent
            return
        self._pp_closed = True
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        for p in self._procs:
            p.join(timeout=5.0)
        for p in self._procs:
            if p.is_alive():
                p.terminate()
                p.join(timeout=5.0)
        self._queue.close()
        self._queue.cancel_join_thread()

    def __enter__(self) -> "ProcessPrefetchLoader":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()


def _classification_example(imdb: Any, entry: Any) -> tuple[Any, Any]:
    """Default example reader for :class:`EpochShardedStream`: the
    ``(path, class_index)`` entries + ``image_read`` convention shared by
    the classification imdbs (IlsvrcCls, TFFlowers)."""
    path, cls = entry
    return imdb.image_read(path), cls


class EpochShardedStream:
    """Exactly-once-per-epoch sharding for :class:`ProcessPrefetchLoader`.

    The reference's 10-process pool coordinates epoch rollover centrally —
    drain every worker, reshuffle the global list, re-prime all workers
    (ilsvrc2017_cls_multithread.py:269-284). This helper gives the same
    guarantee with ZERO cross-process coordination: every worker derives
    the SAME epoch-``e`` global permutation from ``(seed, e)`` and reads
    its modulo slice ``perm_e[worker_id::num_workers]``. The slices
    partition the index set, so across workers each example is delivered
    exactly once per epoch, and every epoch boundary is a fresh,
    globally-coordinated reshuffle — no drain barrier needed because the
    permutation is a pure function, not shared state.

    An instance IS the ``factory(worker_id, num_workers)`` callable that
    :class:`ProcessPrefetchLoader` expects (also works single-process for
    tests). ``imdb_factory`` must be a picklable module-level callable
    building the worker's private imdb; it must be deterministic (every
    worker sees the same ``gt_labels`` list — the imdbs' constructor-seed
    shuffles satisfy this). ``example_fn(imdb, entry)`` maps one
    ``gt_labels`` entry to ``(image, label)``; the default covers the
    classification imdbs. Epoch remainders are delivered as a final
    partial batch (``drop_remainder=True`` for fixed device shapes drops
    ``len % (batch · workers)`` examples per epoch, like the reference's
    ``len // batch_size`` schedule).

    Finite ``epochs`` ends the stream (StopIteration → the loader's
    end-of-stream after all workers drain); ``epochs=None`` streams
    forever.
    """

    def __init__(self, imdb_factory: Callable[[], Any], batch_size: int,
                 epochs: Optional[int] = None, seed: int = 0,
                 example_fn: Optional[Callable[[Any, Any], tuple]] = None,
                 drop_remainder: bool = False):
        self._imdb_factory = imdb_factory
        self._batch_size = batch_size
        self._epochs = epochs
        self._seed = seed
        self._example_fn = example_fn
        self._drop_remainder = drop_remainder

    def epoch_slice(self, epoch: int, worker_id: int, num_workers: int,
                    n: int) -> list[int]:
        """Worker ``worker_id``'s index slice of epoch ``epoch`` — the
        modulo slice of the epoch-keyed global permutation. Pure function
        of its arguments: every worker computes identical permutations."""
        import random as _random

        perm = list(range(n))
        _random.Random(self._seed * 1_000_003 + epoch).shuffle(perm)
        return perm[worker_id::num_workers]

    def __call__(self, worker_id: int, num_workers: int
                 ) -> Callable[[], Any]:
        import numpy as _np

        imdb = self._imdb_factory()
        example_fn = self._example_fn or _classification_example
        n = len(imdb.gt_labels)

        def batches():
            epoch = 0
            while self._epochs is None or epoch < self._epochs:
                idxs = self.epoch_slice(epoch, worker_id, num_workers, n)
                for lo in range(0, len(idxs), self._batch_size):
                    part = idxs[lo:lo + self._batch_size]
                    if self._drop_remainder and \
                            len(part) < self._batch_size:
                        break
                    pairs = [example_fn(imdb, imdb.gt_labels[i])
                             for i in part]
                    images = _np.stack([p[0] for p in pairs])
                    labels = _np.asarray([p[1] for p in pairs])
                    yield images, labels
                epoch += 1

        it = batches()
        return lambda: next(it)


def device_prefetch(iterator: Iterator[Any], size: int = 2,
                    sharding: Any | None = None) -> Iterator[Any]:
    """Double-buffer host batches onto the device.

    Keeps ``size`` batches in flight via ``jax.device_put`` (async on TPU),
    optionally with a ``jax.sharding.Sharding`` so each data-parallel shard
    lands on its own device.
    """
    buf: list[Any] = []

    def put(batch: Any) -> Any:
        if sharding is not None:
            if jax.process_count() > 1:
                # per-host feed: this host contributes its local shard
                return jax.tree_util.tree_map(
                    lambda x: jax.make_array_from_process_local_data(
                        sharding, x), batch)
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    try:
        for _ in range(size):
            buf.append(put(next(iterator)))
    except StopIteration:
        pass

    while buf:
        out = buf.pop(0)
        try:
            buf.append(put(next(iterator)))
        except StopIteration:
            pass
        yield out
