"""Host→device prefetch pipeline.

TPU-native replacement for the reference's hand-rolled data parallelism
(ilsvrc2017_cls_multithread.py:119-318): 10 multiprocessing workers with
paired queues, shared readiness flags and modulo-scheduled refills. Here:

- :class:`PrefetchLoader` — a thread pool calls ``imdb.get()`` (or any
  batch factory) concurrently into a bounded queue, keeping the host
  decode/augment work off the critical path. cv2/numpy release the GIL for
  the heavy work, so threads give process-level throughput without the
  pickling tax the reference pays on every queue transfer.
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
