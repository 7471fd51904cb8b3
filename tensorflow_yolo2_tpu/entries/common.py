"""Shared wiring for the CLI entries: the generic train loop
(imdb → prefetch → jitted step → metrics → periodic checkpoints) and the
resume/warm-start bootstrap, factored out of what every reference entry
script re-implements inline (e.g. pascal_train_darknet.py:57-114)."""

from __future__ import annotations

import argparse
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import Paths
from tensorflow_yolo2_tpu.data.prefetch import PrefetchLoader, device_prefetch
from tensorflow_yolo2_tpu.train.checkpoint import (
    CheckpointManager,
    merge_pytrees,
    warm_start_params,
)
from tensorflow_yolo2_tpu.train.metrics import MetricsWriter
from tensorflow_yolo2_tpu.train.trainer import Trainer, TrainState
from tensorflow_yolo2_tpu.utils.timer import Timer


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--iters", type=int, default=None,
                   help="additional training iterations")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--save-every", type=int, default=None)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--eval-every", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--num-workers", type=int, default=4,
                   help="host prefetch workers")
    p.add_argument("--data-path", default=None)
    p.add_argument("--tf-checkpoint", default=None,
                   help="TF1 checkpoint to import weights from")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace into this dir")
    return p


def bootstrap_state(trainer: Trainer, mgr: CheckpointManager,
                    rng: jax.Array, sample_images: np.ndarray,
                    warm_start_dir: Optional[str] = None,
                    warm_start_exclude: tuple[str, ...] = (),
                    warm_start_tree: Optional[tuple[Any, Any]] = None,
                    params_override: Any = None,
                    batch_stats_override: Any = None,
                    info: Optional[dict] = None) -> tuple[TrainState, int]:
    """Resume-or-initialize (the decision tree of net_utils.py:64-219):

    1. newest checkpoint under this run's dir → exact resume;
    2. otherwise warm-start params from ``warm_start_dir`` (another run's
       snapshot) minus excluded scopes — or from ``warm_start_tree``, an
       already-loaded (params, batch_stats) pair (e.g. a TF-checkpoint
       import; slim's _get_init_fn with checkpoint_exclude_scopes);
    3. otherwise fresh init (or explicit overrides, e.g. TF import).

    ``info`` (if given) receives restore diagnostics — currently
    ``ema_restored``: how many EMA tensors came from the snapshot (-1 for
    an exact full restore), so callers can detect an ``--use-ema`` eval of
    a snapshot trained without EMA.
    """
    if info is None:
        info = {}
    info["ema_restored"] = 0
    state = trainer.create_state(rng, sample_images,
                                 params_override=params_override,
                                 batch_stats_override=batch_stats_override)
    last = mgr.latest_step()
    if last is not None:
        try:
            state, step = mgr.restore(state)
            if state.ema_params is not None:
                info["ema_restored"] = -1  # exact restore incl. EMA slot
        except ValueError:
            # snapshot was written under a different optimizer: restore
            # params/stats by intersection and re-init the optimizer state
            # (the reference's optimizer-swap path, net_utils.py:203-212)
            raw = mgr.restore_raw()
            params, _ = merge_pytrees(state.params, raw.get("params"))
            stats, _ = merge_pytrees(state.batch_stats,
                                     raw.get("batch_stats", {}))
            ema = state.ema_params
            if ema is not None and raw.get("ema_params") is not None:
                ema, info["ema_restored"] = merge_pytrees(
                    ema, raw["ema_params"])
            elif ema is not None:
                # snapshot carries no EMA slot (trained without EMA):
                # restart the EMA from the restored params — keeping the
                # fresh-init copy would blend random weights into the
                # average for ~1/(1-decay) steps and poison later
                # snapshots' EMA slots
                ema = jax.tree_util.tree_map(jnp.copy, params)
            state = trainer.resume_optimizer(
                state.replace(params=params, batch_stats=stats,
                              ema_params=ema))
            step = mgr.latest_step()
            print("Optimizer state in snapshot does not match — restored "
                  "params/stats only, optimizer re-initialized")
        print(f"Restored snapshot at {mgr.interval} {step} from {mgr.dir}")
        return trainer.shard_state(state), step
    def _ema_from(params):
        # EMA must restart from the warm-started params, not the fresh
        # init create_state copied — and must hold distinct buffers
        # (donating the same buffer via two tree leaves is an error)
        if state.ema_params is None:
            return None
        return jax.tree_util.tree_map(jnp.copy, params)

    if warm_start_dir:
        params, n = warm_start_params(state.params, warm_start_dir,
                                      warm_start_exclude)
        print(f"Warm-started {n} tensors from {warm_start_dir}")
        state = trainer.shard_state(
            state.replace(params=params, ema_params=_ema_from(params)))
    elif warm_start_tree is not None:
        params, n = merge_pytrees(state.params, warm_start_tree[0],
                                  warm_start_exclude)
        stats, m = merge_pytrees(state.batch_stats, warm_start_tree[1],
                                 warm_start_exclude)
        print(f"Warm-started {n} param + {m} batch-stat tensors from "
              "imported checkpoint")
        state = trainer.shard_state(
            state.replace(params=params, batch_stats=stats,
                          ema_params=_ema_from(params)))
    return state, 0


def run_train_loop(trainer: Trainer, state: TrainState,
                   get_batch: Callable[[], tuple],
                   mgr: CheckpointManager, writer: MetricsWriter,
                   start_iter: int, num_iters: int,
                   log_every: int = 10, save_every: int = 1000,
                   num_workers: int = 4,
                   eval_fn: Optional[Callable[[TrainState, int], None]] = None,
                   eval_every: int = 0,
                   trace_dir: Optional[str] = None,
                   save_step_divisor: int = 1,
                   save_interval_secs: float = 0) -> TrainState:
    """The hot loop: prefetched host batches → double-buffered device_put →
    donated jitted step. Metrics are fetched with a 1-step lag so logging
    never forces an early device sync."""
    import time as _time

    timer = Timer()
    pending: list[tuple[int, Any]] = []
    last_save = _time.monotonic()
    last_saved_iter = start_iter
    saved_steps: set[int] = set()

    def flush(upto: int) -> None:
        while pending and (len(pending) > upto):
            it, metrics = pending.pop(0)
            vals, hists = {}, {}
            for k, v in metrics.items():
                # route on ndim (no device fetch); array-valued metrics
                # are only materialized on the log cadence below
                (hists if getattr(v, "ndim", 0) else vals)[k] = v
            # ONE stacked fetch for all scalars: under the axon tunnel
            # every blocking np.asarray costs a ~25 ms round trip, so
            # per-scalar fetches made the fetch — not the device step —
            # the training wall (~8 RTT/iter at the YOLO losses' metric
            # count); the stack is one async dispatch + one fetch
            if vals:
                import jax.numpy as _jnp

                packed = np.asarray(_jnp.stack(list(vals.values())))
                vals = dict(zip(vals.keys(), (float(x) for x in packed)))
            writer.scalars(it, vals)
            if it % log_every == 0:
                # distribution metrics (reference loss histograms,
                # net_utils.py:361-370) on the log cadence only
                for k, arr in hists.items():
                    writer.histogram(it, k, np.asarray(arr))
                msg = ", ".join(f"{k}: {v:.4f}" for k, v in vals.items())
                print(f"iter {it}: {msg}, "
                      f"avg step {timer.average_time * 1000:.1f} ms")

    from tensorflow_yolo2_tpu.utils.profiling import maybe_trace

    # the data.* imdbs lock only their cursor bookkeeping → workers
    # decode in parallel
    with PrefetchLoader(get_batch, num_workers=num_workers,
                        thread_safe=True) as loader, \
            maybe_trace(trace_dir):
        stream = device_prefetch(iter(loader), size=2,
                                 sharding=trainer.batch_sharding)
        for i in range(start_iter + 1, start_iter + num_iters + 1):
            images, labels = next(stream)
            timer.tic()
            state, metrics = trainer.train_step(state, images, labels)
            timer.toc()
            pending.append((i, metrics))
            flush(1)
            if eval_fn is not None and eval_every and i % eval_every == 0:
                eval_fn(state, i)
            due_every = save_every and i % save_every == 0
            # slim's time-based checkpointing (save_interval_secs,
            # train_image_classifier.py:569-580)
            due_timed = (save_interval_secs and
                         _time.monotonic() - last_save >= save_interval_secs)
            if due_every or due_timed:
                # epoch-interval managers store the epoch number in the
                # snapshot name (reference train_epoch_N convention), so
                # the saved step is iters // iters-per-epoch
                mgr.save(i // save_step_divisor, jax.device_get(state))
                saved_steps.add(i // save_step_divisor)
                last_save = _time.monotonic()
                last_saved_iter = i
                print(f"Saved snapshot at iter {i} "
                      f"({mgr.interval} {i // save_step_divisor})")
        flush(0)
    final = start_iter + num_iters
    if num_iters > 0 and last_saved_iter != final:
        # exit off the save cadence: snapshot the tail so no training is
        # silently discarded (slim's supervisor saves on exit too). With an
        # epoch-interval manager a mid-epoch tail floor-divides onto the
        # label of an epoch-boundary snapshot already saved this run —
        # skip rather than silently replace the clean boundary state.
        tail_step = final // save_step_divisor
        if tail_step in saved_steps:
            print(f"Skipping tail save at iter {final}: {mgr.interval} "
                  f"{tail_step} already holds the epoch-boundary snapshot")
        else:
            mgr.save(tail_step, jax.device_get(state))
            print(f"Saved final snapshot at iter {final} "
                  f"({mgr.interval} {tail_step})")
    return state


def paths_from_args(args: argparse.Namespace) -> Paths:
    return Paths()
