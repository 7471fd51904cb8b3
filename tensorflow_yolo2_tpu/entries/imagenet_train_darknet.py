"""Darknet19 ImageNet classification pretraining at scale (driver
config #5 — the data-parallel path).

Capability of reference src/imagenet/imagenet_train_darknet.py:
darknet19 classifier + sparse softmax CE + Momentum(0.001, 0.9), accuracy
metric, resume-by-epoch, validation stream every 25 iterations with
separate train/val writers, snapshot every 2 epochs. TPU-native:

- the reference's 10-process queue prefetcher (ilsvrc..._multithread.py
  :119-318) is the PrefetchLoader thread pool + device double buffer;
- its dedicated validation child process (:23-39) is a second
  PrefetchLoader over the val imdb;
- scale-out is the data axis of the mesh: per-host batches are sharded
  over devices and XLA all-reduces the grads over ICI (no PS, no
  SyncReplicasOptimizer — SURVEY §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import LRScheduleConfig, OptimizerConfig, Paths
from tensorflow_yolo2_tpu.data.ilsvrc import IlsvrcCls
from tensorflow_yolo2_tpu.data.prefetch import PrefetchLoader
from tensorflow_yolo2_tpu.entries import common
from tensorflow_yolo2_tpu.models.darknet import Darknet19Classifier
from tensorflow_yolo2_tpu.parallel.mesh import make_mesh_for_batch
from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager
from tensorflow_yolo2_tpu.train.metrics import MetricsWriter
from tensorflow_yolo2_tpu.train.trainer import Trainer, softmax_task


def _train_imdb_factory(batch_size, data_path, seed, uint8):
    """Module-level (picklable) imdb builder for the process-worker pool
    — each child process owns a private IlsvrcCls."""
    return IlsvrcCls("train", batch_size=batch_size, data_aug=True,
                     data_path=data_path, seed=seed, uint8=uint8)


def main(argv: list[str] | None = None) -> int:
    p = common.base_parser(__doc__)
    p.add_argument("--uint8-transfer", action="store_true",
                   help="ship raw uint8 batches to the device and "
                        "normalize on-chip (4x fewer host↔device bytes; "
                        "same pixel values — the training twin of the "
                        "uint8 serving path)")
    p.add_argument("--process-workers", type=int, default=0,
                   help="decode/augment in N worker PROCESSES with "
                        "exactly-once-per-epoch modulo sharding "
                        "(EpochShardedStream — the reference's 10-process "
                        "pool with its coordinated epoch rollover, "
                        "ilsvrc2017_cls_multithread.py:119-154,269-284). "
                        "0 = thread prefetch (--num-workers); processes "
                        "pay off when per-batch python work holds the "
                        "GIL and real cores exist")
    args = p.parse_args(argv)

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    batch_size = args.batch_size or 48      # reference config.py:32
    epochs = args.epochs or 10              # reference :106
    lr = args.learning_rate or 1e-3         # reference :58
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    train_imdb = IlsvrcCls("train", batch_size=batch_size, data_aug=True,
                           data_path=args.data_path, seed=args.seed,
                           uint8=args.uint8_transfer)
    val_imdb = IlsvrcCls("val", batch_size=batch_size,
                         data_path=args.data_path, seed=args.seed,
                         uint8=args.uint8_transfer)
    paths = Paths()
    model = Darknet19Classifier(num_classes=train_imdb.num_class, dtype=dtype)
    trainer = Trainer(
        model, softmax_task(),
        OptimizerConfig(name="momentum", momentum=0.9,
                        schedule=LRScheduleConfig(learning_rate=lr)),
        mesh=make_mesh_for_batch(batch_size))
    mgr = CheckpointManager("darknet19", train_imdb.name, save_by_epoch=True,
                            paths=paths)
    tb_train, tb_val = paths.tb_dirs("darknet19", train_imdb.name)
    writer = MetricsWriter(tb_train)
    val_writer = MetricsWriter(tb_val)

    sample, _ = val_imdb.get()
    state, last_epoch = common.bootstrap_state(
        trainer, mgr, jax.random.PRNGKey(args.seed), sample[:1])
    train_imdb.epoch = last_epoch + 1

    total_batch = train_imdb.total_batch
    save_every_epochs = 2                   # reference :131
    val_stream = PrefetchLoader(val_imdb.get, num_workers=1,
                                prefetch_size=2)

    def eval_fn(state, step):
        xi, yi = trainer.put_batch(*next(val_stream))
        m = trainer.eval_step(state, xi, yi)
        val_writer.scalars(step, {k: float(np.asarray(v))
                                  for k, v in m.items()})

    iters = (args.iters if args.iters
             else total_batch * (epochs - last_epoch))
    save_every = args.save_every or total_batch * save_every_epochs

    get_batch = train_imdb.get
    num_workers = args.num_workers
    proc_loader = None
    if args.process_workers:
        import functools

        from tensorflow_yolo2_tpu.data.prefetch import (
            EpochShardedStream,
            ProcessPrefetchLoader,
        )

        stream_factory = EpochShardedStream(
            functools.partial(_train_imdb_factory, batch_size,
                              args.data_path, args.seed,
                              args.uint8_transfer),
            batch_size=batch_size, seed=args.seed, drop_remainder=True)
        proc_loader = ProcessPrefetchLoader(
            stream_factory, num_workers=args.process_workers,
            prefetch_size=2 * args.process_workers)
        get_batch = lambda: next(proc_loader)  # noqa: E731
        num_workers = 1  # one thread drains the process queue

    try:
        state = common.run_train_loop(
            trainer, state, get_batch, mgr, writer,
            start_iter=last_epoch * total_batch, num_iters=iters,
            log_every=args.log_every, save_every=save_every,
            num_workers=num_workers, eval_fn=eval_fn,
            eval_every=args.eval_every, save_step_divisor=total_batch,
            trace_dir=args.profile_dir)
    finally:
        if proc_loader is not None:
            proc_loader.close()
    val_stream.close()
    writer.close()
    val_writer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
