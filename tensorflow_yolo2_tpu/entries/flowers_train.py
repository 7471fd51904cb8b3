"""Darknet19 fine-tune on TF_flowers (driver config #2 — the fast
end-to-end smoke).

Capability of reference src/flowers_train.py: darknet19 classifier on the
5-class flowers set, Adam(1e-4), per-iteration train + val metrics, 1000
iterations, final snapshot. TPU-native: pjit train step over the data
mesh, host prefetch overlapped with the device step, Orbax snapshots.
"""

from __future__ import annotations

import jax

from tensorflow_yolo2_tpu.config import LRScheduleConfig, OptimizerConfig
from tensorflow_yolo2_tpu.config import Paths
from tensorflow_yolo2_tpu.data.flowers import TFFlowers
from tensorflow_yolo2_tpu.entries import common
from tensorflow_yolo2_tpu.models.darknet import Darknet19Classifier
from tensorflow_yolo2_tpu.parallel.mesh import make_mesh_for_batch
from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager
from tensorflow_yolo2_tpu.train.metrics import MetricsWriter
from tensorflow_yolo2_tpu.train.trainer import Trainer, softmax_task

import jax.numpy as jnp
import numpy as np


def main(argv: list[str] | None = None) -> int:
    p = common.base_parser(__doc__)
    p.add_argument("--val-split", type=float, default=0.2)
    p.add_argument("--image-size", type=int, default=224)
    args = p.parse_args(argv)

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    batch_size = args.batch_size or 16
    iters = args.iters or 1000
    lr = args.learning_rate or 1e-4
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    imdb = TFFlowers(batch_size=batch_size, image_size=args.image_size,
                     val_split=args.val_split, data_path=args.data_path,
                     seed=args.seed)
    paths = Paths()
    model = Darknet19Classifier(num_classes=imdb.num_class, dtype=dtype)
    trainer = Trainer(
        model, softmax_task(),
        OptimizerConfig(name="adam",
                        schedule=LRScheduleConfig(learning_rate=lr)),
        mesh=make_mesh_for_batch(batch_size))
    mgr = CheckpointManager("darknet19", imdb.name, save_by_epoch=False,
                            paths=paths)
    tb_train, tb_val = paths.tb_dirs("darknet19", imdb.name)
    writer = MetricsWriter(tb_train)
    val_writer = MetricsWriter(tb_val)

    sample, _ = imdb.get_val()
    state, start = common.bootstrap_state(
        trainer, mgr, jax.random.PRNGKey(args.seed), sample[:1])

    def eval_fn(state, step):
        xi, yi = trainer.put_batch(*imdb.get_val())
        m = trainer.eval_step(state, xi, yi)
        val_writer.scalars(step, {k: float(np.asarray(v))
                                  for k, v in m.items()})

    state = common.run_train_loop(
        trainer, state, imdb.get_train, mgr, writer,
        start_iter=start, num_iters=iters, log_every=args.log_every,
        save_every=args.save_every or iters, num_workers=args.num_workers,
        eval_fn=eval_fn, eval_every=args.eval_every,
        trace_dir=args.profile_dir)
    writer.close()
    val_writer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
