"""ResNet50 ImageNet fine-tune — frozen trunk, trainable logits head.

Capability of reference src/imagenet/imagenet_train_resnet.py: slim
resnet_v1_50 with num_classes=1000, training **only** the logits scope
(:54-59) from the downloaded resnet_v1_50.ckpt, same harness as the
darknet ImageNet trainer. The frozen-scope training uses the optax mask
(train.optimizers.trainable_mask) instead of slim's var_list filtering.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import LRScheduleConfig, OptimizerConfig, Paths
from tensorflow_yolo2_tpu.data.ilsvrc import IlsvrcCls
from tensorflow_yolo2_tpu.data.prefetch import PrefetchLoader
from tensorflow_yolo2_tpu.entries import common
from tensorflow_yolo2_tpu.models.resnet import ResNet50V1
from tensorflow_yolo2_tpu.parallel.mesh import make_mesh_for_batch
from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager, merge_pytrees
from tensorflow_yolo2_tpu.train.metrics import MetricsWriter
from tensorflow_yolo2_tpu.train.trainer import Trainer, softmax_task


def main(argv: list[str] | None = None) -> int:
    p = common.base_parser(__doc__)
    p.add_argument("--train-all", action="store_true",
                   help="train the whole net, not just the logits scope")
    args = p.parse_args(argv)

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    batch_size = args.batch_size or 32
    epochs = args.epochs or 10
    lr = args.learning_rate or 1e-3
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    train_imdb = IlsvrcCls("train", batch_size=batch_size, data_aug=True,
                           data_path=args.data_path, seed=args.seed)
    val_imdb = IlsvrcCls("val", batch_size=batch_size,
                         data_path=args.data_path)
    paths = Paths()
    model = ResNet50V1(num_classes=train_imdb.num_class, global_pool=True,
                       dtype=dtype)
    trainer = Trainer(
        model, softmax_task(),
        OptimizerConfig(name="momentum", momentum=0.9,
                        trainable_scopes=() if args.train_all
                        else ("logits",),
                        schedule=LRScheduleConfig(learning_rate=lr)),
        mesh=make_mesh_for_batch(batch_size))
    mgr = CheckpointManager("resnet50", train_imdb.name, save_by_epoch=True,
                            paths=paths)
    tb_train, tb_val = paths.tb_dirs("resnet50", train_imdb.name)
    writer = MetricsWriter(tb_train)
    val_writer = MetricsWriter(tb_val)

    sample, _ = val_imdb.get()
    params_override = batch_stats_override = None
    tf_ckpt = args.tf_checkpoint or os.path.join(paths.weights,
                                                 "resnet_v1_50.ckpt")
    if os.path.exists(tf_ckpt + ".index") or os.path.exists(tf_ckpt):
        from tensorflow_yolo2_tpu.compat.tf_import import (
            import_resnet50_checkpoint,
        )
        bk_params, bk_stats = import_resnet50_checkpoint(tf_ckpt)
        variables = model.init(jax.random.PRNGKey(args.seed), sample[:1],
                               train=False)
        params_override, n = merge_pytrees(variables["params"], bk_params)
        batch_stats_override, _ = merge_pytrees(
            variables.get("batch_stats", {}), bk_stats)
        print(f"Imported {n} tensors from {tf_ckpt}")

    state, last_epoch = common.bootstrap_state(
        trainer, mgr, jax.random.PRNGKey(args.seed), sample[:1],
        params_override=params_override,
        batch_stats_override=batch_stats_override)

    total_batch = train_imdb.total_batch
    val_stream = PrefetchLoader(val_imdb.get, num_workers=1, prefetch_size=2)

    def eval_fn(state, step):
        xi, yi = trainer.put_batch(*next(val_stream))
        m = trainer.eval_step(state, xi, yi)
        val_writer.scalars(step, {k: float(np.asarray(v))
                                  for k, v in m.items()})

    iters = args.iters or total_batch * (epochs - last_epoch)
    state = common.run_train_loop(
        trainer, state, train_imdb.get, mgr, writer,
        start_iter=last_epoch * total_batch, num_iters=iters,
        log_every=args.log_every,
        save_every=args.save_every or total_batch * 2,
        num_workers=args.num_workers, eval_fn=eval_fn,
        eval_every=args.eval_every, save_step_divisor=total_batch,
        trace_dir=args.profile_dir)
    val_stream.close()
    writer.close()
    val_writer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
