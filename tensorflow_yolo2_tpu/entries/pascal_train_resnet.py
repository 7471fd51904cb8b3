"""ResNet50 + YOLO head detection training on VOC2007 (driver config #4 —
the backbone-swap / transfer-learning path).

Capability of reference src/pascal/pascal_train_resnet.py: slim
resnet_v1_50 trunk (global_pool=False) + yolo_fc1(4096)+dropout+yolo_fc2
head, same YOLO loss, Adam(5e-4), batch 4, 200k iters, warm-start from the
downloaded resnet_v1_50.ckpt with the yolo heads excluded
(net_utils.py:137-199). (The reference file itself has a syntax error at
:94 and cannot run; this entry is the working equivalent.)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from tensorflow_yolo2_tpu.config import (
    LRScheduleConfig,
    OptimizerConfig,
    Paths,
    YoloConfig,
)
from tensorflow_yolo2_tpu.data.voc import PascalVOC
from tensorflow_yolo2_tpu.entries import common
from tensorflow_yolo2_tpu.models.resnet import ResNet50Detector
from tensorflow_yolo2_tpu.parallel.mesh import make_mesh_for_batch
from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager, merge_pytrees
from tensorflow_yolo2_tpu.train.metrics import MetricsWriter
from tensorflow_yolo2_tpu.train.trainer import Trainer, yolo_task


def main(argv: list[str] | None = None) -> int:
    p = common.base_parser(__doc__)
    p.add_argument("--image-set", default="trainval")
    args = p.parse_args(argv)

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    batch_size = args.batch_size or 4       # reference :27
    iters = args.iters or 200_000           # reference :82
    lr = args.learning_rate or 5e-4         # reference :59
    save_every = args.save_every or 40_000
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    yolo = YoloConfig()
    imdb = PascalVOC(args.image_set, batch_size=batch_size, yolo=yolo,
                     data_path=args.data_path)
    paths = Paths()
    model = ResNet50Detector(output_channels=yolo.cell_channels, S=yolo.S,
                             dtype=dtype)
    trainer = Trainer(
        model, yolo_task(yolo, histograms=True),
        OptimizerConfig(name="adam",
                        schedule=LRScheduleConfig(learning_rate=lr)),
        mesh=make_mesh_for_batch(batch_size))
    mgr = CheckpointManager("resnet50", imdb.name, save_by_epoch=False,
                            paths=paths)
    writer = MetricsWriter(paths.tb_dirs("resnet50", imdb.name, val=False)[0])

    # Warm-start the trunk from the downloaded slim checkpoint, excluding
    # the new yolo heads (net_utils.py:177-199).
    params_override = batch_stats_override = None
    tf_ckpt = args.tf_checkpoint or os.path.join(paths.weights,
                                                 "resnet_v1_50.ckpt")
    sample, _ = imdb.get()
    if os.path.exists(tf_ckpt + ".index") or os.path.exists(tf_ckpt):
        from tensorflow_yolo2_tpu.compat.tf_import import (
            import_resnet50_checkpoint,
        )
        bk_params, bk_stats = import_resnet50_checkpoint(tf_ckpt)
        variables = model.init(jax.random.PRNGKey(args.seed), sample[:1],
                               train=False)
        params_override, n = merge_pytrees(
            variables["params"], {"backbone": bk_params},
            exclude_scopes=("yolo_fc1", "yolo_fc2"))
        batch_stats_override, _ = merge_pytrees(
            variables.get("batch_stats", {}), {"backbone": bk_stats})
        print(f"Imported {n} trunk tensors from {tf_ckpt}")

    state, start = common.bootstrap_state(
        trainer, mgr, jax.random.PRNGKey(args.seed), sample[:1],
        params_override=params_override,
        batch_stats_override=batch_stats_override)

    state = common.run_train_loop(
        trainer, state, imdb.get, mgr, writer,
        start_iter=start, num_iters=iters, log_every=args.log_every,
        save_every=save_every, num_workers=args.num_workers,
        trace_dir=args.profile_dir)
    writer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
