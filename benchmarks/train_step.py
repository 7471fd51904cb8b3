"""Training-step throughput: Darknet19 YOLO train step (fwd+bwd+Adam),
the pascal_train_darknet hot loop. Usage:

    python benchmarks/train_step.py [batch] [--size N] [--remat]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import numpy as np

from tensorflow_yolo2_tpu.config import (
    LRScheduleConfig,
    OptimizerConfig,
    YoloConfig,
)
from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector
from tensorflow_yolo2_tpu.train.trainer import Trainer, yolo_task
from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache

import jax.numpy as jnp


def main() -> None:
    enable_compilation_cache()
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("batch", nargs="?", type=int, default=48)
    ap.add_argument("--size", type=int, default=224,
                    help="input resolution (multiple of 32, >= 128)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--downsample", default="pool",
                    choices=["pool", "stride"],
                    help="'stride' = pool-free stride-2-conv variant "
                         "(no SelectAndScatter pool gradients; non-parity "
                         "train-perf lever)")
    ap.add_argument("--json-out", default=None, metavar="PATH",
                    help="also write the one-line JSON record "
                         "({img_s, mfu, batch, size, variant}) to PATH — "
                         "the machine-readable train-perf artifact "
                         "(the serving twin is bench.py's BENCH_r*.json)")
    args = ap.parse_args()
    batch, size, remat = args.batch, args.size, args.remat
    if size % 32 or size < 128:
        ap.error("--size must be a multiple of 32 and >= 128")
    steps = 12
    yolo = YoloConfig(S=size // 32, image_size=size)
    model = Darknet19Detector(output_channels=yolo.cell_channels,
                              dtype=jnp.bfloat16,
                              downsample=args.downsample)
    trainer = Trainer(
        model, yolo_task(yolo),
        OptimizerConfig(name="adam",
                        schedule=LRScheduleConfig(learning_rate=1e-3)),
        remat=remat)

    rng = np.random.RandomState(0)
    images = rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
    labels = np.zeros((batch, yolo.S, yolo.S, 25), np.float32)
    # responsible cell derived from the center so the label grid
    # invariant (cell = center * S / size) holds at every resolution
    ci = (yolo.S // 2 * 32 + 16) * yolo.S // size
    labels[:, ci, ci, 0] = 1
    labels[:, ci, ci, 1:5] = (yolo.S // 2 * 32 + 16,) * 2 + \
        (size / 4, size / 6)
    labels[:, ci, ci, 5 + 11] = 1

    state = trainer.create_state(jax.random.PRNGKey(0), images[:1])
    di, dl = trainer.put_batch(images, labels)

    state, m = trainer.train_step(state, di, dl)  # compile
    float(np.asarray(m["loss"]))                  # force
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = trainer.train_step(state, di, dl)
    float(np.asarray(m["loss"]))                  # force the chain
    dt = (time.perf_counter() - t0) / steps
    ips = batch / dt
    # Train-step MFU: fwd conv FLOPs × 3 (the dx pass contracts over
    # output channels and the dw pass over batch×space — each ≈ one
    # forward; the standard fwd+bwd accounting) ÷ chip peak. Same
    # analytic model bench.py reports for serving (profiling.py:51-67).
    from tensorflow_yolo2_tpu.utils.profiling import (
        V5E_PEAK_FLOPS,
        conv_flops_per_image,
    )

    flops = 3.0 * conv_flops_per_image(size)
    mfu = ips * flops / V5E_PEAK_FLOPS["bf16"]
    print(f"train step {size}² batch {batch} remat={remat} "
          f"downsample={args.downsample}: "
          f"{dt * 1e3:.2f} ms/step, {ips:.0f} img/s, mfu {mfu:.4f}")
    import json

    record = {"metric": "train_images_per_sec_per_chip",
              "value": round(ips, 1), "unit": "img/s/chip",
              "batch": batch, "size": size,
              "variant": args.downsample, "remat": remat,
              "ms_per_step": round(dt * 1e3, 2), "mfu": round(mfu, 4)}
    print(json.dumps(record))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(record, f)
            f.write("\n")


if __name__ == "__main__":
    main()
