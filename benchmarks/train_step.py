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
    print(f"train step {size}² batch {batch} remat={remat} "
          f"downsample={args.downsample}: "
          f"{dt * 1e3:.2f} ms/step, {batch / dt:.0f} img/s")


if __name__ == "__main__":
    main()
