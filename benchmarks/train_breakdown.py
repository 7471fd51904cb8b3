"""448² train-step wall analysis: where does the fwd+bwd time go?

Times four jitted programs on the same batch (VERDICT r1 item 2
methodology — profile_breakdown.py extended to the training path):

  fwd        — loss forward only (train-mode BN, batch statistics)
  fwd_eval   — loss forward with running-average BN (no stats compute)
  grad       — loss fwd + bwd (no optimizer update)
  step       — the full Trainer train step (fwd+bwd+Adam+EMA-less)

and prints per-program ms plus derived splits (bwd = grad - fwd,
optimizer = step - grad, BN-stats = fwd - fwd_eval). Usage:

    python benchmarks/train_breakdown.py [batch] [--size 448] [--remat]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import (
    LRScheduleConfig,
    OptimizerConfig,
    YoloConfig,
)
from tensorflow_yolo2_tpu.losses.yolo import yolo_loss
from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector
from tensorflow_yolo2_tpu.train.trainer import Trainer, yolo_task
from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache


def _time(fn, *args, steps=10):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force (axon gotcha)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(steps)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main() -> None:
    enable_compilation_cache()
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("batch", nargs="?", type=int, default=128)
    ap.add_argument("--size", type=int, default=448)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()
    batch, size = args.batch, args.size

    yolo = YoloConfig(S=size // 32, image_size=size)
    model = Darknet19Detector(output_channels=yolo.cell_channels,
                              dtype=jnp.bfloat16)
    trainer = Trainer(
        model, yolo_task(yolo),
        OptimizerConfig(name="adam",
                        schedule=LRScheduleConfig(learning_rate=1e-3)),
        remat=args.remat)

    rng = np.random.RandomState(0)
    images = rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
    labels = np.zeros((batch, yolo.S, yolo.S, 25), np.float32)
    ci = yolo.S // 2
    labels[:, ci, ci, 0] = 1
    labels[:, ci, ci, 1:5] = (size / 2, size / 2, size / 4, size / 6)
    labels[:, ci, ci, 5 + 11] = 1

    state = trainer.create_state(jax.random.PRNGKey(0), images[:1])
    di, dl = trainer.put_batch(images, labels)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def fwd(variables, images, labels):
        out, _ = model.apply(variables, images, train=True,
                             mutable=["batch_stats"])
        return yolo_loss(out, labels, yolo)[0]

    @jax.jit
    def fwd_eval(variables, images, labels):
        out = model.apply(variables, images, train=False)
        return yolo_loss(out, labels, yolo)[0]

    @jax.jit
    def grad(variables, images, labels):
        def loss_fn(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                images, train=True, mutable=["batch_stats"])
            return yolo_loss(out, labels, yolo)[0]
        return jax.grad(loss_fn)(variables["params"])

    t_fwd = _time(fwd, variables, di, dl)
    t_fwd_eval = _time(fwd_eval, variables, di, dl)
    t_grad = _time(grad, variables, di, dl)

    # full step last (it donates the state)
    def step(s):
        s, m = trainer.train_step(s, di, dl)
        return s, m
    state, m = step(state)
    float(np.asarray(m["loss"]))
    t0 = time.perf_counter()
    steps = 10
    for _ in range(steps):
        state, m = step(state)
    float(np.asarray(m["loss"]))
    t_step = (time.perf_counter() - t0) / steps * 1e3

    print(f"batch {batch} @ {size}² remat={args.remat}")
    print(f"  fwd (train BN)   {t_fwd:8.2f} ms   "
          f"({batch / t_fwd * 1e3:6.0f} img/s)")
    print(f"  fwd (eval BN)    {t_fwd_eval:8.2f} ms   "
          f"(BN-stats cost {t_fwd - t_fwd_eval:+.2f} ms)")
    print(f"  fwd+bwd          {t_grad:8.2f} ms   "
          f"(bwd = {t_grad - t_fwd:.2f} ms, "
          f"{(t_grad - t_fwd) / max(t_fwd, 1e-9):.2f}x fwd)")
    print(f"  full train step  {t_step:8.2f} ms   "
          f"({batch / t_step * 1e3:6.0f} img/s; "
          f"optimizer {t_step - t_grad:+.2f} ms)")


if __name__ == "__main__":
    main()
