"""Where does the detect-448 step spend its time?

Times progressively larger prefixes of the serving graph on the real
chip (stem / trunk / trunk+head / +decode) so optimization effort goes
where the wall-clock is. Run from the repo root:

    python benchmarks/profile_breakdown.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import YoloConfig
from tensorflow_yolo2_tpu.models.darknet import (
    _DARKNET19_SCHEDULE,
    Darknet19Detector,
)
from tensorflow_yolo2_tpu.models.fold import fold_params
from tensorflow_yolo2_tpu.models.layers import leaky_relu, max_pool
from tensorflow_yolo2_tpu.ops.boxes import decode_grid

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SIZE = 448
STEPS = 12


def timeit(fn, *args) -> float:
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm + force
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(STEPS)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / STEPS


def prefix_forward(folded, x, n_convs: int, dtype=jnp.bfloat16):
    """First n_convs conv(+pool) layers of the folded trunk."""
    x = x.astype(dtype)
    conv_i = 0
    for item in _DARKNET19_SCHEDULE:
        if item == "M":
            x = max_pool(x, 2, 2)
            continue
        conv_i += 1
        if conv_i > n_convs:
            break
        p = folded["backbone"][f"conv{conv_i}"]["conv"]
        x = jax.lax.conv_general_dilated(
            x, p["kernel"].astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"].astype(dtype)
        x = leaky_relu(x)
    return x


def main() -> None:
    yolo = YoloConfig(S=SIZE // 32)
    model = Darknet19Detector(output_channels=yolo.cell_channels,
                              dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    folded = fold_params(variables["params"], variables["batch_stats"])
    fmodel = Darknet19Detector(output_channels=yolo.cell_channels,
                               fold_bn=True, dtype=jnp.bfloat16)
    x = jax.device_put(jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (BATCH, SIZE, SIZE, 3)),
        jnp.float32))

    # reduce every output to a scalar inside the jit: the host fetch that
    # forces completion must not time a multi-MB tunnel transfer
    stem = jax.jit(lambda p, v: jnp.sum(prefix_forward(p, v, 2)))
    half = jax.jit(lambda p, v: jnp.sum(prefix_forward(p, v, 8)))
    trunk = jax.jit(lambda p, v: jnp.sum(prefix_forward(p, v, 18)))
    full = jax.jit(lambda p, v: jnp.sum(
        fmodel.apply({"params": p}, v, train=False)))
    full_decode = jax.jit(lambda p, v: jnp.sum(jax.vmap(
        lambda g: decode_grid(g, yolo, 0.5))(
            fmodel.apply({"params": p}, v, train=False)).scores))

    rows = [("stem (conv1-2 + pools)", stem),
            ("conv1-8", half),
            ("trunk (18 convs)", trunk),
            ("trunk + head", full),
            ("trunk + head + decode", full_decode)]
    prev = 0.0
    for name, fn in rows:
        dt = timeit(fn, folded, x)
        print(f"{name:28s} {dt * 1e3:8.2f} ms/step  "
              f"(+{(dt - prev) * 1e3:7.2f} ms)  {BATCH / dt:8.0f} img/s")
        prev = dt


if __name__ == "__main__":
    main()
