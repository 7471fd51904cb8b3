"""TPU A/B of the Pallas fused stem (VERDICT r3 item 4 measurement).

Three measurements at detect-448 serving shapes, all on the real chip:
  1. compiled-kernel correctness probe (fused vs XLA stem, f32),
  2. stem-only throughput: fused_stem vs the XLA composition,
  3. full detect forward: standard folded path vs pallas-stem path.

Timing protocol matches bench.py: dispatch a chain, force completion
with a host fetch (block_until_ready can return early under axon).

Usage: python benchmarks/pallas_stem_bench.py [batch ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import YoloConfig
from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector
from tensorflow_yolo2_tpu.models.fold import fold_params
from tensorflow_yolo2_tpu.ops.pallas_stem import (
    fused_stem,
    pallas_detect_forward,
    stem_reference,
)
from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache

enable_compilation_cache()

BATCHES = [int(a) for a in sys.argv[1:]] or [32, 256]
SIZE = 448
STEPS = 15

yolo = YoloConfig(S=SIZE // 32)
model = Darknet19Detector(output_channels=yolo.cell_channels,
                          dtype=jnp.bfloat16)
v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
               train=False)
folded = fold_params(v["params"], v["batch_stats"])
fmodel = Darknet19Detector(output_channels=yolo.cell_channels,
                           fold_bn=True, dtype=jnp.bfloat16)
c1 = folded["backbone"]["conv1"]["conv"]
c2 = folded["backbone"]["conv2"]["conv"]

# --- 1. compiled correctness probe (small batch, f32, small strips:
# f32 intermediates at the default 14-row strip exceed the 16M scoped
# VMEM stack limit; bf16 serving uses the default) ---
xp = jnp.asarray(np.random.RandomState(7).uniform(-1, 1, (2, SIZE, SIZE, 3)),
                 jnp.float32)
got = np.asarray(fused_stem(xp, c1["kernel"], c1["bias"],
                            c2["kernel"], c2["bias"], dtype=jnp.float32,
                            strip_rows=4))
want = np.asarray(stem_reference(xp, c1["kernel"], c1["bias"],
                                 c2["kernel"], c2["bias"],
                                 dtype=jnp.float32))
err = float(np.max(np.abs(got - want)))
print(f"correctness (compiled, f32, 448²): max|Δ| = {err:.3e}", flush=True)
assert err < 1e-3, err


def timeit(fn, *args, steps=STEPS):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])  # warm + fetch
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(steps)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0][:1, :1])
    return (time.perf_counter() - t0) / steps


stem_xla = jax.jit(lambda x: stem_reference(x, c1["kernel"], c1["bias"],
                                            c2["kernel"], c2["bias"]))


def stem_pls_at(sr):
    return jax.jit(lambda x: fused_stem(x, c1["kernel"], c1["bias"],
                                        c2["kernel"], c2["bias"],
                                        strip_rows=sr))


fwd_std = jax.jit(lambda p, x: fmodel.apply({"params": p}, x, train=False))


def fwd_pls_at(sr):
    return jax.jit(lambda p, x: pallas_detect_forward(p, x,
                                                      strip_rows=sr))


for batch in BATCHES:
    x = jax.device_put(jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (batch, SIZE, SIZE, 3)), jnp.float32))
    jobs = [("stem xla    ", stem_xla, (x,))]
    jobs += [(f"stem pls r{sr:<2d}", stem_pls_at(sr), (x,))
             for sr in (14, 8, 4)]
    jobs += [("fwd  std    ", fwd_std, (folded, x))]
    jobs += [(f"fwd  pls r{sr:<2d}", fwd_pls_at(sr), (folded, x))
             for sr in (14, 8)]
    for name, fn, args in jobs:
        try:
            dt = timeit(fn, *args)
        except Exception as e:
            print(f"B={batch:4d} {name} FAILED: {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)
            continue
        print(f"B={batch:4d} {name} {dt * 1e3:8.2f} ms "
              f"{batch / dt:8.0f} img/s", flush=True)
