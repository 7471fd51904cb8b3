"""Standalone A/B of the Pallas pool-backward kernel vs SelectAndScatter.

Isolates the kernel cost per pool site (448²×32 … 28²×512, batch 128)
to attribute the train-step regression/gain precisely. Usage:

    python benchmarks/pool_kernel_bench.py [batch] [--rows R]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.ops import pallas_pool
from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache

POOLS = [(448, 32), (224, 64), (112, 128), (56, 256), (28, 512)]


def _probe(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:8])


def _time(fn, *args, steps=10):
    out = fn(*args)
    _probe(out)
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn(*args)
    _probe(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main() -> None:
    enable_compilation_cache()
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("batch", nargs="?", type=int, default=128)
    ap.add_argument("--rows", type=int, default=None,
                    help="override pallas_pool._ROWS")
    args = ap.parse_args()
    if args.rows:
        pallas_pool._ROWS = args.rows
    batch = args.batch
    rng = np.random.RandomState(0)

    total_p = total_s = 0.0
    for h, c in POOLS:
        x = jnp.asarray(rng.normal(0, 1, (batch, h, h, c)), jnp.bfloat16)
        y = nn.max_pool(x, (2, 2), (2, 2), "SAME")
        dout = jnp.asarray(rng.normal(0, 1, y.shape), jnp.bfloat16)

        pal = jax.jit(lambda x, y, d: pallas_pool._pool_bwd_pallas(
            x, y, d, interpret=False))
        t_p = _time(pal, x, y, dout)
        ideal = (x.nbytes * 2 + y.nbytes + dout.nbytes) / 819e9 * 1e3
        print(f"pool {h:3d}²×{c:4d}: pallas {t_p:7.2f} ms "
              f"(ideal ~{ideal:.2f} ms)", flush=True)

        def f_sas(x, dout):
            # dout must be an ARGUMENT: closure constants are baked into
            # the HLO literal and overflow the tunnel compile-size limit
            return jnp.sum(nn.max_pool(x, (2, 2), (2, 2), "SAME")
                           .astype(jnp.float32) * dout.astype(jnp.float32))

        t_s = _time(jax.jit(jax.grad(f_sas)), x, dout)
        total_p += t_p
        total_s += t_s
        print(f"              select-scatter {t_s:7.2f} ms", flush=True)
    print(f"TOTAL: pallas {total_p:.2f} ms vs select-scatter "
          f"{total_s:.2f} ms (rows={pallas_pool._ROWS})")


if __name__ == "__main__":
    main()
