"""Backward-pass micro-bench: attribute the 448² bwd wall per op class.

Times fwd+bwd of (a) each maxpool at its real layer size — XLA lowers
max-pool grad to SelectAndScatter, historically slow on TPU — against a
reshape-based 2×2/2 pool whose grad is pure elementwise/reshape ops, and
(b) a representative big conv. Usage:

    python benchmarks/bwd_microbench.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache

# (H, C) after which a 2×2/2 pool runs in darknet19 at 448² input
POOLS = [(448, 32), (224, 64), (112, 128), (56, 256), (28, 512)]


def _probe(out):
    """Force execution with a TINY host fetch — grads here are GBs and a
    full np.asarray would time the tunnel, not the chip."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:8])


def _time(fn, *args, steps=10):
    out = fn(*args)
    _probe(out)
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):  # keep only the newest result alive (big grads)
        out = fn(*args)
    _probe(out)
    return (time.perf_counter() - t0) / steps * 1e3


def reshape_pool(x):
    """2×2/2 max pool via reshape+max — grad is an equality mask, no
    SelectAndScatter. Exact for even H, W (all darknet pool sites)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))


def main() -> None:
    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.RandomState(0)

    import flax.linen as nn

    total_sas = total_reshape = 0.0
    for h, c in POOLS:
        x = jnp.asarray(rng.normal(0, 1, (batch, h, h, c)), jnp.bfloat16)

        def f_sas(x):
            return jnp.sum(nn.max_pool(x, (2, 2), (2, 2), "SAME")
                           .astype(jnp.float32))

        def f_rs(x):
            return jnp.sum(reshape_pool(x).astype(jnp.float32))

        g_sas = jax.jit(jax.grad(f_sas))
        g_rs = jax.jit(jax.grad(f_rs))
        t_sas = _time(g_sas, x)
        t_rs = _time(g_rs, x)
        total_sas += t_sas
        total_reshape += t_rs
        print(f"pool {h:3d}²×{c:4d}: select-scatter grad {t_sas:7.2f} ms"
              f"   reshape-max grad {t_rs:7.2f} ms")
    print(f"TOTAL pools: select-scatter {total_sas:.2f} ms vs "
          f"reshape {total_reshape:.2f} ms (per train step, bwd side)")

    # representative convs: head 3×3×1024×1024 @14², mid 3×3×512×512 @28²
    for h, cin, cout in ((14, 1024, 1024), (28, 512, 512), (112, 128, 128)):
        x = jnp.asarray(rng.normal(0, 1, (batch, h, h, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), jnp.bfloat16)

        def f(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32))

        t_f = _time(jax.jit(f), x, w)
        t_g = _time(jax.jit(jax.grad(f, argnums=(0, 1))), x, w)
        flops = 2 * batch * h * h * 9 * cin * cout
        print(f"conv {h:3d}²×{cin}→{cout}: fwd {t_f:7.2f} ms "
              f"({flops / t_f / 1e9:5.0f} TF/s)  "
              f"fwd+bwd {t_g:7.2f} ms "
              f"({3 * flops / t_g / 1e9:5.0f} TF/s eff)")


if __name__ == "__main__":
    main()
