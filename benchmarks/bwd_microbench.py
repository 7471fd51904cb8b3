"""Backward-pass micro-bench: attribute the 448² bwd wall per op class.

Times fwd+bwd of (a) each maxpool at its real layer size — XLA lowers
max-pool grad to SelectAndScatter, historically slow on TPU — against a
reshape-based 2×2/2 pool whose grad is pure elementwise/reshape ops, and
(b) a representative big conv. Usage:

    python benchmarks/bwd_microbench.py [batch]
    python benchmarks/bwd_microbench.py [batch] --per-layer

``--per-layer`` sweeps EVERY Darknet19 conv shape at 448² (isolated fwd
and fwd+bwd TF/s each) so the aggregate conv-bwd MFU resolves into
named layers (VERDICT r3 item 5): which layers run at the 94%-of-peak
the head convs show, and which drag the average.
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


# every Darknet19-448 detection conv: (name, H, k, cin, cout)
LAYERS_448 = [
    ("bk.conv1", 448, 3, 3, 32), ("bk.conv2", 224, 3, 32, 64),
    ("bk.conv3", 112, 3, 64, 128), ("bk.conv4", 112, 3, 128, 64),
    ("bk.conv5", 112, 3, 64, 128), ("bk.conv6", 56, 3, 128, 256),
    ("bk.conv7", 56, 1, 256, 128), ("bk.conv8", 56, 3, 128, 256),
    ("bk.conv9", 28, 3, 256, 512), ("bk.conv10", 28, 1, 512, 256),
    ("bk.conv11", 28, 3, 256, 512), ("bk.conv12", 28, 1, 512, 256),
    ("bk.conv13", 28, 3, 256, 512), ("bk.conv14", 14, 3, 512, 1024),
    ("bk.conv15", 14, 1, 1024, 512), ("bk.conv16", 14, 3, 512, 1024),
    ("bk.conv17", 14, 1, 1024, 512), ("bk.conv18", 14, 3, 512, 1024),
    ("hd.conv1", 14, 3, 1024, 1024), ("hd.conv2", 14, 3, 1024, 1024),
    ("hd.conv3", 14, 3, 1024, 1024), ("hd.output", 14, 1, 1024, 30),
]

V5E_PEAK_TFS = 197.0


def per_layer(batch: int) -> None:
    """Isolated fwd / fwd+bwd sweep over every real layer shape."""
    rng = np.random.RandomState(0)
    print(f"per-layer conv sweep, batch {batch}, bf16 "
          f"(TF/s vs {V5E_PEAK_TFS:.0f} peak; bwd = grads wrt x AND w, "
          "3x fwd FLOPs)")
    print("| layer | shape | fwd ms | fwd TF/s (MFU) | fwd+bwd ms | "
          "eff TF/s (MFU) |")
    print("|---|---|---|---|---|---|")
    tot_f = tot_g = tot_flops = 0.0
    for name, h, k, cin, cout in LAYERS_448:
        x = jnp.asarray(rng.normal(0, 1, (batch, h, h, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (k, k, cin, cout)),
                        jnp.bfloat16)

        def f(x, w, k=k):
            pad = (k - 1) // 2
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32))

        t_f = _time(jax.jit(f), x, w)
        t_g = _time(jax.jit(jax.grad(f, argnums=(0, 1))), x, w)
        flops = 2.0 * batch * h * h * k * k * cin * cout
        tf_f = flops / t_f / 1e9
        tf_g = 3 * flops / t_g / 1e9
        tot_f += t_f
        tot_g += t_g
        tot_flops += flops
        print(f"| {name} | {h}²×{cin}→{cout} k{k} | {t_f:7.2f} | "
              f"{tf_f:5.0f} ({tf_f / V5E_PEAK_TFS:4.0%}) | {t_g:7.2f} | "
              f"{tf_g:5.0f} ({tf_g / V5E_PEAK_TFS:4.0%}) |")
    print(f"| TOTAL | | {tot_f:.1f} | "
          f"{tot_flops / tot_f / 1e9:.0f} "
          f"({tot_flops / tot_f / 1e9 / V5E_PEAK_TFS:.0%}) | "
          f"{tot_g:.1f} | {3 * tot_flops / tot_g / 1e9:.0f} "
          f"({3 * tot_flops / tot_g / 1e9 / V5E_PEAK_TFS:.0%}) |")


def main() -> None:
    enable_compilation_cache()
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    batch = int(args[0]) if args else 128
    if "--per-layer" in sys.argv:
        per_layer(batch)
        return
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
