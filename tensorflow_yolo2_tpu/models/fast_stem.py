"""Space-to-depth stem: a TPU fast-path *candidate* for the first
Darknet19 layers (measured negative — see below and ops/pallas_stem).

Profiling (benchmarks/profile_breakdown.py) showed the first two
conv+pool stages cost ~66% of the detect-448 step **at batch 32**; the
round-4 batch-256 re-profile (benchmarks/pallas_stem_bench.py) puts
them at 32.5% at the headline batch (22.4 of 69.0 ms) — 3- and
32-channel activations occupy 128-wide vector lanes at 2-25%
utilization, so the stem is layout-bound, not FLOP-bound, but XLA's
composition already runs at ~68% of its pure-bandwidth bound there.

The exact rewrite: for a stride-1 3×3 conv (+bias, leaky) followed by a
2×2/2 max pool,

    pool(leaky(conv3x3(x) + b)) == leaky(max_{4 phases} conv2x2(s2d(x)) + b)

where ``s2d`` is the 2×2 space-to-depth transform and each *phase* conv
computes the pre-pool conv outputs at one of the four positions inside
the pool window. leaky-ReLU and +bias are monotonic, so they commute
with the max. Each phase kernel is a (2, 2, 4C, O) rearrangement of the
original (3, 3, C, O) weights (entries that would read outside the 3×3
window are zero). Channel counts quadruple (3→12, 32→128), so the MXU
contraction dim goes from 27 to 48 (conv1) and 288 to 512 (conv2).

Used at inference on folded params (models.fold); equivalence is
tested against the reference composition to fp tolerance.

**Measured result (v5e, 448², batch 32, benchmarks/compare_fast_stem.py):
XLA already matches it** — standard folded forward 15.5 ms vs fast-s2d
16.4 ms: the compiler's own layout handling of the small-channel stem is
as good as the hand-rewrite, and the extra s2d transposes cost slightly
more than they save. Kept as a tested building block (the construction
wins on compilers/shapes where the stem is genuinely layout-bound) but
the standard path remains the default.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from jax import lax

from tensorflow_yolo2_tpu.models.darknet import _DARKNET19_SCHEDULE
from tensorflow_yolo2_tpu.models.layers import leaky_relu, space_to_depth


def phase_kernel(w: jnp.ndarray, di: int, dj: int) -> jnp.ndarray:
    """Rearrange a (3, 3, C, O) kernel into the (2, 2, 4C, O) phase kernel
    computing pre-pool outputs at pool-window position (di, dj).

    Traceable (pure stacking/slicing) so it folds into the jitted graph —
    XLA constant-folds it when the params are concrete.
    """
    kh, kw, c, o = w.shape
    assert (kh, kw) == (3, 3)
    zeros = jnp.zeros((c, o), w.dtype)
    dr = -1 if di == 0 else 0
    dc = -1 if dj == 0 else 0
    rows = []
    for a in range(2):
        cols = []
        for bcol in range(2):
            blocks = []
            for r_row in range(2):
                u = 2 * (a + dr) + r_row - di + 1  # original kernel row
                for r_col in range(2):
                    v = 2 * (bcol + dc) + r_col - dj + 1
                    blocks.append(w[u, v] if 0 <= u <= 2 and 0 <= v <= 2
                                  else zeros)
            cols.append(jnp.concatenate(blocks, axis=0))  # (4C, O)
        rows.append(jnp.stack(cols, axis=0))  # (2, 4C, O)
    return jnp.stack(rows, axis=0)  # (2, 2, 4C, O)


def conv_pool_s2d(x_s2d: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                  dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """leaky(max-pool(conv3x3(x) + b)) computed on the s2d input.

    x_s2d: (B, H/2, W/2, 4C); w: the original (3, 3, C, O) kernel.
    Returns the post-pool (B, H/2, W/2, O) map.
    """
    x_s2d = x_s2d.astype(dtype)
    acc = None
    for di in (0, 1):
        for dj in (0, 1):
            k = phase_kernel(w, di, dj).astype(dtype)
            pad_r = (1, 0) if di == 0 else (0, 1)
            pad_c = (1, 0) if dj == 0 else (0, 1)
            y = lax.conv_general_dilated(
                x_s2d, k, (1, 1), (pad_r, pad_c),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            acc = y if acc is None else jnp.maximum(acc, y)
    return leaky_relu(acc + b.astype(dtype))


def detect_tail(folded_params: Mapping[str, Any], x: jnp.ndarray,
                dtype: Any = jnp.bfloat16,
                linear_output: bool = False) -> jnp.ndarray:
    """Folded Darknet19 detector forward AFTER the first two conv+pool
    stages: ``x`` is the (B, H/4, W/4, 64) stage-2 output (from either
    stem implementation); runs conv3..conv18 + detection head.
    ``linear_output`` drops the leaky on the final 1×1 conv — the
    anchor-head layout (Darknet19Detector(bn_on_output=False), the
    pascal_train_darknet --v2 convention); default False matches the
    reference's BN+leaky-on-output quirk."""
    bk = folded_params["backbone"]

    def conv(x, p, kernel_size, act=True):
        pad = (kernel_size - 1) // 2
        y = lax.conv_general_dilated(
            x, p["kernel"].astype(dtype), (1, 1),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + p["bias"].astype(dtype)
        return leaky_relu(y) if act else y

    conv_i = 0
    pools_seen = 0
    for item in _DARKNET19_SCHEDULE:
        if item == "M":
            pools_seen += 1
            if pools_seen <= 2:
                continue  # folded into the s2d stages
            x = lax.reduce_window(x, -jnp.inf, lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
            continue
        conv_i += 1
        if conv_i <= 2:
            continue  # handled by the s2d stem
        x = conv(x, bk[f"conv{conv_i}"]["conv"], item[0])

    det = folded_params["detection"]
    for name, k in (("conv1", 3), ("conv2", 3), ("conv3", 3), ("output", 1)):
        x = conv(x, det[name]["conv"], k,
                 act=not (linear_output and name == "output"))
    return x.astype(jnp.float32)


def fast_detect_forward(folded_params: Mapping[str, Any], images: jnp.ndarray,
                        dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """Full folded Darknet19 detector forward with the s2d stem on the
    first two conv+pool stages; layers 3+ run the normal schedule.

    Numerically equivalent to Darknet19Detector(fold_bn=True) at
    inference (pool windows never straddle — H, W must be multiples of
    32 as usual).
    """
    bk = folded_params["backbone"]
    # stage 1: conv1 (3→32) + pool on s2d(input)
    x = conv_pool_s2d(space_to_depth(images),
                      bk["conv1"]["conv"]["kernel"],
                      bk["conv1"]["conv"]["bias"], dtype)
    # stage 2: conv2 (32→64) + pool on s2d of the stage-1 map
    x = conv_pool_s2d(space_to_depth(x),
                      bk["conv2"]["conv"]["kernel"],
                      bk["conv2"]["conv"]["bias"], dtype)
    return detect_tail(folded_params, x, dtype)
