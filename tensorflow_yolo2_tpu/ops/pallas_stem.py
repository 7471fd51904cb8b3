"""Pallas fused Darknet19 stem: conv1+pool1+conv2+pool2 in one VMEM pass.

**Measured result (v5e, 448², benchmarks/pallas_stem_bench.py +
round-4 probes): NEGATIVE — XLA wins by ~3.8×.** Compiled-on-TPU
correctness holds (f32 max|Δ| 5.2e-4 vs the XLA composition; bf16
0.016, rounding-consistent), but the kernel serves the stem at
~0.335 ms/image against XLA's 0.088 ms/image at batch 256. Two causes,
both structural: (1) the phase matmuls contract K=48 onto N=32 lanes —
single-digit MXU utilization that no VMEM-residency saving repays at
these shapes; (2) an axon remote-compile bug caps the grid: identical
kernels compile at grid ∈ {2, 4} and crash the Mosaic helper
(tpu_compile_helper exit 1, dtype-independent) at grid ≥ 8, forcing
batch>4 through a sequential lax.map chunking that serializes
dispatch. The batch-256 profile also corrects the round-3 premise: the
stem is 32.5% of the detect-448 forward at the headline batch
(22.4 ms of 69.0), not ~66% — that figure was measured at batch 32
(11.9 of 17.2 ms), where per-layer overheads dominate. Kept as a
tested opt-in (pascal_detect_darknet --pallas-stem, BENCH_PALLAS_STEM)
like the pool-backward negative (ops/pallas_pool.py).

The original motivation (profile at models/fast_stem.py:3-7): XLA
materializes the 448²×32 conv1 activation to HBM (12.8 MB/image, read
back by the pool) and the 3-channel conv1 shape starves the 128×128
MXU. This kernel (VERDICT r3 item 4 — the Pallas attempt after round
3's XLA-level s2d rewrite measured a negative):

- consumes the 2×2 space-to-depth transform of the input
  ((B, H/2, W/2, 12) — computed by XLA outside, one cheap relayout), so
  conv1+pool1 collapse into FOUR 2×2-window "phase" matmuls whose max
  IS the pool (fast_stem.py:8-19 algebra: bias/leaky commute with max),
  with contraction dim 48 instead of 27;
- runs each image's stem once through VMEM in row strips: HBM traffic
  is the s2d input + the (H/4, W/4, 64) output ONLY — the conv1
  activation (the big one) never leaves the chip;
- computes conv2 as an im2col matmul contracting K=288 (shift-and-
  concat in VMEM), with bias + leaky + 2×2/2 max pool fused into the
  epilogue via strided-slice maxes.

Numerics: bf16 matmuls with f32 accumulation (preferred_element_type),
the same conv precision as the XLA path; equivalence is tested against
the folded-backbone prefix in tests/test_pallas_stem.py (interpret mode
on CPU, compiled on TPU via scripts/run_tpu_tests.sh).

Reference capability: darknet.py:126-148 (conv1/conv2 + pools of
darknet19_core) — the reference delegates all compute to TF's native
layer; this is the TPU-native fast path under the same architecture.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflow_yolo2_tpu.models.fast_stem import phase_kernel
from tensorflow_yolo2_tpu.models.layers import space_to_depth


def _pick_strip_rows(h4: int, target: int = 8) -> int:
    """Largest divisor of ``h4`` (output rows) ≤ ``target`` — strip
    height balances VMEM footprint against grid overhead (at 448² the
    14-row strip's intermediates overflow the 16M scoped-VMEM stack by
    ~1M; 8 rows fits with ~5M headroom)."""
    for r in range(min(target, h4), 0, -1):
        if h4 % r == 0:
            return r
    return 1


def _leaky(x: jnp.ndarray, alpha: float = 0.1) -> jnp.ndarray:
    return jnp.maximum(x * alpha, x)


def _shift_w(x: jnp.ndarray, dx: int) -> jnp.ndarray:
    """Shift (R, W, C) along W (the sublane dim) by ``dx`` with zero
    fill — SAME-padding semantics for width."""
    if dx == 0:
        return x
    w = x.shape[-2]
    zpad = jnp.zeros(x.shape[:-2] + (abs(dx), x.shape[-1]), x.dtype)
    if dx > 0:
        return jnp.concatenate([zpad, x[..., : w - dx, :]], axis=-2)
    return jnp.concatenate([x[..., -dx:, :], zpad], axis=-2)


def _im2col3(x: jnp.ndarray) -> jnp.ndarray:
    """(R+2, W, C) → (R, W, 9C) stride-1 3×3 patches; H halo provided
    by the caller, W SAME-padded via shifted copies. Column order
    (dy, dx, c) matches ``kernel.reshape(9C, O)``."""
    r = x.shape[0] - 2
    cols = []
    for dy in range(3):
        rows = x[dy:dy + r]
        for dx in (-1, 0, 1):
            cols.append(_shift_w(rows, -dx))
    return jnp.concatenate(cols, axis=-1)


def _im2col2(x: jnp.ndarray, di: int, dj: int) -> jnp.ndarray:
    """(R+1, W, C) → (R, W, 4C) 2×2 patches for phase (di, dj) of the
    conv+pool rewrite. Row halo: caller passes one extra row ABOVE for
    di=0 phases (dr=-1) and the row set for di=1 starts at the strip.
    Column order (r_row, r_col, c) matches fast_stem.phase_kernel."""
    r = x.shape[0] - 1
    cols = []
    for rr in range(2):
        rows = x[rr:rr + r]
        for rc in range(2):
            dx = rc if dj == 1 else rc - 1
            cols.append(_shift_w(rows, -dx))
    return jnp.concatenate(cols, axis=-1)


def _stem_kernel(x_ref, wp_ref, b1_ref, w2_ref, b2_ref, out_ref,
                 y2_ref, a_ref, *,
                 r2: int, h2: int, n_strips: int, dtype):
    """One grid step = one image. x_ref: (1, H/2+4, W/2, 12) s2d input
    with TWO zero rows of padding above and below (wrapper pads);
    wp_ref: (4, 48, 32) phase kernels; w2_ref: (288, 64).
    out_ref: (1, H/4, W/4, 64). y2_ref/a_ref: VMEM scratch for the
    2×2/2 pool — strided VALUE slices don't lower on Mosaic
    (vector.extract_strided_slice caps strides at 1, and jnp's x[0::2]
    routes through an unsupported >2D gather), but strided REF loads
    (tpu.strided_load) do, so the pool stores y2 and reads it back
    even/odd.
    """
    w2m = w2_ref[:].astype(dtype)
    b1 = b1_ref[:].astype(jnp.float32)
    b2 = b2_ref[:].astype(jnp.float32)

    for s in range(n_strips):
        # p1 rows computed: local t = 0..2r2+1 ↔ global q = 2r2·s−1+t
        # (one conv2-SAME halo row each side; q = −1 / h2 re-zeroed
        # below). Phase (di, dj) of p1 row q reads s2d rows q+di−1 and
        # q+di — so the strip touches s2d global rows 2r2·s−2 ..
        # 2r2·s+2r2+1. With 2 pad rows above, global g lives at padded
        # row g+2 → slice starts at lo = 2r2·s, length 2r2+4.
        lo = 2 * r2 * s
        xs = x_ref[0, lo:lo + 2 * r2 + 4, :, :].astype(dtype)

        # conv1+pool1 as max over 4 phase matmuls, all 2r2+2 p1 rows
        # (incl. the conv2 halo rows) in one go
        p1 = None
        for di in (0, 1):
            # phase di, p1 local row t: s2d globals 2r2·s−2+di+t and
            # +1 → xs locals di+t, di+t+1 → slice offset di
            rows = xs[di:di + 2 * r2 + 3]  # (2r2+3,) → r = 2r2+2
            for dj in (0, 1):
                patches = _im2col2(rows, di, dj)       # (2r2+2, W2, 48)
                y = jax.lax.dot_general(
                    patches, wp_ref[2 * di + dj].astype(dtype),
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                p1 = y if p1 is None else jnp.maximum(p1, y)
        p1 = _leaky(p1 + b1).astype(dtype)             # (2r2+2, W2, 32)

        # SAME zero padding for conv2 at the image's top/bottom edge:
        # the phase convs computed garbage there (conv of zero-pad rows
        # + bias ≠ 0) — re-zero the out-of-range halo row.
        if s == 0:
            p1 = jnp.concatenate([jnp.zeros_like(p1[:1]), p1[1:]], 0)
        if s == n_strips - 1:
            p1 = jnp.concatenate([p1[:-1], jnp.zeros_like(p1[:1])], 0)

        patches2 = _im2col3(p1)                        # (2r2, W2, 288)
        y2 = jax.lax.dot_general(
            patches2, w2m, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # pool staging is f32: strided ref loads on 16-bit (16, 128)
        # packed tiles crash the Mosaic compiler; the (8, 128) f32
        # layout is the probed-working path
        y2_ref[:] = _leaky(y2 + b2)                    # (2r2, W2, 64) f32
        a_ref[:] = jnp.maximum(y2_ref[0::2], y2_ref[1::2])  # row pool
        out_ref[0, r2 * s:r2 * (s + 1)] = jnp.maximum(
            a_ref[:, 0::2], a_ref[:, 1::2]).astype(out_ref.dtype)


# largest pallas_call grid the axon remote Mosaic helper accepts for
# this kernel (grid 8+ crashes tpu_compile_helper, dtype-independent);
# larger batches run as a sequential lax.map over chunks of this size
_MAX_GRID = 4


@functools.partial(jax.jit,
                   static_argnames=("interpret", "dtype", "strip_rows"))
def fused_stem(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
               w2: jnp.ndarray, b2: jnp.ndarray,
               interpret: bool = False, dtype: Any = jnp.bfloat16,
               strip_rows: int | None = None) -> jnp.ndarray:
    """Fused first-two-Darknet19-stages forward.

    x: (B, H, W, 3) normalized input, H, W multiples of 4 (32 in the
    real net); w1: (3, 3, 3, 32) folded conv1 kernel + b1; w2:
    (3, 3, 32, 64) + b2. Returns (B, H/4, W/4, 64) in ``dtype``.
    """
    b, h, w, cin = x.shape
    if b > _MAX_GRID:
        # chunked dispatch around the helper's grid cap; pad the ragged
        # tail chunk. Applied in interpret mode too (the chunking is
        # backend-independent lax.map + pad/reslice) so the CPU tests
        # exercise the exact path production serving batches take.
        pad = (-b) % _MAX_GRID
        xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0))) if pad else x
        xc = xp.reshape(-1, _MAX_GRID, h, w, cin)
        y = jax.lax.map(
            lambda c: fused_stem(c, w1, b1, w2, b2, interpret=interpret,
                                 dtype=dtype, strip_rows=strip_rows), xc)
        y = y.reshape(-1, h // 4, w // 4, y.shape[-1])
        return y[:b] if pad else y
    assert h % 4 == 0 and w % 4 == 0, (h, w)
    c1 = w1.shape[-1]
    c2 = w2.shape[-1]
    h4, w4 = h // 4, w // 4
    r2 = strip_rows or _pick_strip_rows(h4)
    n_strips = h4 // r2

    xs2d = space_to_depth(x.astype(dtype))            # (B, H/2, W/2, 12)
    xs2d = jnp.pad(xs2d, ((0, 0), (2, 2), (0, 0), (0, 0)))

    # (4, 48, 32) phase kernels (fast_stem.phase_kernel rearrangement)
    wp = jnp.stack([phase_kernel(w1, di, dj).reshape(4 * 4 * cin, c1)
                    for di in (0, 1) for dj in (0, 1)])
    w2m = w2.reshape(9 * w2.shape[2], c2)

    kernel = functools.partial(_stem_kernel, r2=r2, h2=h // 2,
                               n_strips=n_strips, dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h // 2 + 4, w // 2, 4 * cin),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 16 * cin, c1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * w2.shape[2], c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h4, w4, c2), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h4, w4, c2), dtype),
        scratch_shapes=[pltpu.VMEM((2 * r2, w // 2, c2), jnp.float32),
                        pltpu.VMEM((r2, w // 2, c2), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * ((h // 2) * (w // 2) * 4 * 16 * cin * c1 +
                           (h // 2) * (w // 2) * 9 * c1 * c2),
            bytes_accessed=xs2d.size * 2 + b * h4 * w4 * c2 * 2,
            transcendentals=0),
    )(xs2d, wp, b1, w2m, b2)


def pallas_detect_forward(folded_params, images: jnp.ndarray,
                          dtype: Any = jnp.bfloat16,
                          interpret: bool = False,
                          strip_rows: int | None = None,
                          linear_output: bool = False) -> jnp.ndarray:
    """Full folded Darknet19 detector forward with the Pallas fused stem
    on the first two conv+pool stages; conv3+ run the normal XLA
    schedule (models.fast_stem.detect_tail). Numerically equivalent to
    ``Darknet19Detector(fold_bn=True)`` at inference up to bf16
    accumulation-order differences in the stem. ``linear_output``
    matches bn_on_output=False (the --v2 anchor head)."""
    from tensorflow_yolo2_tpu.models.fast_stem import detect_tail

    bk = folded_params["backbone"]
    c1, c2 = bk["conv1"]["conv"], bk["conv2"]["conv"]
    x = fused_stem(images, c1["kernel"], c1["bias"],
                   c2["kernel"], c2["bias"],
                   interpret=interpret, dtype=dtype,
                   strip_rows=strip_rows)
    return detect_tail(folded_params, x, dtype,
                       linear_output=linear_output)


def stem_reference(x: jnp.ndarray, w1, b1, w2, b2,
                   dtype=jnp.bfloat16) -> jnp.ndarray:
    """XLA reference composition (conv+bias+leaky+pool ×2) for tests
    and A/B benchmarking — bit-comparable modulo f32-vs-bf16
    accumulation differences in the conv."""
    from jax import lax

    def block(x, wk, bk):
        y = lax.conv_general_dilated(
            x.astype(dtype), wk.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = _leaky(y.astype(jnp.float32) + bk.astype(jnp.float32))
        y = y.astype(dtype)
        return lax.reduce_window(y, -jnp.inf, lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "SAME")

    return block(block(x.astype(dtype), w1, b1), w2, b2)
