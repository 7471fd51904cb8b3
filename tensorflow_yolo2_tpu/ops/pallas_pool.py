"""Pallas max-pool backward kernel — the 448² training wall-breaker.

benchmarks/train_breakdown.py + bwd_microbench.py (v5e, batch 128,
448²): the five 2×2/2 max-pool *gradients* cost ~33 ms of the 145 ms
train step — 23% of the wall for near-zero useful FLOPs — because XLA
lowers them to SelectAndScatter at ~2.4× the bandwidth-optimal time
(and the reshape/equality-mask reformulation is 2× worse still).

``max_pool2`` is a drop-in 2×2 stride-2 SAME max pool (even H/W) whose
forward is XLA's fast reduce_window and whose backward is a Pallas
kernel doing the minimum memory traffic: stream x, y, dout once, write
dx once, all work elementwise on the VPU. Tie-breaking matches
SelectAndScatter exactly (first element in row-major window order gets
the gradient), so swapping it in changes no numerics — not even on
bf16 ties.

The layout trick that makes the kernel pure static lane slices: x and dx
are viewed as (B, H, W/2, 2C) — a FREE row-major reshape that puts each
window's even/odd column side by side in lanes — so per input row pair:

  m_rs   = (x_r[:, sC:(s+1)C] == y)        # candidate, row r slot s
  t_00   = m_00                            # window priority order
  t_01   = m_01 & ~t_00                    #   (row-major, matching
  t_10   = m_10 & ~t_00 & ~t_01            #    SelectAndScatter)
  t_11   = m_11 & ~(t_00 | t_01 | t_10)
  dx_r[:, sC:(s+1)C] = where(t_rs, dout, 0)

No sort, no scatter, no shifts/rolls, no cross-window communication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row-pairs processed per grid step (VMEM block = 2R·W·C elements)
_ROWS = 8


def _pool_bwd_kernel(x_ref, y_ref, dout_ref, dx_ref, *, C: int, R: int):
    """One (batch, R row-pair) block; x/dx rows are (W/2, 2C) — lanes
    [0:C] = even column, [C:2C] = odd column of each window."""
    for r in range(R):  # static unroll over row pairs
        # compares run in f32: the VPU has no bf16 cmp ("Target does not
        # support this comparison"); bf16→f32 is exact so equality is
        # unchanged
        y = y_ref[0, r].astype(jnp.float32)   # (W/2, C)
        d = dout_ref[0, r]
        x0 = x_ref[0, 2 * r].astype(jnp.float32)   # (W/2, 2C)
        x1 = x_ref[0, 2 * r + 1].astype(jnp.float32)
        m00 = x0[:, :C] == y
        m01 = x0[:, C:] == y
        m10 = x1[:, :C] == y
        m11 = x1[:, C:] == y
        t00 = m00
        t01 = m01 & ~t00
        t10 = m10 & ~t00 & ~t01
        t11 = m11 & ~(t00 | t01 | t10)
        zero = jnp.zeros_like(d)
        dx_ref[0, 2 * r, :, :C] = jnp.where(t00, d, zero)
        dx_ref[0, 2 * r, :, C:] = jnp.where(t01, d, zero)
        dx_ref[0, 2 * r + 1, :, :C] = jnp.where(t10, d, zero)
        dx_ref[0, 2 * r + 1, :, C:] = jnp.where(t11, d, zero)


def _pool_bwd_pallas(x, y, dout, interpret):
    B, H, W, C = x.shape
    R = _ROWS
    while (H // 2) % R:
        R //= 2
    # free view: adjacent (even, odd) columns side by side in lanes
    x2 = x.reshape(B, H, W // 2, 2 * C)
    kernel = functools.partial(_pool_bwd_kernel, C=C, R=R)
    dx2 = pl.pallas_call(
        kernel,
        grid=(B, H // (2 * R)),
        in_specs=[
            pl.BlockSpec((1, 2 * R, W // 2, 2 * C),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W // 2, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W // 2, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * R, W // 2, 2 * C),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, dout.dtype),
        interpret=interpret,
    )(x2, y, dout)
    return dx2.reshape(B, H, W, C)


@jax.custom_vjp
def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2×2/2 SAME max pool for even H/W (= every darknet pool site),
    XLA forward + Pallas backward."""
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else
        jnp.iinfo(x.dtype).min,
        jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _fwd(x):
    y = max_pool2(x)
    return y, (x, y)


def _bwd(res, dout):
    x, y = res
    interpret = jax.default_backend() != "tpu"
    return (_pool_bwd_pallas(x, y, dout.astype(x.dtype),
                             interpret).astype(x.dtype),)


max_pool2.defvjp(_fwd, _bwd)


def supported(x: jnp.ndarray, window: int, stride: int) -> bool:
    """Shapes where max_pool2 exactly replaces nn.max_pool(2,2,SAME)."""
    return (window == 2 and stride == 2 and x.ndim == 4
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
