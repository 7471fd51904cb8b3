"""Layer primitives shared by the backbones.

Capability of reference src/yolo2_nets/darknet.py:10-57 (conv_layer,
conv_bn_layer, max_pool, fc_layer) rebuilt TPU-first:

- NHWC layout throughout (the TPU-friendly conv layout XLA tiles onto the
  MXU without transposes);
- mixed precision: params live in fp32 (``param_dtype``), compute runs in
  ``dtype`` (bfloat16 by default from TrainConfig) so conv MACs hit the MXU
  at bf16 rate;
- conv → BatchNorm → leaky-ReLU is left as three XLA ops — XLA fuses the
  BN scale/shift and the leaky max into the conv epilogue; for inference
  the BN is folded into the conv weights entirely (models.fold);
- BatchNorm matches TF1 ``tf.layers.batch_normalization`` defaults
  (momentum=0.99, epsilon=1e-3 — darknet.py:42-44) for weight-import
  parity, and can sync batch statistics across the data mesh axis
  (``axis_name``) — the TPU-native replacement for per-clone BN stats in
  the reference's multi-GPU deployment.

The reference applies a (redundant) conv bias before BN (darknet.py:35,42);
we keep it so imported TF checkpoints map 1:1.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

LEAKY_ALPHA = 0.1  # reference darknet.py:5


def leaky_relu(x: jnp.ndarray, alpha: float = LEAKY_ALPHA) -> jnp.ndarray:
    """max(alpha·x, x) — the reference's hand-rolled leaky ReLU (darknet.py:45)."""
    return jnp.maximum(alpha * x, x)


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/2, W/2, 4C); channel = (2·r_row + r_col)·C + c.

    The YOLO9000 "reorg" / passthrough transform (and the building block
    of the s2d stem rewrite, models.fast_stem). Pure reshape/transpose —
    XLA lowers it to a copy with no compute.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


class ConvBN(nn.Module):
    """3×3/1×1 SAME conv + BatchNorm + leaky-ReLU (reference conv_bn_layer).

    ``use_bn=False`` yields a plain conv+bias+leaky — the shape BN folding
    produces for inference.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    use_bn: bool = True
    activate: bool = True
    alpha: float = LEAKY_ALPHA
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None  # set to mesh data axis for syncBN

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            use_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                axis_name=self.bn_axis_name if train else None,
                name="bn",
            )(x)
        if self.activate:
            x = leaky_relu(x, self.alpha)
        return x


class Dense(nn.Module):
    """FC layer with optional leaky activation (reference fc_layer,
    darknet.py:49-57). ``flat=True`` flattens trailing dims first."""

    features: int
    linear: bool = False
    flat: bool = False
    alpha: float = LEAKY_ALPHA
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.flat:
            x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.features, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc")(x)
        if not self.linear:
            x = leaky_relu(x, self.alpha)
        return x


def max_pool(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """SAME max pool (reference darknet.py:24-25).

    TFY2_FAST_POOL=1 routes the 2×2/2 even-shape case through
    ops.pallas_pool (XLA forward + Pallas backward) on TPU. Measured
    NEGATIVE result on v5e (benchmarks/pool_kernel_bench.py): the
    Pallas bwd loses to XLA's SelectAndScatter 84 vs 31 ms across the
    darknet pool sites — the big pools carry only 32-64 channels (far
    under the 128-lane VPU width) and the odd-column lane slice forces
    relayouts — so the experiment stays opt-in; numerics are identical
    either way (incl. tie-breaking).
    """
    import os

    if os.environ.get("TFY2_FAST_POOL", "0") == "1":
        import jax

        from tensorflow_yolo2_tpu.ops import pallas_pool

        if pallas_pool.supported(x, window, stride) and \
                jax.default_backend() == "tpu":
            return pallas_pool.max_pool2(x)
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding="SAME")


def avg_pool(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """SAME avg pool (reference darknet.py:28-29)."""
    return nn.avg_pool(x, (window, window), strides=(stride, stride),
                       padding="SAME")
