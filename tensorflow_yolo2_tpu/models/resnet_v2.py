"""ResNet v2 (pre-activation) family in Flax.

Capability of reference src/slim_dir/nets/resnet_v2.py (resnet_v2_50 /
101 / 152 / 200): bottleneck units with BN+ReLU *before* the convs
(identity mapping residuals), a final post-norm, otherwise the same
block/stride layout as v1. Registered in the zoo alongside the v1 family.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tensorflow_yolo2_tpu.models.resnet import _BN, _conv_same


class BottleneckV2(nn.Module):
    """Pre-activation bottleneck (reference resnet_v2.py bottleneck)."""

    depth: int
    depth_bottleneck: int
    stride: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        preact = nn.relu(_BN(self.dtype, self.param_dtype,
                             name="preact_bn")(x, train))
        depth_in = x.shape[-1]
        if self.depth == depth_in:
            shortcut = x if self.stride == 1 else nn.max_pool(
                x, (1, 1), strides=(self.stride, self.stride))
        else:
            # projection shortcut taken from the pre-activated input; slim
            # builds it with normalizer_fn=None, so it carries a bias
            # (reference resnet_v2.py:96-98)
            shortcut = nn.Conv(self.depth, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=True, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="shortcut_conv")(preact)

        r = nn.Conv(self.depth_bottleneck, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv1")(preact)
        r = nn.relu(_BN(self.dtype, self.param_dtype, name="bn1")(r, train))
        r = _conv_same(r, self.depth_bottleneck, 3, self.stride, self.dtype,
                       self.param_dtype, name="conv2")
        r = nn.relu(_BN(self.dtype, self.param_dtype, name="bn2")(r, train))
        # conv3 has no following BN in v2 (normalizer_fn=None → bias,
        # reference resnet_v2.py:103-105)
        r = nn.Conv(self.depth, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv3")(r)
        return shortcut + r


_UNITS = {
    "resnet_v2_50": (3, 4, 6, 3),
    "resnet_v2_101": (3, 4, 23, 3),
    "resnet_v2_152": (3, 8, 36, 3),
    "resnet_v2_200": (3, 24, 36, 3),
}


class ResNetV2(nn.Module):
    units: Sequence[int] = (3, 4, 6, 3)
    num_classes: Optional[int] = 1000
    global_pool: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # v2 root conv has no BN/ReLU (normalization happens in unit
        # preacts) and therefore a bias (reference resnet_v2.py:196-200)
        x = _conv_same(x, 64, 7, 2, self.dtype, jnp.float32, name="conv1",
                       use_bias=True)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        depths = (256, 512, 1024, 2048)
        bottlenecks = (64, 128, 256, 512)
        for bi, units in enumerate(self.units, start=1):
            for ui in range(1, units + 1):
                stride = 2 if (ui == units and bi < len(self.units)) else 1
                x = BottleneckV2(depths[bi - 1], bottlenecks[bi - 1], stride,
                                 dtype=self.dtype,
                                 name=f"block{bi}_unit{ui}")(x, train=train)
        x = nn.relu(_BN(self.dtype, name="postnorm")(x, train))
        if self.global_pool:
            x = jnp.mean(x, axis=(1, 2))
        if self.num_classes is not None:
            x = nn.Dense(self.num_classes, dtype=self.dtype,
                         name="logits")(x)
        return x.astype(jnp.float32)


RESNET_V2_ZOO = {
    name: ((lambda _u: lambda **kw: ResNetV2(units=_u, **kw))(units), 224)
    for name, units in _UNITS.items()
}
