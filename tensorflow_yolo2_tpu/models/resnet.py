"""ResNet50-v1 backbone + YOLO-head detector in Flax.

Capability of reference src/yolo2_nets/tf_resnet.py:12-33 +
src/slim_dir/nets/resnet_v1.py:73-216 + resnet_utils:

- bottleneck-v1 units (1×1 → 3×3 → 1×1, BN after every conv, post-add
  ReLU; projection shortcut when depth changes, stride-subsample
  otherwise — resnet_v1.py:73-116);
- block layout with stride 2 at block ends (tf_resnet.py:20-28, which
  matches stock slim resnet_v1_50): block1 = 2×(256,64,/1)+(256,64,/2),
  block2 = 3×(512,128,/1)+(512,128,/2), block3 =
  5×(1024,256,/1)+(1024,256,/2), block4 = 3×(2048,512,/1);
- root block: 7×7/2 conv (explicit-pad SAME, conv2d_same semantics,
  resnet_utils.py:77-123) + 3×3/2 max pool;
- ``global_pool=False`` default so 224² inputs give the 7×7×2048 map the
  YOLO head consumes (tf_resnet.py:15, pascal_train_resnet.py:37-39);
- slim resnet_arg_scope BN constants: momentum 0.997, epsilon 1e-5
  (resnet_utils.py:209-239) — kept for slim-checkpoint import parity.

:class:`ResNet50Detector` reproduces the detection graph of
pascal_train_resnet.py:41-50: flatten → fc 4096 (ReLU) → dropout 0.5 →
fc S·S·(5B+C) → grid reshape. Reference quirk kept behind a flag: slim's
``fully_connected`` default ReLU is applied to the *output* FC as well.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def _conv_same(x: jnp.ndarray, features: int, kernel: int, stride: int,
               dtype: Any, param_dtype: Any, name: str,
               use_bias: bool = False) -> jnp.ndarray:
    """slim conv2d_same: explicit symmetric pad + VALID conv for stride>1,
    so output size is exactly ceil(in/stride) regardless of input parity
    (reference resnet_utils.py:77-123). ``use_bias`` for the v2 root conv,
    which slim builds with normalizer_fn=None."""
    if stride == 1:
        return nn.Conv(features, (kernel, kernel), padding="SAME",
                       use_bias=use_bias, dtype=dtype, param_dtype=param_dtype,
                       name=name)(x)
    pad_total = kernel - 1
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad_beg, pad_end), (pad_beg, pad_end)],
                   use_bias=use_bias, dtype=dtype, param_dtype=param_dtype,
                   name=name)(x)


class _BN(nn.Module):
    """slim batch_norm with resnet_arg_scope constants."""

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        return nn.BatchNorm(use_running_average=not train, momentum=0.997,
                            epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            axis_name=self.axis_name if train else None,
                            name="bn")(x)


class BottleneckV1(nn.Module):
    """ResNet v1 bottleneck (reference resnet_v1.py:73-116)."""

    depth: int
    depth_bottleneck: int
    stride: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        depth_in = x.shape[-1]
        if self.depth == depth_in:
            # subsample: 1×1 max pool with stride (resnet_utils.py:59-74)
            shortcut = x if self.stride == 1 else nn.max_pool(
                x, (1, 1), strides=(self.stride, self.stride))
        else:
            shortcut = nn.Conv(self.depth, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="shortcut_conv")(x)
            shortcut = _BN(self.dtype, self.param_dtype, self.bn_axis_name,
                           name="shortcut_bn")(shortcut, train)

        r = nn.Conv(self.depth_bottleneck, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv1")(x)
        r = _BN(self.dtype, self.param_dtype, self.bn_axis_name,
                name="bn1")(r, train)
        r = nn.relu(r)
        r = _conv_same(r, self.depth_bottleneck, 3, self.stride, self.dtype,
                       self.param_dtype, name="conv2")
        r = _BN(self.dtype, self.param_dtype, self.bn_axis_name,
                name="bn2")(r, train)
        r = nn.relu(r)
        r = nn.Conv(self.depth, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv3")(r)
        r = _BN(self.dtype, self.param_dtype, self.bn_axis_name,
                name="bn3")(r, train)
        return nn.relu(shortcut + r)


# (depth, depth_bottleneck, num_units) for ResNet50.
_R50_BLOCKS: Sequence[tuple[int, int, int]] = (
    (256, 64, 3), (512, 128, 4), (1024, 256, 6), (2048, 512, 3),
)


class ResNet50V1(nn.Module):
    """slim-compatible ResNet50-v1.

    Stride-2 sits on the *last* unit of blocks 1-3 — the layout of both
    the reference's variant (tf_resnet.py:20-28) and stock slim
    resnet_v1_50, which agree for this depth.
    ``num_classes=None`` returns features (reference resnet_v1.py:119+).
    """

    num_classes: Optional[int] = None
    global_pool: bool = False  # reference default for detection use
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # root block (resnet_v1.py:197-199)
        x = _conv_same(x, 64, 7, 2, self.dtype, self.param_dtype, name="conv1")
        x = _BN(self.dtype, self.param_dtype, self.bn_axis_name,
                name="conv1_bn")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        for bi, (depth, depth_bn, units) in enumerate(_R50_BLOCKS, start=1):
            last_block = bi == len(_R50_BLOCKS)
            for ui in range(1, units + 1):
                stride = 2 if (ui == units and not last_block) else 1
                x = BottleneckV1(depth, depth_bn, stride, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 bn_axis_name=self.bn_axis_name,
                                 name=f"block{bi}_unit{ui}")(x, train=train)

        if self.global_pool:
            x = jnp.mean(x, axis=(1, 2), keepdims=True)
        if self.num_classes is not None:
            x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="logits")(x)
            if self.global_pool:
                x = x.reshape(x.shape[0], self.num_classes)
        return x.astype(jnp.float32)


class ResNet50Detector(nn.Module):
    """ResNet50 trunk + FC YOLO head (reference pascal_train_resnet.py:37-50).

    flatten(7·7·2048) → yolo_fc1 4096 ReLU → dropout(0.5) → yolo_fc2
    S·S·out → reshape to the grid. ``relu_on_output=True`` keeps the slim
    fully_connected default-ReLU quirk on the output layer.
    """

    output_channels: int = 30
    S: int = 7
    dropout_rate: float = 0.5
    relu_on_output: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ResNet50V1(global_pool=False, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       bn_axis_name=self.bn_axis_name,
                       name="backbone")(x, train=train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(4096, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="yolo_fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.S * self.S * self.output_channels, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="yolo_fc2")(x)
        if self.relu_on_output:
            x = nn.relu(x)
        x = x.reshape(x.shape[0], self.S, self.S, self.output_channels)
        return x.astype(jnp.float32)
