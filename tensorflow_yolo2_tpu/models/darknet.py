"""Darknet19 backbone + heads in Flax.

Capability of reference src/yolo2_nets/darknet.py:61-201, built per
"YOLO9000: Better, Faster, Stronger":

- :class:`Darknet19Backbone`  — the 18 conv_bn_leaky layers + 5 maxpools
  producing a (H/32, W/32, 1024) feature map (reference
  ``darknet19_core``, darknet.py:126-179);
- :class:`Darknet19Classifier` — backbone + 1×1 conv to ``num_classes`` +
  global average pool (reference ``darknet19``, darknet.py:61-123);
- :class:`DetectionHead` / :class:`Darknet19Detector` — 3×(3×3×1024)
  conv_bn + 1×1 output conv emitting the S×S detection grid (reference
  ``darknet19_detection``, darknet.py:182-201).

Reference quirk preserved behind a flag: BN + leaky-ReLU are applied even
to the logits / output convs (darknet.py:115,198-200). ``bn_on_output=True``
(default) reproduces that for checkpoint parity; ``False`` gives the
idiomatic linear output.

All convs are stride-1 SAME; downsampling is via 2×2 maxpool only, so any
input multiple of 32 works (224 → S=7, 448 → S=14).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tensorflow_yolo2_tpu.models.layers import (
    ConvBN,
    avg_pool,
    max_pool,
    space_to_depth,
)

# (kernel_size, features) per conv, with "M" = 2×2/2 maxpool between stages.
# Mirrors the layer schedule at reference darknet.py:150-177 — including its
# deviation from the YOLO9000 paper: conv4 is a 3×3 (darknet.py:92), not the
# paper's 1×1, which checkpoint-import parity requires us to reproduce.
_DARKNET19_SCHEDULE: Sequence = (
    (3, 32), "M",
    (3, 64), "M",
    (3, 128), (3, 64), (3, 128), "M",
    (3, 256), (1, 128), (3, 256), "M",
    (3, 512), (1, 256), (3, 512), (1, 256), (3, 512), "M",
    (3, 1024), (1, 512), (3, 1024), (1, 512), (3, 1024),
)


class Darknet19Backbone(nn.Module):
    """18-conv Darknet19 trunk → (H/32, W/32, 1024) features."""

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    # tf.layers.batch_normalization default (reference darknet.py:42);
    # lower for short runs so moving stats keep up with the weights
    bn_momentum: float = 0.99
    # Inference fast path: construct with BN folded into the conv weights
    # (see models.fold.fold_params) — BN params vanish from the tree.
    fold_bn: bool = False
    # "pool" = reference parity (2×2/2 maxpool between stages). "stride"
    # = train-perf variant: each downsample is absorbed as stride 2 on
    # the following 3×3 conv — removes the five SelectAndScatter maxpool
    # gradients (~23% of the 448² train step, README wall analysis) at
    # identical parameter shapes (warm-starts intersect fully), but it is
    # NOT architecture-parity with the reference.
    downsample: str = "pool"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_mid: bool = False):
        """``return_mid=True`` additionally returns the (H/16, W/16, 512)
        feature map feeding the last downsample — the YOLO9000
        passthrough source (the paper's "fine-grained features" route
        from the 26×26×512 layer at 416² input)."""
        assert self.downsample in ("pool", "stride"), self.downsample
        conv_i = 0
        pool_i = 0
        n_pools = sum(1 for item in _DARKNET19_SCHEDULE if item == "M")
        mid = None
        pending_stride = False
        for item in _DARKNET19_SCHEDULE:
            if item == "M":
                pool_i += 1
                if pool_i == n_pools:
                    mid = x
                if self.downsample == "pool":
                    x = max_pool(x, 2, 2)
                else:
                    pending_stride = True  # every "M" precedes a 3×3 conv
            else:
                k, f = item
                conv_i += 1
                x = ConvBN(f, kernel_size=k,
                           strides=2 if pending_stride else 1,
                           use_bn=not self.fold_bn,
                           dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           bn_axis_name=self.bn_axis_name,
                           bn_momentum=self.bn_momentum,
                           name=f"conv{conv_i}")(x, train=train)
                pending_stride = False
        if return_mid:
            return x, mid
        return x


class Darknet19Classifier(nn.Module):
    """Darknet19 ImageNet classifier: trunk + 1×1×C conv + global avgpool.

    The reference applies BN+leaky to the 1×1 logits conv and then a 7×7
    average pool (darknet.py:115-117); we pool over the full spatial map so
    448² inputs also work.
    """

    num_classes: int = 1000
    bn_on_output: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    # tf.layers.batch_normalization default (reference darknet.py:42);
    # lower for short runs so moving stats keep up with the weights
    bn_momentum: float = 0.99
    # Inference fast path: construct with BN folded into the conv weights
    # (see models.fold.fold_params) — BN params vanish from the tree.
    fold_bn: bool = False
    downsample: str = "pool"  # see Darknet19Backbone.downsample

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Darknet19Backbone(dtype=self.dtype, param_dtype=self.param_dtype,
                              bn_axis_name=self.bn_axis_name,
                              bn_momentum=self.bn_momentum,
                              fold_bn=self.fold_bn,
                              downsample=self.downsample,
                              name="backbone")(x, train=train)
        x = ConvBN(self.num_classes, kernel_size=1,
                   use_bn=self.bn_on_output and not self.fold_bn,
                   activate=self.bn_on_output,
                   dtype=self.dtype, param_dtype=self.param_dtype,
                   bn_axis_name=self.bn_axis_name,
                   bn_momentum=self.bn_momentum,
                   name="conv19")(x, train=train)
        x = avg_pool(x, x.shape[1], x.shape[1])
        return x.reshape(x.shape[0], self.num_classes).astype(jnp.float32)


class DetectionHead(nn.Module):
    """YOLO detection head: 3×(3×3×1024) conv_bn + 1×1 output conv
    (reference darknet19_detection, darknet.py:182-201)."""

    output_channels: int = 30  # 5B + C for the VOC config
    bn_on_output: bool = True  # reference quirk: BN+leaky on the output conv
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    # tf.layers.batch_normalization default (reference darknet.py:42);
    # lower for short runs so moving stats keep up with the weights
    bn_momentum: float = 0.99
    # Inference fast path: construct with BN folded into the conv weights
    # (see models.fold.fold_params) — BN params vanish from the tree.
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(1, 4):
            x = ConvBN(1024, kernel_size=3, use_bn=not self.fold_bn,
                       dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       bn_axis_name=self.bn_axis_name,
                       bn_momentum=self.bn_momentum,
                       name=f"conv{i}")(x, train=train)
        x = ConvBN(self.output_channels, kernel_size=1,
                   use_bn=self.bn_on_output and not self.fold_bn,
                   activate=self.bn_on_output,
                   dtype=self.dtype, param_dtype=self.param_dtype,
                   bn_axis_name=self.bn_axis_name,
                   bn_momentum=self.bn_momentum,
                   name="output")(x, train=train)
        return x.astype(jnp.float32)


class Darknet19Detector(nn.Module):
    """Backbone + detection head → (batch, S, S, output_channels) grid.

    Composition mirrors pascal_train_darknet.py:39-42 (core → detection →
    reshape); the reshape is a no-op here because the head output is
    already the grid.
    """

    output_channels: int = 30
    bn_on_output: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    # tf.layers.batch_normalization default (reference darknet.py:42);
    # lower for short runs so moving stats keep up with the weights
    bn_momentum: float = 0.99
    # Inference fast path: construct with BN folded into the conv weights
    # (see models.fold.fold_params) — BN params vanish from the tree.
    fold_bn: bool = False
    downsample: str = "pool"  # see Darknet19Backbone.downsample

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Darknet19Backbone(dtype=self.dtype, param_dtype=self.param_dtype,
                              bn_axis_name=self.bn_axis_name,
                              bn_momentum=self.bn_momentum,
                              fold_bn=self.fold_bn,
                              downsample=self.downsample,
                              name="backbone")(x, train=train)
        x = DetectionHead(output_channels=self.output_channels,
                          bn_on_output=self.bn_on_output,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          bn_axis_name=self.bn_axis_name,
                          bn_momentum=self.bn_momentum,
                          fold_bn=self.fold_bn,
                          name="detection")(x, train=train)
        return x


class DetectionHeadV2(nn.Module):
    """Full YOLOv2 detection head with the passthrough (reorg) route.

    Per "YOLO9000: Better, Faster, Stronger" §Fine-Grained Features — a
    capability the reference never built (its head is the plain
    3×conv_bn stack, darknet.py:182-201):

    - two 3×3×1024 conv_bn on the trunk output (H/32);
    - passthrough: the trunk's (H/16, 512) feature map through a 1×1×64
      conv_bn, then a 2×2 space-to-depth reorg → (H/32, 256),
      concatenated with the 1024-channel main path;
    - one more 3×3×1024 conv_bn on the concat;
    - linear 1×1 conv to ``output_channels`` (the paper's head has no
      BN/activation on the output, unlike the reference quirk).
    """

    output_channels: int = 125  # B·(5+C) for the VOC anchor config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    bn_momentum: float = 0.99
    # Inference fast path: construct with BN folded into the conv weights
    # (see models.fold.fold_params) — BN params vanish from the tree.
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mid: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        kw = dict(use_bn=not self.fold_bn, dtype=self.dtype,
                  param_dtype=self.param_dtype,
                  bn_axis_name=self.bn_axis_name,
                  bn_momentum=self.bn_momentum)
        x = ConvBN(1024, kernel_size=3, name="conv1", **kw)(x, train=train)
        x = ConvBN(1024, kernel_size=3, name="conv2", **kw)(x, train=train)
        p = ConvBN(64, kernel_size=1, name="passthrough", **kw)(
            mid, train=train)
        p = space_to_depth(p)  # (H/32, W/32, 256)
        x = jnp.concatenate([x, p.astype(x.dtype)], axis=-1)
        x = ConvBN(1024, kernel_size=3, name="conv3", **kw)(x, train=train)
        x = ConvBN(self.output_channels, kernel_size=1, use_bn=False,
                   activate=False, dtype=self.dtype,
                   param_dtype=self.param_dtype,
                   name="output")(x, train=train)
        return x.astype(jnp.float32)


class Darknet19DetectorV2(nn.Module):
    """Backbone + passthrough head → (batch, S, S, B·(5+C)) anchor grid.

    The real YOLOv2 architecture (Darknet19 trunk + reorg concat), serving
    the same per-slot layout as losses.yolo_v2 / the fused anchor
    decode+NMS kernel. Backbone parameter names match
    :class:`Darknet19Detector`, so classifier warm-starts intersect
    identically."""

    output_channels: int = 125
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    bn_momentum: float = 0.99
    # Inference fast path: construct with BN folded into the conv weights
    # (see models.fold.fold_params) — BN params vanish from the tree.
    fold_bn: bool = False
    downsample: str = "pool"  # see Darknet19Backbone.downsample

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x, mid = Darknet19Backbone(dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   bn_axis_name=self.bn_axis_name,
                                   bn_momentum=self.bn_momentum,
                                   fold_bn=self.fold_bn,
                                   downsample=self.downsample,
                                   name="backbone")(x, train=train,
                                                    return_mid=True)
        x = DetectionHeadV2(output_channels=self.output_channels,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            bn_axis_name=self.bn_axis_name,
                            bn_momentum=self.bn_momentum,
                            fold_bn=self.fold_bn,
                            name="detection")(x, mid, train=train)
        return x
