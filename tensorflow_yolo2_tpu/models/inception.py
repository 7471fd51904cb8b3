"""Inception model family in Flax.

Capability of the reference's vendored slim inception nets
(src/slim_dir/nets/inception_v1.py … inception_v4.py,
inception_resnet_v2.py; also the modified copy at
src/yolo2_nets/inception_resnet_v2.py used by the adversarial
experiment — its 15-channel input transform is provided generically by
models.contrast.ContrastInputModel):

- :class:`InceptionV1` — GoogLeNet with BN (9 mixed blocks); optional
  paper-style aux classifier heads (slim's inception_v1 omits them);
- :class:`InceptionV2` — the BN-paper net: depthwise-separable 7×7 stem
  (slim inception_v2.py:88-98), double-3×3 branches, avg-pool
  projections (max in Mixed_5c), exact slim branch widths
  (inception_v2.py:122-409);
- :class:`InceptionV3` — 35/17/8-grid towers with factorized 7×1/1×7;
  optional aux-logits tower off the last 17×17 block
  (inception_v3.py:497-523) behind ``aux_logits``;
- :class:`InceptionV4` — Inception-A/B/C towers + reduction blocks;
  optional aux-logits tower off the last B block (inception_v4.py:287-305)
  behind ``aux_logits``;
- :class:`InceptionResnetV2` — residual block35/17/8 towers with the
  canonical residual scales (0.17/0.10/0.20).

All blocks are conv(+BN+ReLU) compositions that XLA fuses per branch and
runs on the MXU in the configured dtype. With ``aux_logits=True`` a model
returns ``(logits, aux_logits)``; the aux head feeds a 0.4-weighted loss
term in train_classifier (reference train_image_classifier.py aux loss).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBNReLU(nn.Module):
    """slim conv2d with batch_norm normalizer (inception arg_scope:
    BN momentum 0.9997, eps 0.001, no conv bias, no BN gamma — slim
    batch_norm defaults scale=False, matching the released inception
    checkpoints)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: int = 1
    padding: str = "SAME"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.strides, self.strides),
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9997,
                         epsilon=1e-3, use_scale=False, dtype=self.dtype,
                         name="bn")(x)
        return nn.relu(x)


def _concat(branches: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.concatenate(branches, axis=-1)


class _MixedV1(nn.Module):
    """GoogLeNet inception block (1×1 | 1×1→3×3 | 1×1→3×3 | pool→1×1)."""

    b0: int
    b1: tuple[int, int]
    b2: tuple[int, int]
    b3: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = lambda f, k, n: ConvBNReLU(f, (k, k), dtype=self.dtype, name=n)
        br0 = c(self.b0, 1, "b0")(x, train)
        br1 = c(self.b1[1], 3, "b1b")(c(self.b1[0], 1, "b1a")(x, train), train)
        br2 = c(self.b2[1], 3, "b2b")(c(self.b2[0], 1, "b2a")(x, train), train)
        br3 = c(self.b3, 1, "b3")(
            nn.max_pool(x, (3, 3), (1, 1), "SAME"), train)
        return _concat([br0, br1, br2, br3])


class _AuxHeadV1(nn.Module):
    """GoogLeNet-paper aux classifier (avgpool 5×5/3 → 1×1 128 → FC 1024
    → dropout 0.7 → FC classes). slim's inception_v1 omits these; they
    are provided for paper-faithful deep-supervision training."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        # kernel reduced for small inputs (slim's
        # _reduced_kernel_size_for_small_input convention)
        k = (min(5, x.shape[1]), min(5, x.shape[2]))
        x = nn.avg_pool(x, k, (3, 3), "VALID")
        x = ConvBNReLU(128, (1, 1), dtype=self.dtype, name="proj")(x, train)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc")(x))
        x = nn.Dropout(0.7, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="logits")(x).astype(jnp.float32)


class InceptionV1(nn.Module):
    """GoogLeNet (slim inception_v1.py structure).

    ``aux_logits=True`` adds the two paper aux heads (after mixed_4a and
    mixed_4d) and makes ``__call__`` return ``(logits, aux)`` where aux
    averages the two heads' logits."""

    num_classes: int = 1000
    aux_logits: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = lambda f, k, s, n: ConvBNReLU(f, (k, k), s, dtype=self.dtype,
                                          name=n)
        x = c(64, 7, 2, "conv1")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), "SAME")
        x = c(64, 1, 1, "conv2")(x, train)
        x = c(192, 3, 1, "conv3")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), "SAME")
        specs = [
            ("3a", 64, (96, 128), (16, 32), 32),
            ("3b", 128, (128, 192), (32, 96), 64), ("pool", 0, 0, 0, 0),
            ("4a", 192, (96, 208), (16, 48), 64),
            ("4b", 160, (112, 224), (24, 64), 64),
            ("4c", 128, (128, 256), (24, 64), 64),
            ("4d", 112, (144, 288), (32, 64), 64),
            ("4e", 256, (160, 320), (32, 128), 128), ("pool2", 0, 0, 0, 0),
            ("5a", 256, (160, 320), (32, 128), 128),
            ("5b", 384, (192, 384), (48, 128), 128),
        ]
        aux = []
        for name, b0, b1, b2, b3 in specs:
            if name == "pool":
                x = nn.max_pool(x, (3, 3), (2, 2), "SAME")
            elif name == "pool2":
                # slim's last inter-stage pool is 2×2, not 3×3
                # (MaxPool_5a_2x2, reference inception_v1.py:207-208) —
                # required for TF-checkpoint forward parity
                x = nn.max_pool(x, (2, 2), (2, 2), "SAME")
            else:
                x = _MixedV1(b0, b1, b2, b3, dtype=self.dtype,
                             name=f"mixed_{name}")(x, train)
            if self.aux_logits and name in ("4a", "4d"):
                aux.append(_AuxHeadV1(self.num_classes, dtype=self.dtype,
                                      name=f"aux_{name}")(x, train))
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="logits")(x).astype(jnp.float32)
        if self.aux_logits:
            return logits, (aux[0] + aux[1]) / 2.0
        return logits


class SeparableConvBNReLU(nn.Module):
    """slim separable_conv2d + batch_norm: a depthwise conv (channel
    multiplier) followed by a 1×1 pointwise projection, BN+ReLU on the
    output (reference inception_v2.py:88-98)."""

    features: int
    kernel: tuple[int, int]
    depth_multiplier: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch * self.depth_multiplier, self.kernel,
                    strides=(self.strides, self.strides), padding="SAME",
                    feature_group_count=in_ch, use_bias=False,
                    dtype=self.dtype, name="depthwise")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="pointwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9997,
                         epsilon=1e-3, use_scale=False, dtype=self.dtype,
                         name="bn")(x)
        return nn.relu(x)


class _MixedV2(nn.Module):
    """Inception-v2 block: 1×1 | 1×1→3×3 | 1×1→3×3→3×3 | pool→1×1
    (reference inception_v2.py:122-178 and the 4b-5c family)."""

    b0: int
    b1: tuple[int, int]
    b2: tuple[int, int, int]
    b3: int
    pool: str = "avg"  # Mixed_5c uses max (inception_v2.py:405)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = lambda f, k, n: ConvBNReLU(f, (k, k), dtype=self.dtype, name=n)
        br0 = c(self.b0, 1, "b0")(x, train)
        br1 = c(self.b1[1], 3, "b1b")(c(self.b1[0], 1, "b1a")(x, train),
                                      train)
        t = c(self.b2[0], 1, "b2a")(x, train)
        t = c(self.b2[1], 3, "b2b")(t, train)
        br2 = c(self.b2[2], 3, "b2c")(t, train)
        pooled = (nn.avg_pool(x, (3, 3), (1, 1), "SAME",
                              count_include_pad=False)
                  if self.pool == "avg"
                  else nn.max_pool(x, (3, 3), (1, 1), "SAME"))
        br3 = c(self.b3, 1, "b3")(pooled, train)
        return _concat([br0, br1, br2, br3])


class _ReductionV2(nn.Module):
    """Inception-v2 grid reduction: 1×1→3×3/2 | 1×1→3×3→3×3/2 | maxpool/2
    (reference inception_v2.py:182-203, :328-349)."""

    b0: tuple[int, int]
    b1: tuple[int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        C = lambda f, k, s, n: ConvBNReLU(f, (k, k), s, dtype=self.dtype,
                                          name=n)
        br0 = C(self.b0[1], 3, 2, "b0b")(C(self.b0[0], 1, 1, "b0a")(x, train),
                                         train)
        t = C(self.b1[0], 1, 1, "b1a")(x, train)
        t = C(self.b1[1], 3, 1, "b1b")(t, train)
        br1 = C(self.b1[2], 3, 2, "b1c")(t, train)
        return _concat([br0, br1, nn.max_pool(x, (3, 3), (2, 2), "SAME")])


class InceptionV2(nn.Module):
    """The BN-paper Inception (slim inception_v2.py:30-544): separable
    7×7 stem with depth_multiplier min(64/3, 8)=8 (:92-96), double-3×3
    towers, and the exact slim branch widths."""

    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        # stem: separable 7×7/2 → maxpool → 1×1 64 → 3×3 192 → maxpool
        x = SeparableConvBNReLU(64, (7, 7), depth_multiplier=8, strides=2,
                                dtype=self.dtype, name="conv1")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), "SAME")
        x = ConvBNReLU(64, (1, 1), dtype=self.dtype, name="conv2b")(x, train)
        x = ConvBNReLU(192, (3, 3), dtype=self.dtype, name="conv2c")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), "SAME")
        mixed = lambda *a, **kw: _MixedV2(*a, dtype=self.dtype, **kw)
        x = mixed(64, (64, 64), (64, 96, 96), 32, name="mixed_3b")(x, train)
        x = mixed(64, (64, 96), (64, 96, 96), 64, name="mixed_3c")(x, train)
        x = _ReductionV2((128, 160), (64, 96, 96), dtype=self.dtype,
                         name="mixed_4a")(x, train)
        x = mixed(224, (64, 96), (96, 128, 128), 128,
                  name="mixed_4b")(x, train)
        x = mixed(192, (96, 128), (96, 128, 128), 128,
                  name="mixed_4c")(x, train)
        x = mixed(160, (128, 160), (128, 160, 160), 96,
                  name="mixed_4d")(x, train)
        x = mixed(96, (128, 192), (160, 192, 192), 96,
                  name="mixed_4e")(x, train)
        x = _ReductionV2((128, 192), (192, 256, 256), dtype=self.dtype,
                         name="mixed_5a")(x, train)
        x = mixed(352, (192, 320), (160, 224, 224), 128,
                  name="mixed_5b")(x, train)
        x = mixed(352, (192, 320), (192, 224, 224), 128, pool="max",
                  name="mixed_5c")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.2, deterministic=not train)(x)  # keep_prob 0.8
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="logits")(x).astype(jnp.float32)


class _MixedV3A(nn.Module):  # 35×35 tower
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        C = lambda f, kh, kw, n: ConvBNReLU(f, (kh, kw), dtype=self.dtype,
                                            name=n)
        br0 = C(64, 1, 1, "b0")(x, train)
        br1 = C(64, 5, 5, "b1b")(C(48, 1, 1, "b1a")(x, train), train)
        br2 = C(96, 3, 3, "b2c")(
            C(96, 3, 3, "b2b")(C(64, 1, 1, "b2a")(x, train), train), train)
        br3 = C(self.pool_features, 1, 1, "b3")(
            nn.avg_pool(x, (3, 3), (1, 1), "SAME", count_include_pad=False), train)
        return _concat([br0, br1, br2, br3])


class _MixedV3B(nn.Module):  # 17×17 tower with 1×7/7×1 factorization
    c7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        C = lambda f, kh, kw, n: ConvBNReLU(f, (kh, kw), dtype=self.dtype,
                                            name=n)
        c7 = self.c7
        br0 = C(192, 1, 1, "b0")(x, train)
        t = C(c7, 1, 1, "b1a")(x, train)
        t = C(c7, 1, 7, "b1b")(t, train)
        br1 = C(192, 7, 1, "b1c")(t, train)
        t = C(c7, 1, 1, "b2a")(x, train)
        t = C(c7, 7, 1, "b2b")(t, train)
        t = C(c7, 1, 7, "b2c")(t, train)
        t = C(c7, 7, 1, "b2d")(t, train)
        br2 = C(192, 1, 7, "b2e")(t, train)
        br3 = C(192, 1, 1, "b3")(
            nn.avg_pool(x, (3, 3), (1, 1), "SAME", count_include_pad=False), train)
        return _concat([br0, br1, br2, br3])


class _MixedV3C(nn.Module):  # 8×8 tower
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        C = lambda f, kh, kw, n: ConvBNReLU(f, (kh, kw), dtype=self.dtype,
                                            name=n)
        br0 = C(320, 1, 1, "b0")(x, train)
        t = C(384, 1, 1, "b1a")(x, train)
        br1 = _concat([C(384, 1, 3, "b1b")(t, train),
                       C(384, 3, 1, "b1c")(t, train)])
        t = C(448, 1, 1, "b2a")(x, train)
        t = C(384, 3, 3, "b2b")(t, train)
        br2 = _concat([C(384, 1, 3, "b2c")(t, train),
                       C(384, 3, 1, "b2d")(t, train)])
        br3 = C(192, 1, 1, "b3")(
            nn.avg_pool(x, (3, 3), (1, 1), "SAME", count_include_pad=False), train)
        return _concat([br0, br1, br2, br3])


class InceptionV3(nn.Module):
    """slim inception_v3.py structure (299² default).

    ``aux_logits=True`` adds the slim aux tower off the last 17×17 block
    (inception_v3.py:497-523: avgpool 5×5/3 → 1×1 128 → 5×5 768 VALID →
    1×1 classes) and makes ``__call__`` return ``(logits, aux)``."""

    num_classes: int = 1000
    aux_logits: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        C = lambda f, kh, kw, s, p, n: ConvBNReLU(
            f, (kh, kw), s, p, dtype=self.dtype, name=n)
        x = C(32, 3, 3, 2, "VALID", "conv1a")(x, train)
        x = C(32, 3, 3, 1, "VALID", "conv2a")(x, train)
        x = C(64, 3, 3, 1, "SAME", "conv2b")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = C(80, 1, 1, 1, "VALID", "conv3b")(x, train)
        x = C(192, 3, 3, 1, "VALID", "conv4a")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        for i, pf in enumerate((32, 64, 64)):
            x = _MixedV3A(pf, dtype=self.dtype, name=f"mixed5_{i}")(x, train)
        # grid reduction 35→17
        br0 = C(384, 3, 3, 2, "VALID", "red1_b0")(x, train)
        t = C(64, 1, 1, 1, "SAME", "red1_b1a")(x, train)
        t = C(96, 3, 3, 1, "SAME", "red1_b1b")(t, train)
        br1 = C(96, 3, 3, 2, "VALID", "red1_b1c")(t, train)
        x = _concat([br0, br1, nn.max_pool(x, (3, 3), (2, 2))])
        for i, c7 in enumerate((128, 160, 160, 192)):
            x = _MixedV3B(c7, dtype=self.dtype, name=f"mixed6_{i}")(x, train)
        aux = None
        if self.aux_logits:
            # slim aux tower (inception_v3.py:497-523); the 5×5 kernel is
            # slim's _reduced_kernel_size_for_small_input at 299² input
            a = nn.avg_pool(x, (5, 5), (3, 3), "VALID")
            a = ConvBNReLU(128, (1, 1), dtype=self.dtype,
                           name="aux_proj")(a, train)
            k = (min(5, a.shape[1]), min(5, a.shape[2]))
            a = ConvBNReLU(768, k, padding="VALID", dtype=self.dtype,
                           name="aux_conv")(a, train)
            a = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        name="aux_logits")(a)
            aux = jnp.mean(a, axis=(1, 2)).astype(jnp.float32)
        # grid reduction 17→8
        t = C(192, 1, 1, 1, "SAME", "red2_b0a")(x, train)
        br0 = C(320, 3, 3, 2, "VALID", "red2_b0b")(t, train)
        t = C(192, 1, 1, 1, "SAME", "red2_b1a")(x, train)
        t = C(192, 1, 7, 1, "SAME", "red2_b1b")(t, train)
        t = C(192, 7, 1, 1, "SAME", "red2_b1c")(t, train)
        br1 = C(192, 3, 3, 2, "VALID", "red2_b1d")(t, train)
        x = _concat([br0, br1, nn.max_pool(x, (3, 3), (2, 2))])
        for i in range(2):
            x = _MixedV3C(dtype=self.dtype, name=f"mixed7_{i}")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="logits")(x).astype(jnp.float32)
        if self.aux_logits:
            return logits, aux
        return logits


class _IRBlock(nn.Module):
    """Inception-ResNet residual block (block35/17/8 families) with the
    canonical residual scaling; ``use_relu=False`` gives slim's final
    unscaled ``block8(net, activation_fn=None)``."""

    kind: str  # "35" | "17" | "8"
    scale: float
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        C = lambda f, kh, kw, n: ConvBNReLU(f, (kh, kw), dtype=self.dtype,
                                            name=n)
        if self.kind == "35":
            br0 = C(32, 1, 1, "b0")(x, train)
            br1 = C(32, 3, 3, "b1b")(C(32, 1, 1, "b1a")(x, train), train)
            t = C(32, 1, 1, "b2a")(x, train)
            t = C(48, 3, 3, "b2b")(t, train)
            br2 = C(64, 3, 3, "b2c")(t, train)
            mixed = _concat([br0, br1, br2])
        elif self.kind == "17":
            br0 = C(192, 1, 1, "b0")(x, train)
            t = C(128, 1, 1, "b1a")(x, train)
            t = C(160, 1, 7, "b1b")(t, train)
            br1 = C(192, 7, 1, "b1c")(t, train)
            mixed = _concat([br0, br1])
        else:
            br0 = C(192, 1, 1, "b0")(x, train)
            t = C(192, 1, 1, "b1a")(x, train)
            t = C(224, 1, 3, "b1b")(t, train)
            br1 = C(256, 3, 1, "b1c")(t, train)
            mixed = _concat([br0, br1])
        # linear 1×1 projection back to the trunk width (no BN/ReLU)
        up = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="up")(mixed)
        out = x + self.scale * up
        return nn.relu(out) if self.use_relu else out


class InceptionResnetV2(nn.Module):
    """slim inception_resnet_v2.py structure (299² default); the
    adversarial variant feeds it through models.contrast."""

    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        C = lambda f, kh, kw, s, p, n: ConvBNReLU(
            f, (kh, kw), s, p, dtype=self.dtype, name=n)
        x = C(32, 3, 3, 2, "VALID", "conv1a")(x, train)
        x = C(32, 3, 3, 1, "VALID", "conv2a")(x, train)
        x = C(64, 3, 3, 1, "SAME", "conv2b")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = C(80, 1, 1, 1, "VALID", "conv3b")(x, train)
        x = C(192, 3, 3, 1, "VALID", "conv4a")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        # Mixed_5b
        br0 = C(96, 1, 1, 1, "SAME", "m5_b0")(x, train)
        br1 = C(64, 5, 5, 1, "SAME", "m5_b1b")(
            C(48, 1, 1, 1, "SAME", "m5_b1a")(x, train), train)
        t = C(64, 1, 1, 1, "SAME", "m5_b2a")(x, train)
        t = C(96, 3, 3, 1, "SAME", "m5_b2b")(t, train)
        br2 = C(96, 3, 3, 1, "SAME", "m5_b2c")(t, train)
        br3 = C(64, 1, 1, 1, "SAME", "m5_b3")(
            nn.avg_pool(x, (3, 3), (1, 1), "SAME", count_include_pad=False), train)
        x = _concat([br0, br1, br2, br3])
        for i in range(10):
            x = _IRBlock("35", 0.17, dtype=self.dtype,
                         name=f"block35_{i}")(x, train)
        # reduction A
        br0 = C(384, 3, 3, 2, "VALID", "redA_b0")(x, train)
        t = C(256, 1, 1, 1, "SAME", "redA_b1a")(x, train)
        t = C(256, 3, 3, 1, "SAME", "redA_b1b")(t, train)
        br1 = C(384, 3, 3, 2, "VALID", "redA_b1c")(t, train)
        x = _concat([br0, br1, nn.max_pool(x, (3, 3), (2, 2))])
        for i in range(20):
            x = _IRBlock("17", 0.10, dtype=self.dtype,
                         name=f"block17_{i}")(x, train)
        # reduction B
        t = C(256, 1, 1, 1, "SAME", "redB_b0a")(x, train)
        br0 = C(384, 3, 3, 2, "VALID", "redB_b0b")(t, train)
        t = C(256, 1, 1, 1, "SAME", "redB_b1a")(x, train)
        br1 = C(288, 3, 3, 2, "VALID", "redB_b1b")(t, train)
        t = C(256, 1, 1, 1, "SAME", "redB_b2a")(x, train)
        t = C(288, 3, 3, 1, "SAME", "redB_b2b")(t, train)
        br2 = C(320, 3, 3, 2, "VALID", "redB_b2c")(t, train)
        x = _concat([br0, br1, br2, nn.max_pool(x, (3, 3), (2, 2))])
        for i in range(9):
            x = _IRBlock("8", 0.20, dtype=self.dtype,
                         name=f"block8_{i}")(x, train)
        # slim ends the tower with one unscaled, non-activated block8
        x = _IRBlock("8", 1.0, use_relu=False, dtype=self.dtype,
                     name="block8_post")(x, train)
        x = ConvBNReLU(1536, (1, 1), dtype=self.dtype, name="conv7b")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="logits")(x).astype(jnp.float32)


class InceptionV4(nn.Module):
    """slim inception_v4.py structure (stem + 4×A, 7×B, 3×C towers).

    ``aux_logits=True`` adds the slim aux tower off the last 17×17 block
    (inception_v4.py:287-305: avgpool 5×5/3 → 1×1 128 → full-spatial 768
    VALID → flatten → FC classes) and makes ``__call__`` return
    ``(logits, aux)``."""

    num_classes: int = 1000
    aux_logits: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        C = lambda f, kh, kw, s, p, n: ConvBNReLU(
            f, (kh, kw), s, p, dtype=self.dtype, name=n)
        # stem
        x = C(32, 3, 3, 2, "VALID", "s1")(x, train)
        x = C(32, 3, 3, 1, "VALID", "s2")(x, train)
        x = C(64, 3, 3, 1, "SAME", "s3")(x, train)
        x = _concat([nn.max_pool(x, (3, 3), (2, 2)),
                     C(96, 3, 3, 2, "VALID", "s4")(x, train)])
        t0 = C(64, 1, 1, 1, "SAME", "s5a")(x, train)
        t0 = C(96, 3, 3, 1, "VALID", "s5b")(t0, train)
        t1 = C(64, 1, 1, 1, "SAME", "s6a")(x, train)
        t1 = C(64, 1, 7, 1, "SAME", "s6b")(t1, train)
        t1 = C(64, 7, 1, 1, "SAME", "s6c")(t1, train)
        t1 = C(96, 3, 3, 1, "VALID", "s6d")(t1, train)
        x = _concat([t0, t1])
        x = _concat([C(192, 3, 3, 2, "VALID", "s7")(x, train),
                     nn.max_pool(x, (3, 3), (2, 2))])

        def block_a(x, i):
            br0 = C(96, 1, 1, 1, "SAME", f"a{i}_b0")(x, train)
            br1 = C(96, 3, 3, 1, "SAME", f"a{i}_b1b")(
                C(64, 1, 1, 1, "SAME", f"a{i}_b1a")(x, train), train)
            t = C(64, 1, 1, 1, "SAME", f"a{i}_b2a")(x, train)
            t = C(96, 3, 3, 1, "SAME", f"a{i}_b2b")(t, train)
            br2 = C(96, 3, 3, 1, "SAME", f"a{i}_b2c")(t, train)
            br3 = C(96, 1, 1, 1, "SAME", f"a{i}_b3")(
                nn.avg_pool(x, (3, 3), (1, 1), "SAME", count_include_pad=False), train)
            return _concat([br0, br1, br2, br3])

        def block_b(x, i):
            br0 = C(384, 1, 1, 1, "SAME", f"b{i}_b0")(x, train)
            t = C(192, 1, 1, 1, "SAME", f"b{i}_b1a")(x, train)
            t = C(224, 1, 7, 1, "SAME", f"b{i}_b1b")(t, train)
            br1 = C(256, 7, 1, 1, "SAME", f"b{i}_b1c")(t, train)
            t = C(192, 1, 1, 1, "SAME", f"b{i}_b2a")(x, train)
            t = C(192, 7, 1, 1, "SAME", f"b{i}_b2b")(t, train)
            t = C(224, 1, 7, 1, "SAME", f"b{i}_b2c")(t, train)
            t = C(224, 7, 1, 1, "SAME", f"b{i}_b2d")(t, train)
            br2 = C(256, 1, 7, 1, "SAME", f"b{i}_b2e")(t, train)
            br3 = C(128, 1, 1, 1, "SAME", f"b{i}_b3")(
                nn.avg_pool(x, (3, 3), (1, 1), "SAME", count_include_pad=False), train)
            return _concat([br0, br1, br2, br3])

        def block_c(x, i):
            br0 = C(256, 1, 1, 1, "SAME", f"c{i}_b0")(x, train)
            t = C(384, 1, 1, 1, "SAME", f"c{i}_b1a")(x, train)
            br1 = _concat([C(256, 1, 3, 1, "SAME", f"c{i}_b1b")(t, train),
                           C(256, 3, 1, 1, "SAME", f"c{i}_b1c")(t, train)])
            # slim orientation: 3×1 then 1×3, splitting into 1×3 | 3×1
            # (reference inception_v4.py:134-140) — kept for checkpoint
            # import parity (the paper draws the transpose)
            t = C(384, 1, 1, 1, "SAME", f"c{i}_b2a")(x, train)
            t = C(448, 3, 1, 1, "SAME", f"c{i}_b2b")(t, train)
            t = C(512, 1, 3, 1, "SAME", f"c{i}_b2c")(t, train)
            br2 = _concat([C(256, 1, 3, 1, "SAME", f"c{i}_b2d")(t, train),
                           C(256, 3, 1, 1, "SAME", f"c{i}_b2e")(t, train)])
            br3 = C(256, 1, 1, 1, "SAME", f"c{i}_b3")(
                nn.avg_pool(x, (3, 3), (1, 1), "SAME", count_include_pad=False), train)
            return _concat([br0, br1, br2, br3])

        for i in range(4):
            x = block_a(x, i)
        # reduction A
        br0 = C(384, 3, 3, 2, "VALID", "redA_b0")(x, train)
        t = C(192, 1, 1, 1, "SAME", "redA_b1a")(x, train)
        t = C(224, 3, 3, 1, "SAME", "redA_b1b")(t, train)
        br1 = C(256, 3, 3, 2, "VALID", "redA_b1c")(t, train)
        x = _concat([br0, br1, nn.max_pool(x, (3, 3), (2, 2))])
        for i in range(7):
            x = block_b(x, i)
        aux = None
        if self.aux_logits:
            # slim aux tower off Mixed_6h (inception_v4.py:287-305); the
            # final layer is a fully_connected on the flattened 1×1×768
            # map (unlike v3's 1×1 conv)
            a = nn.avg_pool(x, (5, 5), (3, 3), "VALID")
            a = ConvBNReLU(128, (1, 1), dtype=self.dtype,
                           name="aux_proj")(a, train)
            a = ConvBNReLU(768, (a.shape[1], a.shape[2]), padding="VALID",
                           dtype=self.dtype, name="aux_conv")(a, train)
            a = a.reshape((a.shape[0], -1))
            aux = nn.Dense(self.num_classes, dtype=self.dtype,
                           name="aux_logits")(a).astype(jnp.float32)
        # reduction B
        t = C(192, 1, 1, 1, "SAME", "redB_b0a")(x, train)
        br0 = C(192, 3, 3, 2, "VALID", "redB_b0b")(t, train)
        t = C(256, 1, 1, 1, "SAME", "redB_b1a")(x, train)
        t = C(256, 1, 7, 1, "SAME", "redB_b1b")(t, train)
        t = C(320, 7, 1, 1, "SAME", "redB_b1c")(t, train)
        br1 = C(320, 3, 3, 2, "VALID", "redB_b1d")(t, train)
        x = _concat([br0, br1, nn.max_pool(x, (3, 3), (2, 2))])
        for i in range(3):
            x = block_c(x, i)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="logits")(x).astype(jnp.float32)
        if self.aux_logits:
            return logits, aux
        return logits


INCEPTION_ZOO = {
    "inception_v1": (lambda **kw: InceptionV1(**kw), 224),
    "inception_v2": (lambda **kw: InceptionV2(**kw), 224),
    "inception_v3": (lambda **kw: InceptionV3(**kw), 299),
    "inception_v4": (lambda **kw: InceptionV4(**kw), 299),
    "inception_resnet_v2": (lambda **kw: InceptionResnetV2(**kw), 299),
}
