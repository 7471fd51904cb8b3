"""Classification model zoo.

Capability of the reference's vendored slim model zoo
(src/slim_dir/nets/: alexnet, cifarnet, lenet, overfeat, vgg_a/16/19,
resnet_v1 {50,101,152,200} — nets_factory.py:35-78). Implemented as
compact Flax modules registered in models.registry; each records its
slim ``default_image_size``. The inception family (v1-v4,
inception_resnet_v2) lives in models.inception and the resnet_v2
preact family in models.resnet_v2; both merge into this registry below.

These are classifier capabilities, not weight-import targets (only
resnet_v1_50 and darknet19 have released checkpoints in the reference
workflow), so the implementations favor clarity; conv layouts are NHWC
and all matmul-heavy ops hit the MXU in the configured dtype.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tensorflow_yolo2_tpu.models import resnet as _resnet


class LeNet(nn.Module):
    """slim lenet (nets/lenet.py): 2 conv+pool + fc1024 + logits."""

    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(32, (5, 5), dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.Conv(64, (5, 5), dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc3")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="fc4")(x).astype(jnp.float32)


class CifarNet(nn.Module):
    """slim cifarnet (nets/cifarnet.py): 2 conv+pool(+LRN→here BN) + 2 fc."""

    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.relu(nn.Conv(64, (5, 5), dtype=self.dtype, name="conv1")(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(nn.Conv(64, (5, 5), dtype=self.dtype, name="conv2")(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(384, dtype=self.dtype, name="fc3")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(192, dtype=self.dtype, name="fc4")(x))
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="logits")(x).astype(jnp.float32)


class AlexNet(nn.Module):
    """slim alexnet_v2 (nets/alexnet.py): 5 convs + fc-as-conv head."""

    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.relu(nn.Conv(64, (11, 11), strides=(4, 4), padding="VALID",
                            dtype=self.dtype, name="conv1")(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = nn.relu(nn.Conv(192, (5, 5), dtype=self.dtype, name="conv2")(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), dtype=self.dtype, name="conv3")(x))
        x = nn.relu(nn.Conv(384, (3, 3), dtype=self.dtype, name="conv4")(x))
        x = nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype, name="conv5")(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = nn.relu(nn.Conv(4096, (5, 5), padding="VALID", dtype=self.dtype,
                            name="fc6")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Conv(4096, (1, 1), dtype=self.dtype, name="fc7")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="fc8")(x)
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


class OverFeat(nn.Module):
    """slim overfeat (nets/overfeat.py)."""

    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.relu(nn.Conv(64, (11, 11), strides=(4, 4), padding="VALID",
                            dtype=self.dtype, name="conv1")(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(nn.Conv(256, (5, 5), padding="VALID", dtype=self.dtype,
                            name="conv2")(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(nn.Conv(512, (3, 3), dtype=self.dtype, name="conv3")(x))
        x = nn.relu(nn.Conv(1024, (3, 3), dtype=self.dtype, name="conv4")(x))
        x = nn.relu(nn.Conv(1024, (3, 3), dtype=self.dtype, name="conv5")(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(nn.Conv(3072, (6, 6), padding="VALID", dtype=self.dtype,
                            name="fc6")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Conv(4096, (1, 1), dtype=self.dtype, name="fc7")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="fc8")(x)
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


class VGG(nn.Module):
    """slim vgg family (nets/vgg.py): vgg_a (11), vgg_16, vgg_19."""

    stages: Sequence[int] = (2, 2, 3, 3, 3)  # convs per stage (vgg16)
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        widths = (64, 128, 256, 512, 512)
        for si, (n, w) in enumerate(zip(self.stages, widths), start=1):
            for ci in range(1, n + 1):
                x = nn.relu(nn.Conv(w, (3, 3), dtype=self.dtype,
                                    name=f"conv{si}_{ci}")(x))
            x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.relu(nn.Conv(4096, (7, 7), padding="VALID", dtype=self.dtype,
                            name="fc6")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Conv(4096, (1, 1), dtype=self.dtype, name="fc7")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="fc8")(x)
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


class ResNetV1(nn.Module):
    """Generic resnet_v1 depth family on the ResNet50V1 building blocks
    (slim resnet_v1_{50,101,152,200})."""

    units: Sequence[int] = (3, 4, 6, 3)
    num_classes: int | None = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = _resnet._conv_same(x, 64, 7, 2, self.dtype, jnp.float32,
                               name="conv1")
        x = _resnet._BN(self.dtype, name="conv1_bn")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        depths = (256, 512, 1024, 2048)
        bottlenecks = (64, 128, 256, 512)
        for bi, units in enumerate(self.units, start=1):
            for ui in range(1, units + 1):
                stride = 2 if (ui == units and bi < len(self.units)) else 1
                x = _resnet.BottleneckV1(
                    depths[bi - 1], bottlenecks[bi - 1], stride,
                    dtype=self.dtype, name=f"block{bi}_unit{ui}")(
                        x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes is not None:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="logits")(x)
        return x.astype(jnp.float32)


_RESNET_UNITS = {
    "resnet_v1_101": (3, 4, 23, 3),
    "resnet_v1_152": (3, 8, 36, 3),
    "resnet_v1_200": (3, 24, 36, 3),
}

# name → (builder, default_image_size); consumed by models.registry.
ZOO = {
    "lenet": (lambda **kw: LeNet(**kw), 28),
    "cifarnet": (lambda **kw: CifarNet(**kw), 32),
    "alexnet_v2": (lambda **kw: AlexNet(**kw), 224),
    "overfeat": (lambda **kw: OverFeat(**kw), 231),
    "vgg_a": (lambda **kw: VGG(stages=(1, 1, 2, 2, 2), **kw), 224),
    "vgg_16": (lambda **kw: VGG(stages=(2, 2, 3, 3, 3), **kw), 224),
    "vgg_19": (lambda **kw: VGG(stages=(2, 2, 4, 4, 4), **kw), 224),
}
for _name, _units in _RESNET_UNITS.items():
    ZOO[_name] = ((lambda _u: lambda **kw: ResNetV1(units=_u, **kw))(_units),
                  224)

from tensorflow_yolo2_tpu.models.inception import INCEPTION_ZOO  # noqa: E402
from tensorflow_yolo2_tpu.models.resnet_v2 import RESNET_V2_ZOO  # noqa: E402

ZOO.update(INCEPTION_ZOO)
ZOO.update(RESNET_V2_ZOO)
