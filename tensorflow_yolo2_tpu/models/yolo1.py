"""Historical full YOLOv1-448 network.

Capability of reference yolo1.py:51-83 (+ yolo1_pretrain.py): the original
24-conv YOLOv1 architecture at 448² — conv+bias+leaky (no BatchNorm) —
followed by fc4096 (leaky, dropout 0.5) and a linear fc to the 7×7×30
grid. The reference ships it as a forward-only demo with random init;
here it is a trainable registered model usable with the same YOLO loss
and decode as the Darknet19 detector.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tensorflow_yolo2_tpu.models.layers import leaky_relu, max_pool

# (kernel, features, stride) with "M" = 2×2/2 maxpool; mirrors the layer
# schedule at reference yolo1.py:52-79.
_YOLO1_SCHEDULE: Sequence = (
    (7, 64, 2), "M",
    (3, 192, 1), "M",
    (1, 128, 1), (3, 256, 1), (1, 256, 1), (3, 512, 1), "M",
    (1, 256, 1), (3, 512, 1), (1, 256, 1), (3, 512, 1),
    (1, 256, 1), (3, 512, 1), (1, 256, 1), (3, 512, 1),
    (1, 512, 1), (3, 1024, 1), "M",
    (1, 512, 1), (3, 1024, 1), (1, 512, 1), (3, 1024, 1),
    (3, 1024, 1), (3, 1024, 2), (3, 1024, 1), (3, 1024, 1),
)


class Yolo1PretrainNet(nn.Module):
    """YOLOv1 classification-pretraining net (reference
    yolo1_pretrain.py:65-90): the first 20 convs of the schedule, a 2×2/2
    average pool to 7×7×1024 (448² input), flatten, and one linear FC to
    the class logits."""

    num_classes: int = 1000
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train  # no dropout/BN in the pretrain net
        conv_i = 0
        for item in _YOLO1_SCHEDULE:
            if item == "M":
                x = max_pool(x, 2, 2)
                continue
            k, f, s = item
            conv_i += 1
            x = nn.Conv(f, (k, k), strides=(s, s), padding="SAME",
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"conv{conv_i}")(x)
            x = leaky_relu(x)
            if conv_i == 20:
                break
        x = nn.avg_pool(x, (2, 2), (2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.num_classes, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc21")(x)
        return x.astype(jnp.float32)


class Yolo1Net(nn.Module):
    """24-conv YOLOv1 + FC head → (batch, S, S, out) grid."""

    S: int = 7
    output_channels: int = 30
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv_i = 0
        for item in _YOLO1_SCHEDULE:
            if item == "M":
                x = max_pool(x, 2, 2)
                continue
            k, f, s = item
            conv_i += 1
            x = nn.Conv(f, (k, k), strides=(s, s), padding="SAME",
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"conv{conv_i}")(x)
            x = leaky_relu(x)
        x = x.reshape(x.shape[0], -1)
        x = leaky_relu(nn.Dense(4096, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="fc25")(x))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.S * self.S * self.output_channels,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc26")(x)
        x = x.reshape(x.shape[0], self.S, self.S, self.output_channels)
        return x.astype(jnp.float32)
