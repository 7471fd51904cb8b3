"""Contrast-channel input wrapper for adversarial defense.

Capability of the reference's modified InceptionResnetV2
(src/yolo2_nets/inception_resnet_v2.py:142-147): the network ingests the
15-channel "4-side contrast" representation via an extra 3×3 input-
transform conv (``Conv2d_tr_3x3``) that maps 15 → 3 channels in front of
an otherwise stock backbone. Here the wrapper composes with *any*
registered backbone, and the contrast features themselves are computed
on-device (utils.helpers.add_contrast_channels) so the host pipeline
stays unchanged.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tensorflow_yolo2_tpu.utils.helpers import add_contrast_channels


class ContrastInputModel(nn.Module):
    """x (B,H,W,3) → contrast features (B,H,W,15) → 3×3 transform conv →
    wrapped backbone."""

    backbone: nn.Module
    transform_features: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = add_contrast_channels(x)
        x = nn.Conv(self.transform_features, (3, 3), dtype=self.dtype,
                    name="input_transform")(x)
        return self.backbone(x, train=train)
