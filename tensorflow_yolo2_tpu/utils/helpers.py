"""Misc helpers (capability of reference src/utils/helpers.py).

- :func:`compare_label_values` — prediction/label agreement count +
  accuracy (helpers.py:17-33);
- :func:`add_contrast_channels` — the adversarial-defense input transform
  (helpers.py:38-62): for each RGB channel, 4 extra channels holding the
  absolute difference to the up/down/left/right neighbor pixel → a
  15-channel image. Here it is a vectorized jnp op (jit/vmap-able, runs
  on-device fused into the input pipeline) instead of the reference's
  per-image python loop.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def compare_label_values(preds, labels) -> tuple[int, float]:
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    assert preds.ndim == labels.ndim == 1 and preds.shape == labels.shape
    count = int((preds == labels).sum())
    return count, count / len(preds)


def add_contrast_channels(images: jnp.ndarray) -> jnp.ndarray:
    """(batch, H, W, 3) → (batch, H, W, 15) with 4-side contrast features.

    Channel layout matches the reference: [rgb | |Δup| | |Δdown| |
    |Δleft| | |Δright|], zero-padded at the borders.
    """
    x = images
    z_row = jnp.zeros_like(x[:, :1])
    z_col = jnp.zeros_like(x[:, :, :1])
    up = jnp.concatenate([z_row, jnp.abs(x[:, 1:] - x[:, :-1])], axis=1)
    down = jnp.concatenate([jnp.abs(x[:, :-1] - x[:, 1:]), z_row], axis=1)
    left = jnp.concatenate([z_col, jnp.abs(x[:, :, 1:] - x[:, :, :-1])],
                           axis=2)
    right = jnp.concatenate([jnp.abs(x[:, :, :-1] - x[:, :, 1:]), z_col],
                            axis=2)
    return jnp.concatenate([x, up, down, left, right], axis=-1)
