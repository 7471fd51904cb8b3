"""Box IoU in pure jnp — fuses to a handful of VPU ops under XLA.

Capability of reference src/yolo2_nets/net_utils.py:222-260 (``get_iou``):
elementwise IoU of co-indexed cxcywh box tensors, clipped to [0, 1] with a
1e-10 union floor. Shapes are arbitrary leading dims + a trailing 4-dim.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of (..., 4) cxcywh boxes; returns (...)."""
    b1 = cxcywh_to_corners(boxes1)
    b2 = cxcywh_to_corners(boxes2)
    return corners_iou(b1, b2)


def corners_iou(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of (..., 4) (x1, y1, x2, y2) boxes; returns (...)."""
    lu = jnp.maximum(b1[..., :2], b2[..., :2])
    rd = jnp.minimum(b1[..., 2:], b2[..., 2:])
    inter_wh = jnp.maximum(0.0, rd - lu)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    area1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    area2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    union = jnp.maximum(area1 + area2 - inter, 1e-10)
    return jnp.clip(inter / union, 0.0, 1.0)


def pairwise_corners_iou(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs IoU: (N, 4) × (M, 4) → (N, M). Used by NMS and mAP eval."""
    return corners_iou(b1[:, None, :], b2[None, :, :])


def cxcywh_to_corners(b: jnp.ndarray) -> jnp.ndarray:
    """(..., cx, cy, w, h) -> (..., x1, y1, x2, y2) (shared by decode, IoU,
    NMS and mAP eval — single definition)."""
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=-1)
