"""YOLO grid-detection loss as one jitted function (single XLA fwd+bwd).

Capability of reference src/yolo2_nets/net_utils.py:263-372 (``get_loss``):
sum-squared YOLOv1 loss over an S×S grid with B box slots per cell —
per-cell class MSE on responsible cells, coordinate loss on
(x, y, √w, √h) deltas × λ_coord for the IoU-argmax "responsible" box,
object loss (confidence regressed to live IoU), and no-object confidence
loss × λ_noobj.

Semantics matched to the TF original:

- the responsibility mask comes from a ``>=`` comparison against the
  per-cell IoU max (net_utils.py:323-324), so ties mark *both* boxes
  responsible and the mask carries no gradient (comparisons are
  non-differentiable) — while the IoU inside the object-loss delta *does*
  carry gradient back into the predicted boxes, exactly as in TF;
- all four terms are mean-over-batch of sum-over-grid squares;
- labels are the (S, S, 5+C) grid of
  ``[responsible, cx, cy, w, h (pixels in resized space), one-hot class]``
  built by the VOC loader (pascal_voc.py:137-163).

The loss runs in float32 regardless of the network compute dtype — the
deltas are small and the squared sums are precision-sensitive.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tensorflow_yolo2_tpu.config import YoloConfig
from tensorflow_yolo2_tpu.ops.boxes import grid_to_absolute, split_grid
from tensorflow_yolo2_tpu.ops.iou import box_iou


class YoloLossAux(NamedTuple):
    """Per-term scalars + live tensors (the reference's TB scalars/histograms,
    net_utils.py:361-370, become these structured outputs)."""

    class_loss: jnp.ndarray
    object_loss: jnp.ndarray
    noobject_loss: jnp.ndarray
    coord_loss: jnp.ndarray
    ious: jnp.ndarray         # (batch, S, S, B)
    object_mask: jnp.ndarray  # (batch, S, S, B)


def yolo_loss_term_sums(net: jnp.ndarray, labels: jnp.ndarray,
                        cfg: YoloConfig, offsets=None):
    """Per-image λ-weighted SUM-over-grid loss terms — the shard-local
    core of :func:`yolo_loss`.

    Because every term is a sum of per-cell squares, the loss over a
    row-sharded grid is the ``psum`` of these sums (parallel.spatial's
    H-sharded training path); ``offsets`` carries the shard's global
    (column, row) index grids. Returns
    ``(class_s, object_s, noobject_s, coord_s, ious, object_mask)`` with
    the four sums shaped (batch,).
    """
    net = net.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    S, B = cfg.S, cfg.B

    predict_classes, predict_conf, predict_boxes = split_grid(net, cfg)

    # --- class loss (net_utils.py:290-297) ---
    responsible = labels[..., 0:1]  # (batch, rows, S, 1)
    classes = labels[..., 5:]
    class_delta = responsible * (predict_classes - classes)
    class_s = jnp.sum(jnp.square(class_delta), axis=(1, 2, 3))

    # --- geometry: both box sets in absolute [0,1] cxcywh ---
    gt_boxes = labels[..., 1:5][:, :, :, None, :]  # (batch, rows, S, 1, 4) px
    gt_boxes = jnp.broadcast_to(
        gt_boxes, gt_boxes.shape[:3] + (B, 4)) / float(cfg.image_size)
    predict_abs = grid_to_absolute(predict_boxes, cfg, offsets=offsets)
    ious = box_iou(predict_abs, gt_boxes)  # (batch, rows, S, B)

    # Responsible box = per-cell IoU argmax (ties → all), masked to
    # responsible cells (net_utils.py:322-326). The comparison blocks
    # gradient through the mask, matching TF.
    cell_max = jnp.max(ious, axis=3, keepdims=True)
    object_mask = (ious >= cell_max).astype(jnp.float32) * responsible
    noobject_mask = 1.0 - object_mask

    # --- coordinate loss on cell-relative (x, y, √w, √h) (net_utils.py:328-347) ---
    if offsets is None:
        offset = jnp.asarray(cfg.offset)  # (S, S, B)
        offset_t = jnp.transpose(offset, (1, 0, 2))
    else:
        offset, offset_t = offsets
    gt_rel = jnp.stack(
        [
            gt_boxes[..., 0] * S - offset,
            gt_boxes[..., 1] * S - offset_t,
            jnp.sqrt(gt_boxes[..., 2]),
            jnp.sqrt(gt_boxes[..., 3]),
        ],
        axis=-1,
    )
    boxes_delta = object_mask[..., None] * (predict_boxes - gt_rel)
    coord_s = jnp.sum(jnp.square(boxes_delta),
                      axis=(1, 2, 3, 4)) * cfg.lambda_coord

    # --- object / no-object confidence losses (net_utils.py:349-359) ---
    object_delta = object_mask * (predict_conf - ious)
    object_s = jnp.sum(jnp.square(object_delta), axis=(1, 2, 3))
    noobject_delta = noobject_mask * predict_conf
    noobject_s = jnp.sum(jnp.square(noobject_delta),
                         axis=(1, 2, 3)) * cfg.lambda_noobj

    return class_s, object_s, noobject_s, coord_s, ious, object_mask


def yolo_loss(net: jnp.ndarray, labels: jnp.ndarray,
              cfg: YoloConfig) -> tuple[jnp.ndarray, YoloLossAux]:
    """Compute the YOLOv1 grid loss.

    Args:
      net: (batch, S, S, 5B+C) raw head output.
      labels: (batch, S, S, 5+C) ground-truth grid (see module docstring).
      cfg: grid config (S, B, C, image_size, λs).

    Returns:
      (total_loss scalar, YoloLossAux).
    """
    class_s, object_s, noobject_s, coord_s, ious, object_mask = \
        yolo_loss_term_sums(net, labels, cfg)
    class_loss = jnp.mean(class_s)
    object_loss = jnp.mean(object_s)
    noobject_loss = jnp.mean(noobject_s)
    coord_loss = jnp.mean(coord_s)

    total = class_loss + object_loss + noobject_loss + coord_loss
    return total, YoloLossAux(class_loss, object_loss, noobject_loss,
                              coord_loss, ious, object_mask)
