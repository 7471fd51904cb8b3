"""YOLOv2 anchor-based detection loss — one jitted XLA fwd+bwd.

The north-star generalization (BASELINE.json): the reference implements
only the YOLOv1 loss (losses.yolo); the v2 head predicts per-anchor
(tx, ty, tw, th, conf, class-logits) slots decoded as sigmoid-xy /
exp-wh·anchor (ops.boxes.grid_to_absolute_v2). This loss trains that
layout, per YOLO9000:

- anchor assignment: within a responsible cell, the anchor whose *shape*
  (w, h, centered) best IoU-matches the ground-truth box owns it
  (ties → lowest index);
- coordinate loss on (σ(tx), σ(ty)) vs the cell-relative center and on
  (tw, th) vs log(gt/anchor), × λ_coord, owner slots only;
- objectness: σ(conf) regressed to the live decoded-box IoU on owner
  slots; σ(conf)² × λ_noobj on all non-owner slots;
- class: softmax cross-entropy on the owner slot's logits.

Works on the same (S, S, 5+C) label grid the VOC loader builds
(one object per cell), so v1 and v2 heads train from identical data.
All matching is elementwise/argmax — no data-dependent shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from tensorflow_yolo2_tpu.config import YoloConfig
from tensorflow_yolo2_tpu.ops.boxes import grid_to_absolute_v2, split_grid_v2
from tensorflow_yolo2_tpu.ops.iou import box_iou


class YoloV2LossAux(NamedTuple):
    class_loss: jnp.ndarray
    object_loss: jnp.ndarray
    noobject_loss: jnp.ndarray
    coord_loss: jnp.ndarray
    ious: jnp.ndarray         # (batch, S, S, B) decoded-box vs gt IoU
    owner_mask: jnp.ndarray   # (batch, S, S, B)


def _anchor_shape_iou(anchors: jnp.ndarray, gt_wh: jnp.ndarray) -> jnp.ndarray:
    """Shape-only IoU of anchors (B, 2) vs gt (..., 2), both centered.

    anchors are in grid-cell units; gt_wh in [0, 1] image fractions —
    converted here via ×S by the caller.
    """
    inter = jnp.minimum(anchors[..., 0], gt_wh[..., 0]) * \
        jnp.minimum(anchors[..., 1], gt_wh[..., 1])
    union = anchors[..., 0] * anchors[..., 1] + \
        gt_wh[..., 0] * gt_wh[..., 1] - inter
    return inter / jnp.maximum(union, 1e-10)


def yolo_v2_loss(net: jnp.ndarray, labels: jnp.ndarray,
                 cfg: YoloConfig) -> tuple[jnp.ndarray, YoloV2LossAux]:
    """net: (batch, S, S, B·(5+C)) per-slot head output (requires
    cfg.per_slot_classes and cfg.anchors); labels: (batch, S, S, 5+C)."""
    assert cfg.per_slot_classes and cfg.anchors, \
        "yolo_v2_loss needs the per-slot head layout with anchor priors"
    net = net.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    S, B = cfg.S, cfg.B
    anchors = jnp.asarray(cfg.anchors, jnp.float32)  # (B, 2) cell units

    cls_logits, conf, raw_boxes = split_grid_v2(net, cfg)
    responsible = labels[..., 0]                    # (batch, S, S)
    gt_px = labels[..., 1:5] / float(cfg.image_size)  # cxcywh in [0, 1]
    gt_classes = jnp.argmax(labels[..., 5:], axis=-1)

    # --- owner anchor: best shape match within responsible cells ---
    gt_wh_cells = gt_px[..., 2:4] * S               # (batch, S, S, 2)
    shape_iou = _anchor_shape_iou(
        anchors[None, None, None], gt_wh_cells[..., None, :])  # (b,S,S,B)
    best = jnp.argmax(shape_iou, axis=-1)
    owner = jax.nn.one_hot(best, B) * responsible[..., None]  # (b,S,S,B)

    # --- coordinate targets ---
    offset = jnp.asarray(cfg.offset)
    offset_t = jnp.transpose(offset, (1, 0, 2))
    tx_target = (gt_px[..., 0:1] * S - offset)      # cell-relative x
    ty_target = (gt_px[..., 1:2] * S - offset_t)
    safe_wh = jnp.maximum(gt_wh_cells, 1e-6)
    tw_target = jnp.log(safe_wh[..., 0:1] / anchors[:, 0])
    th_target = jnp.log(safe_wh[..., 1:2] / anchors[:, 1])

    sx = jax.nn.sigmoid(raw_boxes[..., 0])
    sy = jax.nn.sigmoid(raw_boxes[..., 1])
    coord_sq = (jnp.square(sx - tx_target) + jnp.square(sy - ty_target) +
                jnp.square(raw_boxes[..., 2] - tw_target) +
                jnp.square(raw_boxes[..., 3] - th_target))
    coord_loss = cfg.lambda_coord * jnp.mean(
        jnp.sum(owner * coord_sq, axis=(1, 2, 3)))

    # --- objectness: live IoU target on owners, suppress the rest ---
    decoded = grid_to_absolute_v2(raw_boxes, cfg)
    gt_boxes = jnp.broadcast_to(gt_px[..., None, :],
                                gt_px.shape[:3] + (B, 4))
    ious = box_iou(decoded, gt_boxes)
    sconf = jax.nn.sigmoid(conf)
    object_loss = jnp.mean(jnp.sum(
        owner * jnp.square(sconf - jax.lax.stop_gradient(ious)),
        axis=(1, 2, 3)))
    noobject_loss = cfg.lambda_noobj * jnp.mean(jnp.sum(
        (1.0 - owner) * jnp.square(sconf), axis=(1, 2, 3)))

    # --- per-anchor class softmax CE on the owner slot ---
    ce = optax.softmax_cross_entropy_with_integer_labels(
        cls_logits, jnp.broadcast_to(gt_classes[..., None],
                                     gt_classes.shape + (B,)))
    class_loss = jnp.mean(jnp.sum(owner * ce, axis=(1, 2, 3)))

    total = coord_loss + object_loss + noobject_loss + class_loss
    return total, YoloV2LossAux(class_loss, object_loss, noobject_loss,
                                coord_loss, ious, owner)


def yolo_v2_task(cfg: YoloConfig):
    """Trainer task wrapper (mirrors trainer.yolo_task).

    Shape-polymorphic over the grid size: the label grid's S selects the
    matching re-gridded config (``YoloConfig.at_scale``), so one task —
    and one ``jax.jit``-ed train step per input bucket — serves YOLO9000
    multiscale training (``pascal_train_darknet --v2 --multiscale``)."""

    def task(outputs: jnp.ndarray, labels: jnp.ndarray):
        total, aux = yolo_v2_loss(outputs, labels,
                                  cfg.at_scale(labels.shape[1]))
        metrics = {
            "loss": total,
            "class_loss": aux.class_loss,
            "object_loss": aux.object_loss,
            "noobject_loss": aux.noobject_loss,
            "coord_loss": aux.coord_loss,
            "mean_iou": jnp.sum(aux.ious * aux.owner_mask) /
            jnp.maximum(jnp.sum(aux.owner_mask), 1.0),
        }
        return total, metrics

    return task
