"""YOLOv2 anchor-based detection loss — one jitted XLA fwd+bwd.

The north-star generalization (BASELINE.json): the reference implements
only the YOLOv1 loss (losses.yolo); the v2 head predicts per-anchor
(tx, ty, tw, th, conf, class-logits) slots decoded as sigmoid-xy /
exp-wh·anchor (ops.boxes.grid_to_absolute_v2). This loss trains that
layout, per YOLO9000 (including the darknet region-loss training
stabilizers the paper glosses over):

- anchor assignment: within a responsible cell, the anchor whose *shape*
  (w, h, centered) best IoU-matches the ground-truth box owns it
  (ties → lowest index);
- coordinate loss on (σ(tx), σ(ty)) vs the cell-relative center and on
  (tw, th) vs log(gt/anchor), × λ_coord, owner slots only — optionally
  scaled per object by (2 − w·h) so small boxes weigh more
  (``cfg.v2_coord_scale``);
- objectness: σ(conf) regressed to the live decoded-box IoU on owner
  slots; σ(conf)² × λ_noobj on non-owner slots, EXCEPT slots whose best
  IoU against any ground-truth box exceeds ``cfg.v2_ignore_iou`` (the
  darknet ignore threshold — a well-placed duplicate prediction is not
  punished);
- burn-in: for the first ``cfg.v2_burnin_samples`` samples, non-owner
  raw boxes are regressed toward their anchor prior at the cell center
  with weight ``cfg.v2_prior_weight`` (darknet's ``seen < 12800`` prior
  regression), anchoring the early sigmoid/exp decode;
- class: softmax cross-entropy on the owner slot's logits.

Label input, two layouts:

- legacy (batch, S, S, 5+C) — the v1 grid (one object per cell,
  data/voc.build_label_grid); anchor assignment happens here in-loss;
- per-slot (batch, S, S, B, 5+C) — up to B objects per cell, each
  pre-assigned to its best free anchor slot by the loader
  (data/voc.build_label_grid_v2); the layout real anchor training
  needs (a cell can own several objects — the capability the
  reference's first-wins grid caps, pascal_voc.py:159-163).

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
    burnin_loss: jnp.ndarray
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


def yolo_v2_loss(net: jnp.ndarray, labels: jnp.ndarray, cfg: YoloConfig,
                 step: jnp.ndarray | None = None, *,
                 offsets=None, ignore_gt=None, noobj_valid=None
                 ) -> tuple[jnp.ndarray, YoloV2LossAux]:
    """net: (batch, S, S, B·(5+C)) per-slot head output (requires
    cfg.per_slot_classes and cfg.anchors); labels: (batch, S, S, 5+C)
    legacy grid or (batch, S, S, B, 5+C) per-slot grid. ``step`` (the
    optimizer step count) activates the burn-in prior term; None (e.g.
    at eval) disables it.

    The three keyword hooks make the loss row-splittable for spatial
    (H-sharded) training (parallel.spatial.spatial_yolo_v2_train_fn —
    every term is a per-cell sum EXCEPT the ignore-threshold term,
    whose global GT pool the spatial caller assembles with one
    all-gather):

    - ``offsets``: ``(col_offset, row_offset)`` pair of (rows, S, B)
      arrays carrying GLOBAL row indices, replacing ``cfg.offset``/its
      transpose for a shard that owns only ``rows`` grid rows;
    - ``ignore_gt``: ``(gt_all, gt_valid)`` of shapes (batch, N, 4) /
      (batch, N) — the FULL image's ground-truth boxes (fractions) and
      validity, replacing the local flatten in the ignore term;
    - ``noobj_valid``: mask broadcastable to (batch, rows, S, B)
      zeroing the no-object suppression on padding rows (σ(0)² is not
      zero, so divisibility padding would otherwise leak loss).
    """
    assert cfg.per_slot_classes and cfg.anchors, \
        "yolo_v2_loss needs the per-slot head layout with anchor priors"
    net = net.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    S, B = cfg.S, cfg.B
    anchors = jnp.asarray(cfg.anchors, jnp.float32)  # (B, 2) cell units

    cls_logits, conf, raw_boxes = split_grid_v2(net, cfg)
    if offsets is None:
        offset = jnp.asarray(cfg.offset)             # (S, S, B) col index
        offset_t = jnp.transpose(offset, (1, 0, 2))
    else:
        offset, offset_t = offsets

    if labels.ndim == 4:
        # legacy one-object-per-cell grid: in-loss best-shape assignment
        responsible = labels[..., 0]                  # (b, S, S)
        gt_px = labels[..., 1:5] / float(cfg.image_size)
        gt_wh_cells = gt_px[..., 2:4] * S             # (b, S, S, 2)
        shape_iou = _anchor_shape_iou(
            anchors[None, None, None], gt_wh_cells[..., None, :])
        best = jnp.argmax(shape_iou, axis=-1)
        owner = jax.nn.one_hot(best, B) * responsible[..., None]
        # broadcast per-cell targets over the slot axis
        gt_slot = jnp.broadcast_to(gt_px[..., None, :],
                                   gt_px.shape[:3] + (B, 4))
        gt_classes = jnp.broadcast_to(
            jnp.argmax(labels[..., 5:], axis=-1)[..., None],
            owner.shape)
    else:
        # per-slot grid: the loader already matched each object to its
        # best free anchor slot (data/voc.build_label_grid_v2)
        assert labels.ndim == 5 and labels.shape[3] == B, \
            f"per-slot labels must be (b, S, S, {B}, 5+C)"
        owner = labels[..., 0]                        # (b, S, S, B)
        gt_slot = labels[..., 1:5] / float(cfg.image_size)
        gt_classes = jnp.argmax(labels[..., 5:], axis=-1)

    # --- coordinate targets (per owner slot) ---
    gt_wh_slot = jnp.maximum(gt_slot[..., 2:4] * S, 1e-6)  # cell units
    tx_target = gt_slot[..., 0] * S - offset
    ty_target = gt_slot[..., 1] * S - offset_t
    tw_target = jnp.log(gt_wh_slot[..., 0] / anchors[:, 0])
    th_target = jnp.log(gt_wh_slot[..., 1] / anchors[:, 1])

    sx = jax.nn.sigmoid(raw_boxes[..., 0])
    sy = jax.nn.sigmoid(raw_boxes[..., 1])
    coord_sq = (jnp.square(sx - tx_target) + jnp.square(sy - ty_target) +
                jnp.square(raw_boxes[..., 2] - tw_target) +
                jnp.square(raw_boxes[..., 3] - th_target))
    if cfg.v2_coord_scale:
        # darknet region loss: small objects get up to 2× coord weight
        coord_sq = coord_sq * (
            2.0 - gt_slot[..., 2] * gt_slot[..., 3])
    coord_loss = cfg.lambda_coord * jnp.mean(
        jnp.sum(owner * coord_sq, axis=(1, 2, 3)))

    # --- objectness: live IoU target on owners ---
    decoded = grid_to_absolute_v2(raw_boxes, cfg,
                                  offsets=offsets)    # (b, S, S, B, 4)
    ious = box_iou(decoded, gt_slot)
    sconf = jax.nn.sigmoid(conf)
    object_loss = jnp.mean(jnp.sum(
        owner * jnp.square(sconf - jax.lax.stop_gradient(ious)),
        axis=(1, 2, 3)))

    # --- no-object term with the darknet ignore threshold: a non-owner
    # slot whose decoded box overlaps ANY ground-truth object above the
    # threshold is exempt from suppression ---
    noobj_mask = 1.0 - owner
    if noobj_valid is not None:
        noobj_mask = noobj_mask * noobj_valid
    if cfg.v2_ignore_iou < 1.0:
        b = labels.shape[0]
        if ignore_gt is None:
            gt_all = gt_slot.reshape(b, -1, 4)        # (b, N, 4)
            gt_valid = owner.reshape(b, -1)           # (b, N)
        else:
            gt_all, gt_valid = ignore_gt
        flat_dec = decoded.reshape(b, -1, 4)          # (b, M, 4)
        pair = box_iou(flat_dec[:, :, None, :], gt_all[:, None, :, :])
        best_any = jnp.max(pair * gt_valid[:, None, :], axis=-1)
        best_any = jax.lax.stop_gradient(
            best_any.reshape(owner.shape))
        noobj_mask = noobj_mask * (
            best_any <= cfg.v2_ignore_iou).astype(jnp.float32)
    noobject_loss = cfg.lambda_noobj * jnp.mean(jnp.sum(
        noobj_mask * jnp.square(sconf), axis=(1, 2, 3)))

    # --- burn-in: regress non-owner raw boxes toward the anchor prior
    # for the first v2_burnin_samples samples (darknet seen<12800) ---
    burnin_loss = jnp.zeros((), jnp.float32)
    if step is not None and cfg.v2_burnin_samples > 0 \
            and cfg.v2_prior_weight > 0.0:
        seen = step.astype(jnp.float32) * labels.shape[0]
        active = (seen < cfg.v2_burnin_samples).astype(jnp.float32)
        prior_sq = (jnp.square(sx - 0.5) + jnp.square(sy - 0.5) +
                    jnp.square(raw_boxes[..., 2]) +
                    jnp.square(raw_boxes[..., 3]))
        burnin_loss = active * cfg.v2_prior_weight * jnp.mean(
            jnp.sum((1.0 - owner) * prior_sq, axis=(1, 2, 3)))

    # --- per-anchor class softmax CE on the owner slot ---
    ce = optax.softmax_cross_entropy_with_integer_labels(
        cls_logits, gt_classes)
    class_loss = jnp.mean(jnp.sum(owner * ce, axis=(1, 2, 3)))

    total = (coord_loss + object_loss + noobject_loss + class_loss +
             burnin_loss)
    return total, YoloV2LossAux(class_loss, object_loss, noobject_loss,
                                coord_loss, burnin_loss, ious, owner)


def yolo_v2_task(cfg: YoloConfig):
    """Trainer task wrapper (mirrors trainer.yolo_task).

    Shape-polymorphic over the grid size: the label grid's S selects the
    matching re-gridded config (``YoloConfig.at_scale``), so one task —
    and one ``jax.jit``-ed train step per input bucket — serves YOLO9000
    multiscale training (``pascal_train_darknet --v2 --multiscale``).
    The ``step`` kwarg (threaded in by the Trainer) drives the burn-in
    prior schedule."""

    def task(outputs: jnp.ndarray, labels: jnp.ndarray,
             step: jnp.ndarray | None = None):
        total, aux = yolo_v2_loss(outputs, labels,
                                  cfg.at_scale(labels.shape[1]), step=step)
        metrics = {
            "loss": total,
            "class_loss": aux.class_loss,
            "object_loss": aux.object_loss,
            "noobject_loss": aux.noobject_loss,
            "coord_loss": aux.coord_loss,
            "burnin_loss": aux.burnin_loss,
            "mean_iou": jnp.sum(aux.ious * aux.owner_mask) /
            jnp.maximum(jnp.sum(aux.owner_mask), 1.0),
        }
        return total, metrics

    return task
