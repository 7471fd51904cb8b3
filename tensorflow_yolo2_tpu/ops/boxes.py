"""Grid-prediction decode: raw head output → absolute boxes + scores.

Covers two decode families:

- ``decode_grid`` — the reference's YOLOv1 decode: x/y are cell-relative
  offsets added to the column/row grid and divided by S; w/h are predicted
  as square roots and squared at decode (capability of reference
  src/yolo2_nets/net_utils.py:375-439, which also does only confidence
  thresholding — no NMS; NMS here is an opt-in extension, see ops.nms).
- ``decode_grid_v2`` — the YOLO2/9000 anchor decode (sigmoid xy, exp wh on
  anchor priors, per-anchor class softmax) for the ``per_slot_classes``
  head layout.

Everything is static-shape: decoders return dense (S*S*B, …) tensors plus a
validity score; filtering happens by masking, never by dynamic gathers, so
the whole path jits onto the TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tensorflow_yolo2_tpu.config import YoloConfig
from tensorflow_yolo2_tpu.ops.iou import cxcywh_to_corners as _cxcywh_to_corners


class Detections(NamedTuple):
    """Dense, fixed-shape detections (per image).

    boxes:   (N, 4) corners (x1, y1, x2, y2) in [0, 1] image fractions.
    scores:  (N,) confidence (already threshold-masked to 0 where invalid).
    classes: (N,) int32 class index.
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray


def split_grid(net: jnp.ndarray, cfg: YoloConfig):
    """Split a (..., S, S, 5B+C) grid tensor into (classes, conf, boxes).

    Layout per cell is ``[num_class | B conf | B*(x,y,w,h)]``
    (reference: net_utils.py:279-285). Returns class probs (..., S, S, C),
    confidences (..., S, S, B) and raw boxes (..., S, S, B, 4).
    """
    C, B, S = cfg.num_class, cfg.B, cfg.S
    classes = net[..., :C]
    conf = net[..., C:C + B]
    boxes = net[..., C + B:].reshape(net.shape[:-1] + (B, 4))
    del S
    return classes, conf, boxes


def split_grid_v2(net: jnp.ndarray, cfg: YoloConfig):
    """Split a per-slot (..., S, S, B*(5+C)) tensor into (classes, conf, boxes).

    Per-slot layout: each of the B slots carries (x, y, w, h, conf, C class
    logits). Returns class logits (..., S, S, B, C), conf (..., S, S, B),
    raw boxes (..., S, S, B, 4).
    """
    C, B = cfg.num_class, cfg.B
    slots = net.reshape(net.shape[:-1] + (B, 5 + C))
    boxes = slots[..., :4]
    conf = slots[..., 4]
    classes = slots[..., 5:]
    return classes, conf, boxes


def grid_to_absolute(raw_boxes: jnp.ndarray, cfg: YoloConfig,
                     offsets=None) -> jnp.ndarray:
    """YOLOv1 box transform: raw (..., S, S, B, 4) → absolute cxcywh in [0,1].

    x_abs = (tx + col) / S, y_abs = (ty + row) / S, w = tw², h = th²
    (reference: net_utils.py:305-316 / :403-407).

    ``offsets`` overrides the (column, row) index grids — a
    ``(col_offset, row_offset)`` pair of (rows, S, B) arrays. Used by the
    spatially-sharded loss, whose shard sees only a row slice of the grid
    and must offset rows by its global position (parallel.spatial).
    """
    S = cfg.S
    if offsets is None:
        offset = jnp.asarray(cfg.offset)  # [S, S, B], offset[y, x, b] = x
        offset_t = jnp.transpose(offset, (1, 0, 2))
    else:
        offset, offset_t = offsets
    xs = (raw_boxes[..., 0] + offset) / float(S)
    ys = (raw_boxes[..., 1] + offset_t) / float(S)
    ws = jnp.square(raw_boxes[..., 2])
    hs = jnp.square(raw_boxes[..., 3])
    return jnp.stack([xs, ys, ws, hs], axis=-1)


def grid_to_absolute_v2(raw_boxes: jnp.ndarray, cfg: YoloConfig,
                        offsets=None) -> jnp.ndarray:
    """YOLO2 anchor transform: sigmoid xy + anchor-scaled exp wh → cxcywh [0,1].

    ``offsets`` overrides the (column, row) index grids — a
    ``(col_offset, row_offset)`` pair of (rows, S, B) arrays carrying
    GLOBAL row indices, for the spatially-sharded v2 loss whose shard
    sees only a row slice of the grid (parallel.spatial).
    """
    S = cfg.S
    if cfg.anchors:
        anchors = jnp.asarray(cfg.anchors, dtype=raw_boxes.dtype)  # (B, 2) cell units
    else:
        anchors = jnp.ones((cfg.B, 2), dtype=raw_boxes.dtype)
    if offsets is None:
        offset = jnp.asarray(cfg.offset)
        offset_t = jnp.transpose(offset, (1, 0, 2))
    else:
        offset, offset_t = offsets
    xs = (jax.nn.sigmoid(raw_boxes[..., 0]) + offset) / float(S)
    ys = (jax.nn.sigmoid(raw_boxes[..., 1]) + offset_t) / float(S)
    # clamp the wh logits: exp of an unlucky activation must stay finite
    # (overflow poisons the IoU in the v2 loss with inf−inf → nan)
    tw = jnp.clip(raw_boxes[..., 2], -8.0, 8.0)
    th = jnp.clip(raw_boxes[..., 3], -8.0, 8.0)
    ws = anchors[..., 0] * jnp.exp(tw) / float(S)
    hs = anchors[..., 1] * jnp.exp(th) / float(S)
    return jnp.stack([xs, ys, ws, hs], axis=-1)

def decode_grid(net: jnp.ndarray, cfg: YoloConfig,
                object_thresh: float = 0.5) -> Detections:
    """Reference-parity decode of one (S, S, 5B+C) prediction.

    Score = raw confidence (not conf × class prob — the reference thresholds
    bare confidence, net_utils.py:398); class = per-cell argmax
    (net_utils.py:418); scores below ``object_thresh`` are zeroed.
    """
    classes, conf, raw_boxes = split_grid(net, cfg)
    abs_boxes = grid_to_absolute(raw_boxes, cfg)  # (S, S, B, 4) cxcywh
    corners = _cxcywh_to_corners(abs_boxes)
    cls_idx = jnp.argmax(classes, axis=-1).astype(jnp.int32)  # (S, S)
    cls_per_box = jnp.broadcast_to(cls_idx[..., None], conf.shape)
    scores = jnp.where(conf > object_thresh, conf, 0.0)
    n = cfg.S * cfg.S * cfg.B
    return Detections(corners.reshape(n, 4), scores.reshape(n),
                      cls_per_box.reshape(n))


def decode_grid_v2(net: jnp.ndarray, cfg: YoloConfig,
                   object_thresh: float = 0.5) -> Detections:
    """YOLO2 anchor decode of one (S, S, B*(5+C)) per-slot prediction.

    Score = sigmoid(conf) × max per-slot class softmax; class = per-slot
    argmax. This is the north-star anchor path; requires
    ``cfg.per_slot_classes``.
    """
    cls_logits, conf, raw_boxes = split_grid_v2(net, cfg)
    abs_boxes = grid_to_absolute_v2(raw_boxes, cfg)
    corners = _cxcywh_to_corners(abs_boxes)
    cls_prob = jax.nn.softmax(cls_logits, axis=-1)
    score = jax.nn.sigmoid(conf) * jnp.max(cls_prob, axis=-1)
    cls_idx = jnp.argmax(cls_prob, axis=-1).astype(jnp.int32)
    scores = jnp.where(score > object_thresh, score, 0.0)
    n = cfg.S * cfg.S * cfg.B
    return Detections(corners.reshape(n, 4), scores.reshape(n),
                      cls_idx.reshape(n))


def decode_to_detections(net: jnp.ndarray, cfg: YoloConfig,
                         object_thresh: float = 0.5,
                         v2: bool = False) -> Detections:
    """Decode a single prediction grid with either family."""
    if v2:
        return decode_grid_v2(net, cfg, object_thresh)
    return decode_grid(net, cfg, object_thresh)
