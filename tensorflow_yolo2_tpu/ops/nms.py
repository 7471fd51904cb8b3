"""Fixed-shape, mask-based NMS that jits onto TPU.

The reference has **no NMS** (detection display is a bare confidence
threshold, net_utils.py:398); the north-star spec adds confidence-filtered
class-aware NMS for the YOLO2 decode. NMS is data-dependent and sort-heavy,
so this formulation keeps everything static-shape:

- sort all N candidates by score once (XLA sort),
- run a static O(K·N) suppression sweep with ``lax.fori_loop`` where K is
  the max number of kept boxes,
- suppressed/invalid boxes keep their slot with score 0 — callers filter
  host-side.

With N = S·S·B (98 for the VOC config) this is a trivially small kernel;
the point is the shape discipline that keeps it inside the jitted graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tensorflow_yolo2_tpu.ops.boxes import Detections
from tensorflow_yolo2_tpu.ops.iou import pairwise_corners_iou


def nms_fixed(dets: Detections, iou_thresh: float = 0.5,
              max_outputs: int = 32, class_aware: bool = True) -> Detections:
    """Greedy NMS over dense detections; returns ``max_outputs`` slots.

    Candidates with score 0 (below the decode threshold) never survive.
    When ``class_aware``, boxes only suppress boxes of the same class.
    """
    boxes, scores, classes = dets
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes = boxes[order]
    scores = scores[order]
    classes = classes[order]

    iou = pairwise_corners_iou(boxes, boxes)  # (N, N)
    same_class = classes[:, None] == classes[None, :]
    suppresses = iou > iou_thresh
    if class_aware:
        suppresses = suppresses & same_class

    def body(i, alive):
        # If candidate i is still alive (and valid), kill everything later
        # in score order that it suppresses.
        kill = suppresses[i] & alive & (jnp.arange(n) > i)
        return jnp.where(alive[i] & (scores[i] > 0.0), alive & ~kill, alive)

    alive = jax.lax.fori_loop(0, n, body, scores > 0.0)
    kept_scores = jnp.where(alive, scores, 0.0)

    k = min(max_outputs, n)
    top_scores, top_idx = jax.lax.top_k(kept_scores, k)
    return Detections(boxes[top_idx], top_scores, classes[top_idx])
