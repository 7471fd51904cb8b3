"""Independent numpy implementations of the detection math, used as golden
references in tests. Written directly from the equations (YOLOv1 paper +
SURVEY.md behavioral notes), deliberately in a different style from the
jnp implementations they validate.
"""

from __future__ import annotations

import numpy as np


def np_offset(S: int, B: int) -> np.ndarray:
    off = np.zeros((S, S, B), dtype=np.float32)
    for y in range(S):
        for x in range(S):
            off[y, x, :] = x
    return off


def np_iou_cxcywh(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise IoU of (..., 4) cxcywh boxes."""
    ax1, ay1 = a[..., 0] - a[..., 2] / 2, a[..., 1] - a[..., 3] / 2
    ax2, ay2 = a[..., 0] + a[..., 2] / 2, a[..., 1] + a[..., 3] / 2
    bx1, by1 = b[..., 0] - b[..., 2] / 2, b[..., 1] - b[..., 3] / 2
    bx2, by2 = b[..., 0] + b[..., 2] / 2, b[..., 1] + b[..., 3] / 2
    iw = np.maximum(0.0, np.minimum(ax2, bx2) - np.maximum(ax1, bx1))
    ih = np.maximum(0.0, np.minimum(ay2, by2) - np.maximum(ay1, by1))
    inter = iw * ih
    union = np.maximum((ax2 - ax1) * (ay2 - ay1) +
                       (bx2 - bx1) * (by2 - by1) - inter, 1e-10)
    return np.clip(inter / union, 0.0, 1.0)


def np_yolo_loss(net: np.ndarray, labels: np.ndarray, S: int, B: int,
                 num_class: int, image_size: int,
                 lambda_coord: float = 5.0, lambda_noobj: float = 0.5):
    """Scalar YOLOv1 loss + per-term dict, straight from the equations."""
    batch = net.shape[0]
    off = np_offset(S, B)[None]          # (1, S, S, B)
    off_t = np.transpose(off, (0, 2, 1, 3))

    pc = net[..., :num_class]
    conf = net[..., num_class:num_class + B]
    pb = net[..., num_class + B:].reshape(batch, S, S, B, 4)

    resp = labels[..., 0:1]
    cls = labels[..., 5:]
    class_loss = np.mean(
        np.sum((resp * (pc - cls)) ** 2, axis=(1, 2, 3)))

    gt = np.repeat(labels[..., 1:5][:, :, :, None, :], B, axis=3) / image_size
    px = (pb[..., 0] + off) / S
    py = (pb[..., 1] + off_t) / S
    pw = pb[..., 2] ** 2
    ph = pb[..., 3] ** 2
    pabs = np.stack([px, py, pw, ph], axis=-1)
    ious = np_iou_cxcywh(pabs, gt)

    omask = (ious >= ious.max(axis=3, keepdims=True)).astype(np.float32) * resp
    nomask = 1.0 - omask

    gtr = np.stack([gt[..., 0] * S - off, gt[..., 1] * S - off_t,
                    np.sqrt(gt[..., 2]), np.sqrt(gt[..., 3])], axis=-1)
    coord_loss = lambda_coord * np.mean(
        np.sum((omask[..., None] * (pb - gtr)) ** 2, axis=(1, 2, 3, 4)))
    object_loss = np.mean(np.sum((omask * (conf - ious)) ** 2, axis=(1, 2, 3)))
    noobject_loss = lambda_noobj * np.mean(
        np.sum((nomask * conf) ** 2, axis=(1, 2, 3)))

    total = class_loss + coord_loss + object_loss + noobject_loss
    return total, dict(class_loss=class_loss, coord_loss=coord_loss,
                       object_loss=object_loss, noobject_loss=noobject_loss,
                       ious=ious, object_mask=omask)


def np_decode(net_grid: np.ndarray, S: int, B: int, num_class: int,
              thresh: float = 0.5):
    """Reference-style decode of one (S, S, 5B+C) grid: list of
    (x1, y1, x2, y2, score, cls) in [0,1] fractions, conf > thresh."""
    off = np_offset(S, B)
    off_t = np.transpose(off, (1, 0, 2))
    pc = net_grid[..., :num_class]
    conf = net_grid[..., num_class:num_class + B]
    pb = net_grid[..., num_class + B:].reshape(S, S, B, 4)
    out = []
    for r in range(S):
        for c in range(S):
            for i in range(B):
                if conf[r, c, i] > thresh:
                    x = (pb[r, c, i, 0] + off[r, c, i]) / S
                    y = (pb[r, c, i, 1] + off_t[r, c, i]) / S
                    w = pb[r, c, i, 2] ** 2
                    h = pb[r, c, i, 3] ** 2
                    k = int(np.argmax(pc[r, c]))
                    out.append((x - w / 2, y - h / 2, x + w / 2, y + h / 2,
                                float(conf[r, c, i]), k))
    return out


def np_nms(dets, iou_thresh: float = 0.5, class_aware: bool = True):
    """Greedy NMS over [(x1,y1,x2,y2,score,cls)] — returns kept list."""
    dets = sorted(dets, key=lambda d: -d[4])
    kept = []
    for d in dets:
        ok = True
        for k in kept:
            if class_aware and d[5] != k[5]:
                continue
            b1 = np.array(d[:4])
            b2 = np.array(k[:4])
            iw = max(0.0, min(b1[2], b2[2]) - max(b1[0], b2[0]))
            ih = max(0.0, min(b1[3], b2[3]) - max(b1[1], b2[1]))
            inter = iw * ih
            a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
            a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
            iou = inter / max(a1 + a2 - inter, 1e-10)
            if iou > iou_thresh:
                ok = False
                break
        if ok:
            kept.append(d)
    return kept


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_yolo_v2_loss(net: np.ndarray, labels: np.ndarray, cfg,
                    step: int | None = None):
    """Scalar YOLOv2/9000 anchor loss + per-term dict, written loop-style
    straight from the darknet region-loss semantics (anchor owner by shape
    IoU, sigmoid-xy/log-wh coord targets with optional (2−wh) scale, live
    IoU objectness, noobj ignore threshold over all gt boxes, burn-in
    prior regression on non-owner slots). Accepts the legacy
    (b, S, S, 5+C) grid or the per-slot (b, S, S, B, 5+C) grid."""
    S, B, C = cfg.S, cfg.B, cfg.num_class
    anchors = np.asarray(cfg.anchors, np.float32)
    batch = net.shape[0]
    slots = net.astype(np.float64).reshape(batch, S, S, B, 5 + C)

    # per-image gt list: (y, x, b_slot or None, cxcywh in [0,1], cls)
    gts = [[] for _ in range(batch)]
    for i in range(batch):
        if labels.ndim == 4:
            for y in range(S):
                for x in range(S):
                    if labels[i, y, x, 0] != 1:
                        continue
                    box = labels[i, y, x, 1:5] / cfg.image_size
                    wh = box[2:4] * S
                    best, best_iou = 0, -1.0
                    for b in range(B):
                        inter = (min(anchors[b, 0], wh[0]) *
                                 min(anchors[b, 1], wh[1]))
                        union = (anchors[b, 0] * anchors[b, 1] +
                                 wh[0] * wh[1] - inter)
                        iou = inter / max(union, 1e-10)
                        if iou > best_iou:
                            best, best_iou = b, iou
                    cls = int(np.argmax(labels[i, y, x, 5:]))
                    gts[i].append((y, x, best, box, cls))
        else:
            for y in range(S):
                for x in range(S):
                    for b in range(B):
                        if labels[i, y, x, b, 0] != 1:
                            continue
                        box = labels[i, y, x, b, 1:5] / cfg.image_size
                        cls = int(np.argmax(labels[i, y, x, b, 5:]))
                        gts[i].append((y, x, b, box, cls))

    owner = np.zeros((batch, S, S, B))
    coord = obj = 0.0
    cls_loss = 0.0
    # decode every slot
    dec = np.zeros((batch, S, S, B, 4))
    for y in range(S):
        for x in range(S):
            for b in range(B):
                t = slots[:, y, x, b]
                dec[:, y, x, b, 0] = (np_sigmoid(t[:, 0]) + x) / S
                dec[:, y, x, b, 1] = (np_sigmoid(t[:, 1]) + y) / S
                dec[:, y, x, b, 2] = anchors[b, 0] * np.exp(
                    np.clip(t[:, 2], -8, 8)) / S
                dec[:, y, x, b, 3] = anchors[b, 1] * np.exp(
                    np.clip(t[:, 3], -8, 8)) / S

    for i in range(batch):
        for (y, x, b, box, cls) in gts[i]:
            owner[i, y, x, b] = 1
            t = slots[i, y, x, b]
            wh_cells = np.maximum(box[2:4] * S, 1e-6)
            d = ((np_sigmoid(t[0]) - (box[0] * S - x)) ** 2 +
                 (np_sigmoid(t[1]) - (box[1] * S - y)) ** 2 +
                 (t[2] - np.log(wh_cells[0] / anchors[b, 0])) ** 2 +
                 (t[3] - np.log(wh_cells[1] / anchors[b, 1])) ** 2)
            if cfg.v2_coord_scale:
                d *= 2.0 - box[2] * box[3]
            coord += cfg.lambda_coord * d
            iou = np_iou_cxcywh(dec[i, y, x, b], np.asarray(box))
            obj += (np_sigmoid(t[4]) - iou) ** 2
            p = np.exp(t[5:] - t[5:].max())
            p = p / p.sum()
            cls_loss += -np.log(max(p[cls], 1e-30))

    noobj = 0.0
    burnin = 0.0
    seen = None if step is None else step * batch
    burnin_on = (seen is not None and cfg.v2_prior_weight > 0 and
                 seen < cfg.v2_burnin_samples)
    for i in range(batch):
        gt_boxes = np.asarray([g[3] for g in gts[i]]).reshape(-1, 4)
        for y in range(S):
            for x in range(S):
                for b in range(B):
                    if owner[i, y, x, b]:
                        continue
                    t = slots[i, y, x, b]
                    if burnin_on:
                        burnin += cfg.v2_prior_weight * (
                            (np_sigmoid(t[0]) - 0.5) ** 2 +
                            (np_sigmoid(t[1]) - 0.5) ** 2 +
                            t[2] ** 2 + t[3] ** 2)
                    if cfg.v2_ignore_iou < 1.0 and len(gt_boxes):
                        best = max(float(np_iou_cxcywh(
                            dec[i, y, x, b], g)) for g in gt_boxes)
                        if best > cfg.v2_ignore_iou:
                            continue
                    noobj += cfg.lambda_noobj * np_sigmoid(t[4]) ** 2
    terms = {"coord_loss": coord / batch, "object_loss": obj / batch,
             "noobject_loss": noobj / batch, "class_loss": cls_loss / batch,
             "burnin_loss": burnin / batch}
    return sum(terms.values()), terms
