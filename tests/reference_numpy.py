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
