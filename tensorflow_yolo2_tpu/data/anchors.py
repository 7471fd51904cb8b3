"""YOLO9000 "dimension clusters": k-means anchor priors with IoU distance.

The YOLOv2 paper replaces hand-picked anchor boxes with priors learned by
running k-means on the training-set bounding boxes under the distance
d(box, centroid) = 1 − IoU(box, centroid) (shape-only, boxes centered).
The reference never implements anchors at all (SURVEY caveat); the classic
priors in ``config.CLASSIC_VOC_ANCHORS`` are the paper's published VOC
clusters. This module computes dataset-specific priors the same way —
``pascal_train_darknet --anchors kmeans`` — and persists them next to the
snapshots (``anchors.json`` in the checkpoint dir) so detect/eval serve
with the exact priors the head was trained against.

Determinism: initialization picks k boxes at evenly spaced quantiles of
the area-sorted unique shapes (no RNG), assignment ties resolve to the
lowest centroid index, and centroids update to the member mean — repeat
runs on the same dataset produce bit-identical priors.
"""

from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET

import numpy as np

ANCHORS_FILE = "anchors.json"


def _shape_iou(wh: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Pairwise shape-only IoU of boxes (N, 2) vs centroids (K, 2)."""
    inter = (np.minimum(wh[:, None, 0], centroids[None, :, 0]) *
             np.minimum(wh[:, None, 1], centroids[None, :, 1]))
    union = (wh[:, None, 0] * wh[:, None, 1] +
             centroids[None, :, 0] * centroids[None, :, 1] - inter)
    return inter / np.maximum(union, 1e-10)


def iou_kmeans(wh: np.ndarray, k: int, iters: int = 100
               ) -> tuple[np.ndarray, float]:
    """Cluster (N, 2) box shapes into k priors under 1−IoU distance.

    Returns (priors sorted by area ascending, mean best-IoU of the boxes
    against the final priors — the paper's "Avg IoU" quality figure).
    """
    wh = np.asarray(wh, np.float64).reshape(-1, 2)
    wh = wh[(wh > 0).all(axis=1)]
    if wh.shape[0] == 0:
        raise ValueError("no positive-size boxes to cluster")
    if wh.shape[0] < k:
        # degenerate tiny dataset: tile what we have
        reps = int(np.ceil(k / wh.shape[0]))
        wh = np.tile(wh, (reps, 1))

    # deterministic init: unique shapes sorted by area, evenly spaced
    uniq = np.unique(wh, axis=0)
    order = np.argsort(uniq[:, 0] * uniq[:, 1], kind="stable")
    idx = np.linspace(0, len(order) - 1, k).round().astype(int)
    centroids = uniq[order[idx]].copy()
    # quantile picks can coincide on small datasets; nudge duplicates so
    # every cluster starts distinct
    for i in range(1, k):
        while any(np.array_equal(centroids[i], centroids[j])
                  for j in range(i)):
            centroids[i] = centroids[i] * (1.0 + 1e-3 * (i + 1))

    assign = None
    for _ in range(iters):
        iou = _shape_iou(wh, centroids)
        new_assign = np.argmax(iou, axis=1)
        if assign is not None and np.array_equal(new_assign, assign):
            break
        assign = new_assign
        # empty clusters reseed to successively worst-covered boxes; the
        # coverage ranking is computed once against the pre-update
        # centroids, but each reseed consumes a distinct box so two empty
        # clusters in the same iteration can never collapse onto one
        reseed_order = iter(np.argsort(np.max(iou, axis=1), kind="stable"))
        for j in range(k):
            members = wh[assign == j]
            if members.shape[0]:
                centroids[j] = members.mean(axis=0)
            else:
                centroids[j] = wh[next(reseed_order)]
    area_order = np.argsort(centroids[:, 0] * centroids[:, 1],
                            kind="stable")
    centroids = centroids[area_order]
    avg_iou = float(np.mean(np.max(_shape_iou(wh, centroids), axis=1)))
    return centroids.astype(np.float32), avg_iou


def collect_voc_wh_cells(data_path: str, image_set: str, S: int,
                         image_size: int) -> np.ndarray:
    """All ground-truth (w, h) in grid-cell units for a VOC image set.

    Mirrors the resized-space corner math of data.voc.PascalVOC.
    load_annotation (reference pascal_voc.py:125-165) but reads only the
    XML size tag — no image decode — so clustering a full VOC split is
    cheap. Falls back to cv2 when the size tag is absent/zero.
    """
    txtname = os.path.join(data_path, "ImageSets", "Main",
                           image_set + ".txt")
    with open(txtname) as f:
        image_index = [x.strip() for x in f if x.strip()]
    out = []
    for index in image_index:
        xml = os.path.join(data_path, "Annotations", index + ".xml")
        tree = ET.parse(xml)
        size = tree.find("size")
        w = h = 0
        if size is not None:
            # findtext tolerates a missing <width>/<height> child (the
            # w<=0 cv2 fallback below then handles it)
            w = int(float(size.findtext("width") or 0))
            h = int(float(size.findtext("height") or 0))
        if w <= 0 or h <= 0:
            import cv2
            im = cv2.imread(os.path.join(data_path, "JPEGImages",
                                         index + ".jpg"))
            if im is None:
                continue
            h, w = im.shape[:2]
        w_ratio = float(image_size) / w
        h_ratio = float(image_size) / h
        for obj in tree.findall("object"):
            bbox = obj.find("bndbox")
            x1 = max(min((float(bbox.find("xmin").text) - 1) * w_ratio,
                         image_size - 1), 0)
            y1 = max(min((float(bbox.find("ymin").text) - 1) * h_ratio,
                         image_size - 1), 0)
            x2 = max(min((float(bbox.find("xmax").text) - 1) * w_ratio,
                         image_size - 1), 0)
            y2 = max(min((float(bbox.find("ymax").text) - 1) * h_ratio,
                         image_size - 1), 0)
            bw = (x2 - x1) * S / image_size
            bh = (y2 - y1) * S / image_size
            if bw > 0 and bh > 0:
                out.append((bw, bh))
    return np.asarray(out, np.float32).reshape(-1, 2)


def save_anchors(ckpt_dir: str, anchors, S: int) -> str:
    """Persist priors (grid-cell units at grid size S) next to snapshots."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, ANCHORS_FILE)
    payload = {"S": int(S),
               "anchors": [[float(w), float(h)] for w, h in anchors]}
    with open(path, "w") as f:
        json.dump(payload, f)
    return path


def persist_anchors(ckpt_dir: str, anchors, S: int,
                    has_snapshots: bool) -> str | None:
    """:func:`save_anchors`, guarded against silently re-priring old runs.

    ``anchors.json`` is shared by every snapshot in ``ckpt_dir``
    (v2_config_for_snapshot decodes all of them with it). Overwriting it
    when the dir already holds snapshots trained against *different*
    priors would make their eval/detect decode wrong boxes with no error
    — so when ``has_snapshots`` and the effective stored priors (the
    file, or the classic fallback older runs decode with) differ from
    ``anchors``, this refuses with an actionable error instead of
    writing. Matching priors skip the rewrite entirely, so an
    interrupted run can never corrupt a populated dir.
    """
    from tensorflow_yolo2_tpu.config import yolo_v2_config
    new = np.asarray([[float(w), float(h)] for w, h in anchors])
    stored = load_anchors(ckpt_dir, S)
    if has_snapshots:
        effective = (stored if stored is not None
                     else yolo_v2_config(int(S) * 32).anchors)
        effective = np.asarray(effective, np.float64).reshape(-1, 2)
        if (effective.shape != new.shape
                or not np.allclose(effective, new, rtol=1e-5, atol=1e-6)):
            raise SystemExit(
                f"{ckpt_dir} already contains snapshots trained against "
                f"different anchor priors ({effective.tolist()} vs this "
                f"run's {new.tolist()}). Retraining here would silently "
                "re-prior their decode. Move/delete the old snapshots or "
                "train under a different run root (TFY2_ROOT).")
        if stored is not None:
            return None  # identical priors already persisted
    return save_anchors(ckpt_dir, anchors, S)


def v2_config_for_snapshot(network_name: str = "darknet19_v2",
                           imdb_name: str = "voc_2007",
                           image_size: int = 224, paths=None,
                           external_weights: bool = False):
    """Anchor-head config matching a snapshot dir's persisted priors.

    Serving/eval must decode with the exact anchors the head was trained
    against; training writes them to ``anchors.json`` in the checkpoint
    dir (pascal_train_darknet). Falls back to the classic VOC priors
    when none are persisted (pre-existing snapshots).

    ``external_weights=True`` (serving ``--tf-checkpoint`` imports)
    skips the local-snapshot-dir lookup entirely — a stale anchors.json
    from an unrelated local training run must not re-prior an imported
    checkpoint; such checkpoints decode with the classic priors. The
    lookup is also a pure read: no checkpoint directories are created
    as a side effect."""
    from tensorflow_yolo2_tpu.config import Paths, yolo_v2_config
    paths = paths or Paths()
    S = image_size // 32
    stored = None
    if not external_weights:
        # plain join, not Paths.ckpts_dir — reading must not mkdir
        ckpt_dir = os.path.join(paths.ckpts, network_name, imdb_name)
        stored = load_anchors(ckpt_dir, S)
    return yolo_v2_config(image_size, anchors=stored)


def load_anchors(ckpt_dir: str, S: int) -> tuple[tuple[float, float], ...] | None:
    """Priors from ``anchors.json`` rescaled to grid size S, or None.

    Anchors are stored in cell units at their training grid; like
    YoloConfig.at_scale they rescale linearly with S (constant as image
    fractions), so a multiscale-trained snapshot serves at any k·32
    resolution with consistent priors.
    """
    path = os.path.join(ckpt_dir, ANCHORS_FILE)
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        payload = json.load(f)
    factor = S / float(payload["S"])
    return tuple((w * factor, h * factor) for w, h in payload["anchors"])
