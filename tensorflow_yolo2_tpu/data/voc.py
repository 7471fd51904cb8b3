"""Pascal VOC2007 detection dataset.

Capability of reference src/img_dataset/pascal_voc.py: VOC XML annotations
→ per-image (S, S, 5+C) label grids with the exact reference semantics:

- boxes converted to 0-based pixel coords in the *resized* (image_size²)
  space via per-axis ratios (pascal_voc.py:131-156);
- one object per cell, first object wins (:159-163);
- label layout ``[responsible, cx, cy, w, h, one-hot class]``;
- pickle cache ``cache/pascal_<set>_gt_labels.pkl`` (:88-123);
- optional precomputed horizontally-flipped copies (:69-86);
- ``get()`` returns sequential (images, labels) batches with epoch-end
  reshuffle (:42-58); images are BGR, warp-resized, [-1, 1].

The duck-typed interface (``.get()``, ``.classes``, ``.num_class``,
``.epoch``, ``.total_batch``, ``.name``) is shared by every dataset in
``data`` so trainers are dataset-agnostic (SURVEY §2 item 7).
"""

from __future__ import annotations

import copy
import os
import pickle
import threading
import xml.etree.ElementTree as ET

import cv2
import numpy as np

from tensorflow_yolo2_tpu.config import VOC_CLASSES, Paths, YoloConfig
from tensorflow_yolo2_tpu.data.augment import image_read, image_read_u8
from tensorflow_yolo2_tpu.utils import native


def build_label_grid(corners_xyxy: np.ndarray, cls_inds: np.ndarray,
                     S: int, num_class: int,
                     image_size: float) -> np.ndarray:
    """Resized-space x1y1x2y2 boxes → (S, S, 5+num_class) YOLO grid with
    the reference's cell math (pascal_voc.py:156-163): cxcywh stored in
    resized pixels, one object per cell, first object wins.

    Runs in the native C++ kernel when available (utils/native.py),
    else in the numpy loop below — both paths are parity-tested.
    """
    fast = native.label_grid(corners_xyxy, cls_inds, S, num_class,
                             image_size)
    if fast is not None:
        return fast
    label = np.zeros((S, S, 5 + num_class), np.float32)
    for (x1, y1, x2, y2), cls_ind in zip(corners_xyxy, cls_inds):
        boxes = [(x2 + x1) / 2.0, (y2 + y1) / 2.0, x2 - x1, y2 - y1]
        x_ind = int(boxes[0] * S / image_size)
        y_ind = int(boxes[1] * S / image_size)
        if label[y_ind, x_ind, 0] == 1:  # first object wins
            continue
        label[y_ind, x_ind, 0] = 1
        label[y_ind, x_ind, 1:5] = boxes
        label[y_ind, x_ind, 5 + cls_ind] = 1
    return label


def build_label_grid_v2(corners_xyxy: np.ndarray, cls_inds: np.ndarray,
                        S: int, B: int, anchors, num_class: int,
                        image_size: float) -> np.ndarray:
    """Resized-space x1y1x2y2 boxes → (S, S, B, 5+num_class) per-SLOT grid.

    The anchor-mode label layout: each object is assigned to its center
    cell's best shape-IoU-matching FREE anchor slot (next-best if taken;
    dropped only when all B slots of the cell are full), so one cell can
    own up to B objects — the capability the reference's first-wins
    builder caps (pascal_voc.py:159-163). Ties resolve to the lowest
    anchor index, matching the in-loss argmax of losses.yolo_v2.
    ``anchors`` are (B, 2) w/h priors in grid-cell units; assignment is
    invariant under YoloConfig.at_scale rescaling (shape IoU is scale
    free), so multiscale buckets agree on ownership.
    """
    anchors = np.asarray(anchors, np.float32).reshape(B, 2)
    label = np.zeros((S, S, B, 5 + num_class), np.float32)
    for (x1, y1, x2, y2), cls_ind in zip(corners_xyxy, cls_inds):
        boxes = [(x2 + x1) / 2.0, (y2 + y1) / 2.0, x2 - x1, y2 - y1]
        x_ind = int(boxes[0] * S / image_size)
        y_ind = int(boxes[1] * S / image_size)
        wh = np.array([boxes[2], boxes[3]], np.float32) * S / image_size
        inter = (np.minimum(anchors[:, 0], wh[0]) *
                 np.minimum(anchors[:, 1], wh[1]))
        union = anchors[:, 0] * anchors[:, 1] + wh[0] * wh[1] - inter
        shape_iou = inter / np.maximum(union, 1e-10)
        for b in np.argsort(-shape_iou, kind="stable"):
            if label[y_ind, x_ind, b, 0] == 0:
                label[y_ind, x_ind, b, 0] = 1
                label[y_ind, x_ind, b, 1:5] = boxes
                label[y_ind, x_ind, b, 5 + cls_ind] = 1
                break
    return label


class PascalVOC:
    """VOC2007 imdb with YOLO grid labels."""

    def __init__(self, image_set: str, batch_size: int = 48,
                 yolo: YoloConfig = YoloConfig(), rebuild: bool = False,
                 flipped: bool = False, paths: Paths | None = None,
                 data_path: str | None = None, uint8: bool = False):
        self.name = "voc_2007"
        self.paths = paths or Paths()
        self.data_path = data_path or os.path.join(self.paths.pascal, "VOC2007")
        self.cache_path = self.paths.cache
        self.batch_size = batch_size
        self.yolo = yolo
        self.image_size = yolo.image_size
        self.cell_size = yolo.S
        self.classes = VOC_CLASSES
        self.num_class = len(self.classes)
        self.class_to_ind = {c: i for i, c in enumerate(self.classes)}
        # anchor-head configs get the per-slot multi-object label grid
        # (S, S, B, 5+C) — see build_label_grid_v2
        self.per_slot = bool(yolo.per_slot_classes and yolo.anchors)
        self.image_set = image_set
        self.rebuild = rebuild
        self.flipped = flipped
        # uint8-transfer mode: get() ships raw uint8 pixels (4x fewer
        # host↔device bytes); the trainer normalizes on device
        # (train.trainer.device_normalize) — same values as the float path
        self.uint8 = uint8
        self.cursor = 0
        self.epoch = 1
        self.gt_labels: list[dict] = []
        # cursor/shuffle bookkeeping is locked; image decode happens
        # outside the lock so prefetch workers parallelize (data.prefetch)
        self._lock = threading.Lock()
        if not os.path.exists(self.data_path):
            raise FileNotFoundError(
                f"VOCdevkit path does not exist: {self.data_path}")
        self.prepare()

    # -- batching ------------------------------------------------------------

    @property
    def total_batch(self) -> int:
        return max(1, len(self.gt_labels) // self.batch_size)

    def _next_entries(self, n: int) -> list[dict]:
        with self._lock:
            out = []
            for _ in range(n):
                out.append(self.gt_labels[self.cursor])
                self.cursor += 1
                if self.cursor >= len(self.gt_labels):
                    np.random.shuffle(self.gt_labels)
                    self.cursor = 0
                    self.epoch += 1
            return out

    def get(self) -> tuple[np.ndarray, np.ndarray]:
        """Next (images, labels) batch; reshuffles at epoch end
        (reference pascal_voc.py:42-58). Thread-safe: selection is
        locked, decode is not."""
        entries = self._next_entries(self.batch_size)
        images = np.zeros(
            (self.batch_size, self.image_size, self.image_size, 3),
            np.uint8 if self.uint8 else np.float32)
        grid_shape = ((self.cell_size, self.cell_size, self.yolo.B,
                       5 + self.num_class) if self.per_slot else
                      (self.cell_size, self.cell_size, 5 + self.num_class))
        labels = np.zeros((self.batch_size,) + grid_shape, np.float32)
        read = image_read_u8 if self.uint8 else image_read
        for count, entry in enumerate(entries):
            images[count] = read(entry["imname"], self.image_size,
                                 flipped=entry["flipped"])
            labels[count] = entry["label"]
        return images, labels

    # -- label preparation ---------------------------------------------------

    def prepare(self):
        gt_labels = self.load_labels()
        if self.flipped:
            # Precomputed flipped copies (reference pascal_voc.py:69-86):
            # mirror the grid along x and reflect the stored cx pixel coord.
            gt_flip = copy.deepcopy(gt_labels)
            for entry in gt_flip:
                entry["flipped"] = True
                # mirror the grid along x; works for both the (S, S, 5+C)
                # and the per-slot (S, S, B, 5+C) layouts (anchor slot
                # assignment is shape-only, so it survives the flip)
                entry["label"] = entry["label"][:, ::-1]
                resp = entry["label"][..., 0] == 1
                entry["label"][..., 1] = np.where(
                    resp, self.image_size - 1 - entry["label"][..., 1],
                    entry["label"][..., 1])
            gt_labels = gt_labels + gt_flip
        np.random.shuffle(gt_labels)
        self.gt_labels = gt_labels
        return gt_labels

    def load_labels(self) -> list[dict]:
        # label grids depend on (image_size, S): qualify the cache name for
        # non-default scales (multiscale training) so grids never collide;
        # the default keeps the reference filename (pascal_voc.py:90)
        scale_tag = ("" if (self.image_size, self.cell_size) == (224, 7)
                     else f"_{self.image_size}x{self.cell_size}")
        if self.per_slot:
            scale_tag += f"_slots{self.yolo.B}"
            # slot assignment depends on the anchor priors: qualify the
            # cache for non-classic anchors (k-means dimension clusters)
            # so grids built against different priors never collide
            from tensorflow_yolo2_tpu.config import yolo_v2_config
            classic = yolo_v2_config(self.image_size).anchors
            if tuple(self.yolo.anchors) != classic:
                import hashlib
                digest = hashlib.sha1(
                    np.asarray(self.yolo.anchors,
                               np.float64).tobytes()).hexdigest()[:8]
                scale_tag += f"_a{digest}"
        cache_file = os.path.join(
            self.cache_path,
            f"pascal_{self.image_set}_gt_labels{scale_tag}.pkl")
        if os.path.isfile(cache_file) and not self.rebuild:
            with open(cache_file, "rb") as f:
                return pickle.load(f)

        os.makedirs(self.cache_path, exist_ok=True)
        txtname = os.path.join(self.data_path, "ImageSets", "Main",
                               self.image_set + ".txt")
        with open(txtname) as f:
            image_index = [x.strip() for x in f.readlines()]

        gt_labels = []
        for index in image_index:
            label, num = self.load_annotation(index)
            if num == 0:
                continue
            imname = os.path.join(self.data_path, "JPEGImages", index + ".jpg")
            gt_labels.append(
                {"imname": imname, "label": label, "flipped": False})
        with open(cache_file, "wb") as f:
            pickle.dump(gt_labels, f)
        return gt_labels

    def load_annotation(self, index: str) -> tuple[np.ndarray, int]:
        """One VOC XML → (S, S, 5+C) grid (reference pascal_voc.py:125-165)."""
        imname = os.path.join(self.data_path, "JPEGImages", index + ".jpg")
        im = cv2.imread(imname)
        if im is None:
            raise FileNotFoundError(
                f"VOC image missing or undecodable: {imname}")
        h_ratio = float(self.image_size) / im.shape[0]
        w_ratio = float(self.image_size) / im.shape[1]

        filename = os.path.join(self.data_path, "Annotations", index + ".xml")
        objs = ET.parse(filename).findall("object")
        corners = []
        cls_inds = []
        for obj in objs:
            bbox = obj.find("bndbox")
            # 0-based pixel coords in the resized space, clamped to the image
            x1 = max(min((float(bbox.find("xmin").text) - 1) * w_ratio,
                         self.image_size - 1), 0)
            y1 = max(min((float(bbox.find("ymin").text) - 1) * h_ratio,
                         self.image_size - 1), 0)
            x2 = max(min((float(bbox.find("xmax").text) - 1) * w_ratio,
                         self.image_size - 1), 0)
            y2 = max(min((float(bbox.find("ymax").text) - 1) * h_ratio,
                         self.image_size - 1), 0)
            corners.append((x1, y1, x2, y2))
            cls_inds.append(
                self.class_to_ind[obj.find("name").text.lower().strip()])
        corners_arr = np.asarray(corners, np.float32).reshape(-1, 4)
        cls_arr = np.asarray(cls_inds, np.int32)
        if self.per_slot:
            label = build_label_grid_v2(
                corners_arr, cls_arr, self.cell_size, self.yolo.B,
                self.yolo.anchors, self.num_class, float(self.image_size))
        else:
            label = build_label_grid(
                corners_arr, cls_arr, self.cell_size, self.num_class,
                float(self.image_size))
        return label, len(objs)
