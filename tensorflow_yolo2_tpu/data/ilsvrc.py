"""ILSVRC classification dataset (ImageNet-scale loader).

Capability of reference src/img_dataset/ilsvrc2017_cls_multithread.py: the
1000-class train/val lists (train_cls.txt + per-class dirs, val labels from
XML), pickle caching, the full augmentation suite, and — crucially — the
parallel prefetch machinery. The reference hand-rolls 10 child processes
with paired multiprocessing.Queues, shared readiness flags, and interleaved
refill scheduling (:119-318); here that entire protocol is replaced by
``data.prefetch.PrefetchLoader`` (a thread pool + bounded queue feeding a
device double-buffer), which provides the same steady-state pipelining with
none of the bespoke synchronization.

Also covers the scipy variant's knobs (ilsvrc_cls_multithread_scipy.py):
pad/center-crop resize policy and ±ε random-sign noise augmentation.
"""

from __future__ import annotations

import os
import pickle
import random
import threading
import xml.etree.ElementTree as ET

import cv2
import numpy as np

from tensorflow_yolo2_tpu.config import Paths
from tensorflow_yolo2_tpu.data.augment import (
    AugmentConfig,
    augment_image,
    augment_image_u8,
    image_read as aug_image_read,
    image_read_u8 as aug_image_read_u8,
    normalize,
)


def _pad_center_resize(image: np.ndarray, size: int) -> np.ndarray:
    """Aspect-preserving resize + center pad (the scipy variant's policy,
    ilsvrc_cls_multithread_scipy.py:340-362) instead of warp-resize."""
    h, w = image.shape[:2]
    scale = size / float(max(h, w))
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    resized = cv2.resize(image, (nw, nh))
    out = np.zeros((size, size, 3), dtype=image.dtype)
    top, left = (size - nh) // 2, (size - nw) // 2
    out[top:top + nh, left:left + nw] = resized
    return out


class IlsvrcCls:
    """ILSVRC CLS-LOC imdb with the uniform (get/classes/num_class/epoch/
    total_batch) interface."""

    def __init__(self, image_set: str, batch_size: int = 48,
                 image_size: int = 224, data_aug: bool = False,
                 rgb: bool = False, resize_policy: str = "warp",
                 random_noise: bool = False, rebuild: bool = False,
                 paths: Paths | None = None, data_path: str | None = None,
                 seed: int = 0, preprocess_name: str | None = None,
                 uint8: bool = False):
        assert image_set in ("train", "val")
        assert resize_policy in ("warp", "pad")
        self.name = "ilsvrc_2017_cls"
        self.paths = paths or Paths()
        self.data_path = data_path or self.paths.ilsvrc
        self.image_set = image_set
        self.batch_size = batch_size
        self.image_size = image_size
        self.data_aug = data_aug
        self.rgb = rgb
        self.resize_policy = resize_policy
        self.rebuild = rebuild
        self.aug_cfg = AugmentConfig(image_size=image_size,
                                     random_noise=random_noise)
        # uint8-transfer mode: get() ships raw uint8 pixels and the trainer
        # normalizes on device (train.trainer.device_normalize). Host-side
        # float transforms can't emit uint8 — combine explicitly instead of
        # silently changing the training distribution.
        assert not (uint8 and random_noise), \
            "random_noise is host-side float arithmetic; use float transfer"
        assert not (uint8 and preprocess_name), \
            "slim preprocessing fns emit normalized float; use float transfer"
        self.uint8 = uint8
        self.rng = random.Random(seed)
        # slim preprocessing_name path (train_image_classifier.py:428-435):
        # a per-model factory fn replaces the native read/augment convention
        self._preprocess = None
        if preprocess_name:
            from tensorflow_yolo2_tpu.data.preprocessing import (
                get_preprocessing,
            )

            self._preprocess = get_preprocessing(
                preprocess_name, is_training=image_set == "train" and data_aug,
                image_size=image_size, seed=seed)
        self.cursor = 0
        self.epoch = 1
        self._lock = threading.Lock()

        if not os.path.isdir(self.data_path):
            raise FileNotFoundError(
                f"ILSVRC path does not exist: {self.data_path}")
        self.load_classes()
        self.gt_labels = self.prepare()

    # -- listings (reference :49-92, :208-219) -------------------------------

    def load_classes(self) -> None:
        train_dir = os.path.join(self.data_path, "Data", "CLS-LOC", "train")
        self.classes = tuple(sorted(os.listdir(train_dir)))
        self.num_class = len(self.classes)
        self.class_to_ind = {c: i for i, c in enumerate(self.classes)}

    def prepare(self) -> list[tuple[str, int]]:
        cache_file = os.path.join(
            self.paths.cache, f"ilsvrc_{self.image_set}_gt_labels.pkl")
        if os.path.isfile(cache_file) and not self.rebuild:
            with open(cache_file, "rb") as f:
                gt = pickle.load(f)
            self.rng.shuffle(gt)
            return gt

        os.makedirs(self.paths.cache, exist_ok=True)
        gt: list[tuple[str, int]] = []
        if self.image_set == "train":
            # ImageSets/CLS-LOC/train_cls.txt lines: "<synset>/<imgid> <idx>"
            listing = os.path.join(self.data_path, "ImageSets", "CLS-LOC",
                                   "train_cls.txt")
            root = os.path.join(self.data_path, "Data", "CLS-LOC", "train")
            with open(listing) as f:
                for line in f:
                    rel = line.split()[0]
                    synset = rel.split("/")[0]
                    gt.append((os.path.join(root, rel + ".JPEG"),
                               self.class_to_ind[synset]))
        else:
            # val labels come from per-image XML annotations
            ann_dir = os.path.join(self.data_path, "Annotations", "CLS-LOC",
                                   "val")
            root = os.path.join(self.data_path, "Data", "CLS-LOC", "val")
            for fn in sorted(os.listdir(ann_dir)):
                if not fn.endswith(".xml"):
                    continue
                tree = ET.parse(os.path.join(ann_dir, fn))
                obj = tree.find("object")
                name = obj.find("name") if obj is not None else None
                if name is None or name.text not in self.class_to_ind:
                    print(f"ilsvrc val: skipping {fn} (no usable "
                          "<object><name> synset)")
                    continue
                imgid = fn[:-4]
                gt.append((os.path.join(root, imgid + ".JPEG"),
                           self.class_to_ind[name.text]))
        with open(cache_file, "wb") as f:
            pickle.dump(gt, f)
        self.rng.shuffle(gt)
        return gt

    # -- batching -------------------------------------------------------------

    @property
    def total_batch(self) -> int:
        return max(1, len(self.gt_labels) // self.batch_size)

    def image_read(self, path: str) -> np.ndarray:
        if self._preprocess is not None:
            image = cv2.imread(path)
            if image is None:
                raise FileNotFoundError(path)
            return self._preprocess(image)
        if not self.data_aug and self.resize_policy != "pad":
            # plain warp path: the fused native resize+swap(+normalize)
            # kernel (one pass instead of read→convert→resize→normalize)
            if self.uint8:
                return aug_image_read_u8(path, self.image_size, rgb=self.rgb)
            return aug_image_read(path, self.image_size, rgb=self.rgb)
        image = cv2.imread(path)
        if image is None:
            raise FileNotFoundError(path)
        if self.rgb:
            image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        if self.data_aug:
            if self.uint8:
                return augment_image_u8(image, self.aug_cfg, self.rng,
                                        rgb=self.rgb)
            return augment_image(image, self.aug_cfg, self.rng,
                                 rgb=self.rgb)
        padded = _pad_center_resize(image, self.image_size)
        return padded if self.uint8 else normalize(padded)

    def _next_entries(self, n: int) -> list[tuple[str, int]]:
        with self._lock:
            out = []
            for _ in range(n):
                out.append(self.gt_labels[self.cursor])
                self.cursor += 1
                if self.cursor >= len(self.gt_labels):
                    self.rng.shuffle(self.gt_labels)
                    self.cursor = 0
                    self.epoch += 1
            return out

    def get(self) -> tuple[np.ndarray, np.ndarray]:
        """Thread-safe: selection locked, decode/augment outside."""
        entries = self._next_entries(self.batch_size)
        images = np.zeros(
            (self.batch_size, self.image_size, self.image_size, 3),
            np.uint8 if self.uint8 else np.float32)
        labels = np.zeros(self.batch_size, np.int32)
        for count, (path, cls) in enumerate(entries):
            images[count] = self.image_read(path)
            labels[count] = cls
        return images, labels
