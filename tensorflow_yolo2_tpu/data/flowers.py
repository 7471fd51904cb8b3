"""TF_flowers 5-class classification dataset.

Capability of reference src/img_dataset/TF_flowers.py: images under
class-named directories, a ``val_split`` fraction carving a validation
list, ``get_train()``/``get_val()`` batch getters with the shared
augmentation suite, and the uniform imdb interface. The small size makes
it the fast end-to-end smoke fixture (SURVEY §2 item 11).
"""

from __future__ import annotations

import os
import random
import threading

import numpy as np

from tensorflow_yolo2_tpu.config import Paths
from tensorflow_yolo2_tpu.data.augment import (
    AugmentConfig,
    image_read,
    read_and_augment,
)


class TFFlowers:
    """Flowers imdb: dir-per-class layout (reference TF_flowers.py:43-78)."""

    def __init__(self, batch_size: int = 16, image_size: int = 224,
                 val_split: float = 0.2, data_aug: bool = True,
                 paths: Paths | None = None, data_path: str | None = None,
                 seed: int = 0, preprocess_name: str | None = None):
        self.name = "tf_flowers"
        self.paths = paths or Paths()
        self.data_path = data_path or self.paths.flowers
        self.batch_size = batch_size
        self.image_size = image_size
        self.data_aug = data_aug
        self.aug_cfg = AugmentConfig(image_size=image_size)
        self.rng = random.Random(seed)
        # slim preprocessing_name path: per-model factory preprocessing
        # replaces the native augment/resize convention (the reference's
        # finetune_inception_*_on_flowers.sh recipes train flowers with
        # inception preprocessing, train_image_classifier.py:428-435)
        self._pp_train = self._pp_eval = None
        if preprocess_name:
            from tensorflow_yolo2_tpu.data.preprocessing import (
                get_preprocessing,
            )

            self._pp_train = get_preprocessing(
                preprocess_name, is_training=True, image_size=image_size,
                seed=seed)
            self._pp_eval = get_preprocessing(
                preprocess_name, is_training=False, image_size=image_size,
                seed=seed)
        self.epoch = 1
        self.train_cursor = 0
        self.val_cursor = 0
        self._lock = threading.Lock()

        if not os.path.isdir(self.data_path):
            raise FileNotFoundError(
                f"TF_flowers path does not exist: {self.data_path}")
        self.classes = tuple(sorted(
            d for d in os.listdir(self.data_path)
            if os.path.isdir(os.path.join(self.data_path, d))))
        self.num_class = len(self.classes)
        self.class_to_ind = {c: i for i, c in enumerate(self.classes)}

        entries = []
        for cls in self.classes:
            cdir = os.path.join(self.data_path, cls)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith((".jpg", ".jpeg", ".png")):
                    entries.append((os.path.join(cdir, fn),
                                    self.class_to_ind[cls]))
        shuffle_rng = random.Random(seed)
        shuffle_rng.shuffle(entries)
        n_val = int(len(entries) * val_split)
        self.val_list = entries[:n_val]
        self.train_list = entries[n_val:]

    @property
    def total_batch(self) -> int:
        return max(1, len(self.train_list) // self.batch_size)

    def _fetch(self, entries: list, cursor_attr: str, augment: bool):
        # selection (cursor advance + shuffles) under the lock, decode
        # outside — thread-safe for the prefetch worker pool
        with self._lock:
            cursor = getattr(self, cursor_attr)
            picked = []
            for _ in range(self.batch_size):
                picked.append(entries[cursor])
                cursor += 1
                if cursor >= len(entries):
                    # only the train stream reshuffles on wrap: with
                    # val_split=0 get_val serves train_list, and shuffling
                    # it here would corrupt the in-progress train epoch
                    if cursor_attr == "train_cursor":
                        self.rng.shuffle(entries)
                        self.epoch += 1
                    cursor = 0
            setattr(self, cursor_attr, cursor)
        images = np.zeros(
            (self.batch_size, self.image_size, self.image_size, 3), np.float32)
        labels = np.zeros(self.batch_size, np.int32)
        for count, (path, cls) in enumerate(picked):
            if self._pp_train is not None:
                import cv2

                raw = cv2.imread(path)
                fn = self._pp_train if augment else self._pp_eval
                images[count] = fn(raw)
            elif augment and self.data_aug:
                images[count] = read_and_augment(path, self.aug_cfg, self.rng)
            else:
                images[count] = image_read(path, self.image_size)
            labels[count] = cls
        return images, labels

    def get_train(self):
        return self._fetch(self.train_list, "train_cursor", augment=True)

    def get_val(self):
        return self._fetch(self.val_list or self.train_list, "val_cursor",
                           augment=False)

    # uniform imdb interface
    def get(self):
        return self.get_train()
