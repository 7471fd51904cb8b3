"""Preprocessing factory — per-model input pipelines.

Capability of reference src/slim_dir/preprocessing/ (inception, vgg,
cifarnet, lenet variants selected by model name via
preprocessing_factory.py:31-75): host-side numpy/cv2 functions keyed by
model name, with distinct train (augmenting) and eval variants. The
darknet/yolo models use the reference's own convention ((x/255)*2-1 BGR
warp-resize, data.augment).
"""

from __future__ import annotations

import random
from typing import Callable

import cv2
import numpy as np

from tensorflow_yolo2_tpu.data.augment import AugmentConfig, augment_image

# ImageNet RGB means (vgg_preprocessing.py convention, 0-255 scale).
_VGG_MEANS = np.array([123.68, 116.78, 103.94], np.float32)


def _vgg(image: np.ndarray, size: int, train: bool,
         rng: random.Random) -> np.ndarray:
    """Aspect-preserving resize (short side ∈ [256, 512] train / 256 eval
    at size=224, scaling with size as 8/7·size..16/7·size) → random/center
    crop → RGB mean subtraction."""
    h, w = image.shape[:2]
    short = (rng.randint(size * 8 // 7, size * 16 // 7) if train
             else size * 8 // 7)
    scale = short / min(h, w)
    image = cv2.resize(image, (max(size, int(w * scale)),
                               max(size, int(h * scale))))
    h, w = image.shape[:2]
    if train:
        top = rng.randint(0, h - size)
        left = rng.randint(0, w - size)
        if rng.random() < 0.5:
            image = image[:, ::-1]
    else:
        top, left = (h - size) // 2, (w - size) // 2
    crop = image[top:top + size, left:left + size]
    rgb = cv2.cvtColor(crop, cv2.COLOR_BGR2RGB).astype(np.float32)
    return rgb - _VGG_MEANS


def _inception(image: np.ndarray, size: int, train: bool,
               rng: random.Random) -> np.ndarray:
    """Random crop (area 65-100%) + flip + brightness/saturation jitter,
    scaled to [-1, 1] (inception_preprocessing capability)."""
    h, w = image.shape[:2]
    if train:
        area = rng.uniform(0.65, 1.0)
        ch = max(8, int(h * np.sqrt(area)))
        cw = max(8, int(w * np.sqrt(area)))
        top = rng.randint(0, h - ch) if h > ch else 0
        left = rng.randint(0, w - cw) if w > cw else 0
        image = image[top:top + ch, left:left + cw]
        if rng.random() < 0.5:
            image = image[:, ::-1]
    image = cv2.resize(image, (size, size))
    rgb = cv2.cvtColor(image, cv2.COLOR_BGR2RGB).astype(np.float32)
    out = rgb / 255.0 * 2.0 - 1.0
    if train:
        out = np.clip(out + rng.uniform(-0.1, 0.1), -1.0, 1.0)
    return out


def _darknet(image: np.ndarray, size: int, train: bool,
             rng: random.Random) -> np.ndarray:
    """The repo's own convention: BGR warp-resize, [-1, 1], reference aug
    suite when training (pascal_voc.py:60-67 + ilsvrc aug)."""
    if train:
        return augment_image(image, AugmentConfig(image_size=size), rng)
    image = cv2.resize(image, (size, size)).astype(np.float32)
    return image / 255.0 * 2.0 - 1.0


def crop_or_pad(image: np.ndarray, size: int) -> np.ndarray:
    """Center crop-or-zero-pad to size×size (tf.image
    resize_image_with_crop_or_pad semantics: symmetric floor offsets)."""
    h, w = image.shape[:2]
    if h > size:
        top = (h - size) // 2
        image = image[top:top + size]
    if w > size:
        left = (w - size) // 2
        image = image[:, left:left + size]
    h, w = image.shape[:2]
    if h < size or w < size:
        pt, pl = (size - h) // 2, (size - w) // 2
        pad = [(pt, size - h - pt), (pl, size - w - pl)]
        pad += [(0, 0)] * (image.ndim - 2)
        image = np.pad(image, pad)
    return image


def _standardize(image: np.ndarray) -> np.ndarray:
    """tf.image.per_image_standardization: (x - mean) / adjusted_stddev,
    adjusted_stddev = max(stddev, 1/sqrt(num_elements))."""
    image = image.astype(np.float32)
    std = max(float(image.std()), 1.0 / np.sqrt(image.size))
    return (image - image.mean()) / std


def _lenet(image: np.ndarray, size: int, train: bool,
           rng: random.Random) -> np.ndarray:
    """lenet: crop-or-pad + (x-128)/128, identical train/eval
    (lenet_preprocessing.py:39-44 — no distortions, no flip)."""
    del train, rng
    image = crop_or_pad(image.astype(np.float32), size)
    return (image - 128.0) / 128.0


def _cifarnet(image: np.ndarray, size: int, train: bool,
              rng: random.Random) -> np.ndarray:
    """cifarnet: train = pad 4 → random crop → random flip → random
    brightness (±63) → random contrast (0.2-1.8) → per-image
    standardization (cifarnet_preprocessing.py:30-70); eval =
    crop-or-pad + standardization (:73-96)."""
    image = image.astype(np.float32)
    if train:
        image = np.pad(image, [(4, 4), (4, 4)] + [(0, 0)] * (image.ndim - 2))
        h, w = image.shape[:2]
        top = rng.randint(0, max(h - size, 0))
        left = rng.randint(0, max(w - size, 0))
        image = image[top:top + size, left:left + size]
        image = crop_or_pad(image, size)  # inputs smaller than size-8
        if rng.random() < 0.5:
            image = image[:, ::-1]
        image = image + rng.uniform(-63.0, 63.0)
        # tf.image.random_contrast: per-channel (x - mean_c)*factor + mean_c
        factor = rng.uniform(0.2, 1.8)
        mean_c = image.mean(axis=(0, 1), keepdims=True)
        image = (image - mean_c) * factor + mean_c
    else:
        image = crop_or_pad(image, size)
    return _standardize(image)


_FAMILIES: dict[str, Callable] = {}
for _name in ("vgg", "vgg_a", "vgg_16", "vgg_19", "resnet_v1_50",
              "resnet_v1_101", "resnet_v1_152", "resnet_v1_200", "resnet50",
              # preprocessing_factory.py:59-61 maps resnet_v2 to vgg too
              "resnet_v2_50", "resnet_v2_101", "resnet_v2_152",
              "resnet_v2_200"):
    _FAMILIES[_name] = _vgg  # slim maps resnets to vgg preprocessing (:56-61)
for _name in ("inception", "inception_v1", "inception_v2", "inception_v3",
              "inception_v4", "inception_resnet_v2", "alexnet_v2",
              "overfeat"):
    _FAMILIES[_name] = _inception
for _name in ("darknet19", "darknet19_detection", "yolo1"):
    _FAMILIES[_name] = _darknet
_FAMILIES["lenet"] = _lenet
_FAMILIES["cifarnet"] = _cifarnet


def get_preprocessing(name: str, is_training: bool = False,
                      image_size: int = 224, seed: int = 0) -> Callable:
    """fn(BGR uint8 image) → float32 (image_size, image_size, 3)."""
    if name not in _FAMILIES:
        raise ValueError(f"Preprocessing name [{name}] was not recognized")
    fam = _FAMILIES[name]
    rng = random.Random(seed)

    def preprocess(image: np.ndarray) -> np.ndarray:
        return fam(image, image_size, is_training, rng)

    return preprocess
