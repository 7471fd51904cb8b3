"""Host-side image IO + augmentation suite.

Capability of reference src/img_dataset/ilsvrc2017_cls_multithread.py:320-415
(image_read + data aug) and ilsvrc_cls_multithread_scipy.py:364-369 (random
sign noise): flip / 0-359° rotation / HSV hue+saturation shift / gamma
exposure shift / random crop from a short-side∈[image, upbound] rescale
(75% chance) / ±ε uniform-sign noise — with the same probability structure
so training curves are comparable.

All augmentation runs on the host in numpy/cv2 (it is branchy, byte-level
work the TPU is bad at); the normalized float batches are handed to the
device by data.prefetch overlapped with the step.

Reference pixel conventions preserved: images are read with cv2 in BGR
unless ``rgb=True`` (pascal_voc.py:60-67 reads BGR; ilsvrc loader has an
RGB flag) and scaled to [-1, 1] as ``(x/255)*2 - 1``.
"""

from __future__ import annotations

import os as _os
import random
from dataclasses import dataclass, replace as _replace

import cv2
import numpy as np

from tensorflow_yolo2_tpu.utils import native


@dataclass
class AugmentConfig:
    image_size: int = 224
    rand_crop_upbound: int = 292  # reference config.py:35
    flip: bool = True
    rotate: bool = True
    color_pert: bool = True
    exposure_shift: bool = True
    random_crop: bool = True
    # adversarial-robustness noise (ilsvrc_cls_multithread_scipy.py:364-369):
    # epsilon chosen uniformly from {4, 8, 12, 16}/255 * 2, sign per pixel.
    random_noise: bool = False


def normalize(image: np.ndarray) -> np.ndarray:
    """uint8 → float32 in [-1, 1] (reference pascal_voc.py:63-64)."""
    return (image.astype(np.float32) / 255.0) * 2.0 - 1.0


def image_read(path: str, image_size: int, rgb: bool = False,
               flipped: bool = False,
               fast_jpeg: bool | None = None) -> np.ndarray:
    """Plain read+warp-resize+normalize (reference pascal_voc.py:60-67).

    The resize+swap+flip+normalize chain runs as ONE pass in the native
    C++ kernel when available (utils/native.py; replicates cv2's scalar
    INTER_LINEAR arithmetic, within one uint8 level of IPP-backed cv2 —
    parity-tested), else falls back to cv2+numpy.

    ``fast_jpeg`` (default: env ``TFY2_FAST_JPEG=1``) additionally fuses
    the JPEG *decode* into the native pass with DCT-domain scaled decode —
    sources much larger than ``image_size`` decode at 1/2..1/8 scale
    before the exact bilinear resize. Opt-in because scaled decode is not
    pixel-identical to cv2's full decode (and EXIF rotation is ignored);
    detection/classification quality is unaffected.
    """
    if fast_jpeg is None:
        fast_jpeg = _os.environ.get("TFY2_FAST_JPEG", "0") == "1"
    if fast_jpeg and path.lower().endswith((".jpg", ".jpeg")):
        try:
            with open(path, "rb") as f:
                data = f.read()
        except OSError:
            raise FileNotFoundError(path)
        fused = native.jpeg_resize_normalize(
            data, image_size, image_size, swap_rb=rgb, hflip=flipped,
            fast_scale=True)
        if fused is not None:
            return fused
    image = cv2.imread(path)
    if image is None:
        raise FileNotFoundError(path)
    fused = native.resize_normalize(image, image_size, image_size,
                                    swap_rb=rgb, hflip=flipped)
    if fused is not None:
        return fused
    if rgb:
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
    image = cv2.resize(image, (image_size, image_size))
    image = normalize(image)
    if flipped:
        image = image[:, ::-1, :]
    return image


def image_read_u8(path: str, image_size: int, rgb: bool = False,
                  flipped: bool = False,
                  fast_jpeg: bool | None = None) -> np.ndarray:
    """:func:`image_read` without the final normalize — returns uint8.

    The device-normalize serving path: the host ships the uint8 tensor
    (4x fewer host↔device bytes than float32) and the chip applies
    (x/255)*2-1 on-device as its first fused op (make_detect_fn accepts
    uint8 batches), bit-identical to the float path since both quantize
    through the same fixed-point bilinear value.
    """
    if fast_jpeg is None:
        fast_jpeg = _os.environ.get("TFY2_FAST_JPEG", "0") == "1"
    if fast_jpeg and path.lower().endswith((".jpg", ".jpeg")):
        try:
            with open(path, "rb") as f:
                data = f.read()
        except OSError:
            raise FileNotFoundError(path)
        fused = native.jpeg_resize_u8(
            data, image_size, image_size, swap_rb=rgb, hflip=flipped,
            fast_scale=True)
        if fused is not None:
            return fused
    image = cv2.imread(path)
    if image is None:
        raise FileNotFoundError(path)
    fused = native.resize_u8(image, image_size, image_size,
                             swap_rb=rgb, hflip=flipped)
    if fused is not None:
        return fused
    if rgb:
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
    image = cv2.resize(image, (image_size, image_size))
    if flipped:
        image = image[:, ::-1, :]
    return image


def augment_image(image: np.ndarray, cfg: AugmentConfig,
                  rng: random.Random, rgb: bool = False) -> np.ndarray:
    """Apply the reference augmentation distribution to a uint8 image
    (BGR by default; set ``rgb=True`` for RGB inputs so the HSV color
    perturbation uses the right channel order); returns a float32
    (image_size, image_size, 3) in [-1, 1].

    The ±ε sign-noise (ilsvrc_cls_multithread_scipy.py:364-369) is float
    arithmetic, so it lives here: the uint8 ops delegate to
    :func:`augment_image_u8` with ``random_noise`` stripped (the u8 helper
    rejects it), then the noise draws happen AFTER every u8 draw — the two
    paths therefore still see identical u8 augmentation sequences for the
    same seed."""
    u8_cfg = _replace(cfg, random_noise=False) if cfg.random_noise else cfg
    out = normalize(augment_image_u8(image, u8_cfg, rng, rgb=rgb))

    if cfg.random_noise:
        eps = rng.choice([4, 8, 12, 16]) / 255.0 * 2.0
        # seed the array draw from the caller's rng: reproducible per
        # dataset seed, and no shared global-RNG state across workers
        np_rng = np.random.RandomState(rng.randrange(2**32))
        sign = np.sign(np_rng.uniform(-1, 1, out.shape)).astype(np.float32)
        out = np.clip(out + eps * sign, -1.0, 1.0)

    return out


def augment_image_u8(image: np.ndarray, cfg: AugmentConfig,
                     rng: random.Random, rgb: bool = False) -> np.ndarray:
    """:func:`augment_image` without the final normalize — returns the
    augmented uint8 (image_size, image_size, 3) image.

    The uint8-transfer training path (the training twin of
    :func:`image_read_u8`): every augmentation op is uint8-native, so the
    host can ship the raw bytes (4x fewer host↔device bytes than float32)
    and the device applies (x/255)*2-1 as its first fused op
    (train.trainer device-normalizes uint8 batches) — identical values to
    the float path since both normalize the same uint8 pixels.
    ``random_noise`` is host-side float arithmetic and is not supported
    here (the float path keeps it).

    Draw order from ``rng`` matches :func:`augment_image` exactly, so the
    two paths see the same augmentation sequence for the same seed."""
    assert not cfg.random_noise, \
        "random_noise is float-valued; use augment_image (float transfer)"
    size = cfg.image_size

    do_flip = cfg.flip and bool(rng.getrandbits(1))
    rotate_deg = rng.randint(0, 359) if cfg.rotate else 0
    # 75% chance of random crop; otherwise plain warp-resize
    crop_chance = rng.randint(0, 3) if cfg.random_crop else 0
    do_color = cfg.color_pert and bool(rng.getrandbits(1))
    do_exposure = cfg.exposure_shift and bool(rng.getrandbits(1))

    if do_flip:
        image = image[:, ::-1, :]

    if cfg.rotate:
        rows, cols, _ = image.shape
        M = cv2.getRotationMatrix2D((cols / 2, rows / 2), rotate_deg, 1)
        image = cv2.warpAffine(image, M, (cols, rows))

    if do_color:
        # uint8 HSV arithmetic with cv2's wraparound semantics, ±[0, 10]
        to_hsv = cv2.COLOR_RGB2HSV if rgb else cv2.COLOR_BGR2HSV
        from_hsv = cv2.COLOR_HSV2RGB if rgb else cv2.COLOR_HSV2BGR
        hsv = cv2.cvtColor(image, to_hsv)
        hue = rng.randint(0, 10)
        sat = rng.randint(0, 10)
        if bool(rng.getrandbits(1)):
            hsv[:, :, 0] += np.uint8(hue)
        else:
            hsv[:, :, 0] -= np.uint8(hue)
        if bool(rng.getrandbits(1)):
            hsv[:, :, 1] += np.uint8(sat)
        else:
            hsv[:, :, 1] -= np.uint8(sat)
        image = cv2.cvtColor(hsv, from_hsv)

    if do_exposure:
        gamma = rng.uniform(1, 2) if bool(rng.getrandbits(1)) else rng.uniform(0.5, 1)
        image = (((image / 255.0) ** (1.0 / gamma)) * 255).astype(np.uint8)

    too_small = False
    if crop_chance > 0:
        rows, cols, _ = image.shape
        # keep the reference's 292/224 crop-headroom ratio when the target
        # size exceeds the configured upbound (e.g. 299² or 448² inputs) —
        # randint(size, upbound) must never see an empty range
        upbound = max(cfg.rand_crop_upbound,
                      int(size * cfg.rand_crop_upbound / 224.0))
        short_len = rng.randint(size, upbound)
        if cols <= rows:
            scaled_cols = short_len
            scaled_rows = int(rows * short_len / float(cols))
        else:
            scaled_rows = short_len
            scaled_cols = int(cols * short_len / float(rows))
        if scaled_cols < size or scaled_rows < size:
            too_small = True
        else:
            image = cv2.resize(image, (scaled_cols, scaled_rows))
            co = rng.randint(0, scaled_cols - size)
            ro = rng.randint(0, scaled_rows - size)
            image = image[ro:ro + size, co:co + size]

    if crop_chance == 0 or too_small:
        image = cv2.resize(image, (size, size))

    return image


def read_and_augment(path: str, cfg: AugmentConfig, rng: random.Random,
                     rgb: bool = False) -> np.ndarray:
    image = cv2.imread(path)
    if image is None:
        raise FileNotFoundError(path)
    if rgb:
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
    return augment_image(image, cfg, rng, rgb=rgb)
