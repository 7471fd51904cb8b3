"""ctypes loader for the native host-runtime kernels (native/tfy2_native.cc).

The reference delegates its host hot path to TensorFlow's C++ kernels
(image resize, queue runners); this framework's equivalent native layer is
built on demand with the system ``g++`` and loaded via ctypes — no
pybind11 / build-system dependency. Every wrapper has a numpy/cv2
fallback, so the framework is fully functional without a toolchain;
``TFY2_NATIVE=0`` disables the native path outright.

The native resize replicates OpenCV INTER_LINEAR's 8U scalar fixed-point
arithmetic exactly (verified against an independent numpy port in
tests/test_native.py). cv2 wheels dispatch resize to Intel IPP, whose
rounding differs from OpenCV's own scalar path by one 8-bit level on
~0.3% of pixels — so native vs cv2 output agrees within one intensity
level; normalize is bit-identical.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "tfy2_native.cc")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(_SRC), "build")
    os.makedirs(d, exist_ok=True)
    return d


def _compile() -> Optional[str]:
    so = os.path.join(_build_dir(), "libtfy2_native.so")
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(_SRC)):
        return so
    base = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            _SRC, "-o", so]
    # Prefer the libjpeg-backed build (fused JPEG decode fast path); fall
    # back to the plain build on hosts without the jpeg dev package.
    with_jpeg = base[:-2] + ["-DTFY2_WITH_JPEG"] + base[-2:] + ["-ljpeg"]
    for cmd in (with_jpeg, base):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return so
        except Exception:
            continue
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("TFY2_NATIVE", "1") == "0":
            return None
        if not os.path.exists(_SRC):
            return None
        so = _compile()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.tfy2_resize_normalize.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.tfy2_resize_normalize.restype = None
        lib.tfy2_normalize.argtypes = [u8p, f32p, ctypes.c_int64]
        lib.tfy2_normalize.restype = None
        lib.tfy2_label_grid.argtypes = [
            f32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, f32p]
        lib.tfy2_label_grid.restype = None
        lib.tfy2_nms.argtypes = [
            f32p, f32p, i32p, ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, i32p]
        lib.tfy2_nms.restype = ctypes.c_int
        lib.tfy2_has_jpeg.argtypes = []
        lib.tfy2_has_jpeg.restype = ctypes.c_int
        lib.tfy2_jpeg_resize_normalize.argtypes = [
            u8p, ctypes.c_int64, f32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.tfy2_jpeg_resize_normalize.restype = ctypes.c_int
        lib.tfy2_resize_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.tfy2_resize_u8.restype = None
        lib.tfy2_jpeg_resize_u8.argtypes = [
            u8p, ctypes.c_int64, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.tfy2_jpeg_resize_u8.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    """True when the native library is (or can be) built and loaded."""
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def resize_normalize(image: np.ndarray, height: int, width: int,
                     swap_rb: bool = False,
                     hflip: bool = False) -> Optional[np.ndarray]:
    """Fused bilinear resize + channel swap + flip + [-1,1] normalize.

    ``image`` is uint8 HWC with 3 channels. Returns float32
    (height, width, 3), or None when the native library is unavailable
    (callers fall back to the cv2 path — both produce identical pixels).
    """
    lib = _load()
    if lib is None or image.ndim != 3 or image.shape[2] != 3 \
            or image.dtype != np.uint8:
        return None
    image = np.ascontiguousarray(image)
    out = np.empty((height, width, 3), np.float32)
    lib.tfy2_resize_normalize(
        _ptr(image, ctypes.c_uint8), image.shape[0], image.shape[1],
        _ptr(out, ctypes.c_float), height, width,
        int(swap_rb), int(hflip))
    return out


def resize_u8(image: np.ndarray, height: int, width: int,
              swap_rb: bool = False,
              hflip: bool = False) -> Optional[np.ndarray]:
    """Bilinear resize + swap + flip with raw uint8 output (no normalize).

    Same fixed-point arithmetic as :func:`resize_normalize` before the
    [-1,1] step — the device-normalize serving path ships this uint8
    tensor to the chip (4x fewer host↔device bytes) and the chip applies
    (x/255)*2-1 on-device, bit-identical to the float path.
    """
    lib = _load()
    if lib is None or image.ndim != 3 or image.shape[2] != 3 \
            or image.dtype != np.uint8:
        return None
    image = np.ascontiguousarray(image)
    out = np.empty((height, width, 3), np.uint8)
    lib.tfy2_resize_u8(
        _ptr(image, ctypes.c_uint8), image.shape[0], image.shape[1],
        _ptr(out, ctypes.c_uint8), height, width,
        int(swap_rb), int(hflip))
    return out


def normalize(image: np.ndarray) -> Optional[np.ndarray]:
    """uint8 → float32 [-1,1], single fused pass."""
    lib = _load()
    if lib is None or image.dtype != np.uint8:
        return None
    image = np.ascontiguousarray(image)
    out = np.empty(image.shape, np.float32)
    lib.tfy2_normalize(_ptr(image, ctypes.c_uint8),
                       _ptr(out, ctypes.c_float), image.size)
    return out


def jpeg_available() -> bool:
    """True when the native library was built against libjpeg."""
    lib = _load()
    return lib is not None and bool(lib.tfy2_has_jpeg())


def jpeg_resize_normalize(jpeg_bytes: bytes, height: int, width: int,
                          swap_rb: bool = False, hflip: bool = False,
                          fast_scale: bool = True) -> Optional[np.ndarray]:
    """Fused JPEG decode + bilinear resize + [-1,1] normalize.

    ``fast_scale=True`` decodes at the smallest M/8 DCT scale covering the
    target (≥4× less decode work on typical camera/ILSVRC sources) before
    the exact cv2-arithmetic bilinear pass; ``False`` decodes at full
    resolution (byte-identical input to the cv2 path for baseline JPEGs).
    swap_rb=False emits BGR (cv2.imread convention), True emits RGB.
    Returns float32 (height, width, 3), or None when the native library
    lacks libjpeg or the buffer is not decodable (callers fall back to
    cv2).
    """
    lib = _load()
    if lib is None or not lib.tfy2_has_jpeg():
        return None
    buf = np.frombuffer(jpeg_bytes, np.uint8)
    out = np.empty((height, width, 3), np.float32)
    rc = lib.tfy2_jpeg_resize_normalize(
        _ptr(buf, ctypes.c_uint8), buf.size, _ptr(out, ctypes.c_float),
        height, width, int(swap_rb), int(hflip), int(fast_scale))
    if rc != 0:
        return None
    return out


def jpeg_resize_u8(jpeg_bytes: bytes, height: int, width: int,
                   swap_rb: bool = False, hflip: bool = False,
                   fast_scale: bool = True) -> Optional[np.ndarray]:
    """:func:`jpeg_resize_normalize` with raw uint8 output (no normalize)
    for the device-normalize serving path. Returns uint8
    (height, width, 3) or None (caller falls back)."""
    lib = _load()
    if lib is None or not lib.tfy2_has_jpeg():
        return None
    buf = np.frombuffer(jpeg_bytes, np.uint8)
    out = np.empty((height, width, 3), np.uint8)
    rc = lib.tfy2_jpeg_resize_u8(
        _ptr(buf, ctypes.c_uint8), buf.size, _ptr(out, ctypes.c_uint8),
        height, width, int(swap_rb), int(hflip), int(fast_scale))
    if rc != 0:
        return None
    return out


def label_grid(boxes_xyxy: np.ndarray, classes: np.ndarray, S: int,
               num_class: int, image_size: float) -> Optional[np.ndarray]:
    """VOC boxes (resized-pixel x1y1x2y2) → (S, S, 5+C) YOLO label grid
    with the reference's first-object-wins cell assignment."""
    lib = _load()
    if lib is None:
        return None
    boxes_xyxy = np.ascontiguousarray(boxes_xyxy, np.float32)
    classes = np.ascontiguousarray(classes, np.int32)
    grid = np.zeros((S, S, 5 + num_class), np.float32)
    lib.tfy2_label_grid(
        _ptr(boxes_xyxy, ctypes.c_float), _ptr(classes, ctypes.c_int32),
        int(boxes_xyxy.shape[0]), S, num_class, float(image_size),
        _ptr(grid, ctypes.c_float))
    return grid


def nms(boxes: np.ndarray, scores: np.ndarray, classes: np.ndarray,
        iou_thresh: float = 0.5, class_aware: bool = True,
        score_thresh: float = 0.0,
        max_keep: int = 128) -> Optional[np.ndarray]:
    """Greedy NMS on host; returns kept indices (score-descending), or
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    classes = np.ascontiguousarray(classes, np.int32)
    keep = np.empty(max_keep, np.int32)
    n = lib.tfy2_nms(
        _ptr(boxes, ctypes.c_float), _ptr(scores, ctypes.c_float),
        _ptr(classes, ctypes.c_int32), int(boxes.shape[0]),
        float(iou_thresh), int(class_aware), float(score_thresh),
        int(max_keep), _ptr(keep, ctypes.c_int32))
    return keep[:n].copy()
