"""Parity tests for the native C++ host kernels (native/tfy2_native.cc).

Every native kernel is checked against the Python path it accelerates:

- the fused resize+normalize replicates OpenCV INTER_LINEAR's 8U scalar
  fixed-point arithmetic — asserted BIT-EXACT against an independent
  numpy port of that arithmetic, and within one 8-bit intensity level of
  cv2.resize (cv2 wheels dispatch resize to Intel IPP, whose rounding
  differs from OpenCV's own scalar path on ~0.3% of pixels);
- uint8→[-1,1] normalize must be bit-identical to the numpy expression;
- the label-grid builder must match the reference cell math
  (pascal_voc.py:156-163) as implemented in the numpy fallback;
- host NMS must match an independent numpy greedy reference and agree
  with ops.nms.nms_fixed on kept boxes.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tensorflow_yolo2_tpu.data.voc import build_label_grid  # noqa: E402
from tensorflow_yolo2_tpu.utils import native  # noqa: E402

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")

# one uint8 intensity level in [-1, 1] units (+ float slack): the maximum
# deviation IPP-backed cv2 resize shows vs OpenCV's scalar arithmetic
LEVEL = 2.0 / 255.0 + 1e-6


def _normalize(x):
    return (x.astype(np.float32) / 255.0) * 2.0 - 1.0


def _cv2_path(img, size, rgb=False, flip=False):
    x = img
    if rgb:
        x = cv2.cvtColor(x, cv2.COLOR_BGR2RGB)
    x = cv2.resize(x, (size, size))
    x = _normalize(x)
    if flip:
        x = x[:, ::-1, :]
    return x


def _scalar_resize(src, dh, dw):
    """Numpy port of OpenCV INTER_LINEAR 8U scalar fixed-point resize
    (11-bit coefficients, int rows, (b*(row>>4))>>16 +2 >>2 rounding)."""

    def coefs(slen, dlen):
        scale = slen / dlen
        fx = ((np.arange(dlen) + 0.5) * scale - 0.5).astype(np.float32)
        sx = np.floor(fx).astype(int)
        f = fx - sx
        f[sx < 0] = 0
        sx[sx < 0] = 0
        f[sx >= slen - 1] = 1
        sx[sx >= slen - 1] = max(slen - 2, 0)
        a0 = np.rint((1 - f) * 2048).astype(np.int64)
        return sx, a0, np.rint(f * 2048).astype(np.int64)

    sh, sw = src.shape[:2]
    sx, ax0, ax1 = coefs(sw, dw)
    sy, ay0, ay1 = coefs(sh, dh)
    s = src.astype(np.int64)
    rows = (s[:, sx, :] * ax0[None, :, None]
            + s[:, np.minimum(sx + 1, sw - 1), :] * ax1[None, :, None])
    r0 = rows[sy]
    r1 = rows[np.minimum(sy + 1, sh - 1)]
    out = ((((ay0[:, None, None] * (r0 >> 4)) >> 16)
            + ((ay1[:, None, None] * (r1 >> 4)) >> 16) + 2) >> 2)
    return np.clip(out, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape,size", [
    ((37, 53), 224),    # upscale, non-integral ratio
    ((480, 640), 224),  # downscale
    ((224, 224), 224),  # identity size
    ((300, 200), 64),   # heavy downscale
    ((5, 3), 17),       # tiny source
])
def test_resize_normalize_vs_scalar_and_cv2(shape, size):
    rng = np.random.RandomState(hash(shape) % (2**31))
    img = rng.randint(0, 256, (*shape, 3), np.uint8)
    got = native.resize_normalize(img, size, size)
    assert got is not None
    # bit-exact vs the independent scalar fixed-point port
    np.testing.assert_array_equal(got, _normalize(_scalar_resize(
        img, size, size)))
    # within one intensity level of cv2 (IPP rounding differences only)
    np.testing.assert_allclose(got, _cv2_path(img, size), atol=LEVEL)


def test_resize_normalize_swap_and_flip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (97, 123, 3), np.uint8)
    got = native.resize_normalize(img, 64, 64, swap_rb=True, hflip=True)
    want = _normalize(_scalar_resize(img, 64, 64))[:, ::-1, ::-1]
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(
        got, _cv2_path(img, 64, rgb=True, flip=True), atol=LEVEL)


def test_normalize_bit_exact():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (11, 7, 3), np.uint8)
    got = native.normalize(img)
    np.testing.assert_array_equal(got, _normalize(img))
    full = np.arange(256, dtype=np.uint8)
    np.testing.assert_array_equal(native.normalize(full), _normalize(full))


def test_image_read_uses_native(tmp_path):
    # image_read output stays within one intensity level of the cv2 path
    # whichever backend runs
    from tensorflow_yolo2_tpu.data.augment import image_read
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (60, 80, 3), np.uint8)
    path = str(tmp_path / "img.png")
    cv2.imwrite(path, img)
    for rgb in (False, True):
        for flipped in (False, True):
            got = image_read(path, 32, rgb=rgb, flipped=flipped)
            want = _cv2_path(cv2.imread(path), 32, rgb=rgb, flip=flipped)
            np.testing.assert_allclose(got, want, atol=LEVEL)


def _numpy_label_grid(corners, cls_inds, S, C, image_size):
    label = np.zeros((S, S, 5 + C), np.float32)
    for (x1, y1, x2, y2), c in zip(corners, cls_inds):
        boxes = [(x2 + x1) / 2.0, (y2 + y1) / 2.0, x2 - x1, y2 - y1]
        x_ind = int(boxes[0] * S / image_size)
        y_ind = int(boxes[1] * S / image_size)
        if label[y_ind, x_ind, 0] == 1:
            continue
        label[y_ind, x_ind, 0] = 1
        label[y_ind, x_ind, 1:5] = boxes
        label[y_ind, x_ind, 5 + c] = 1
    return label


def test_label_grid_matches_numpy():
    rng = np.random.RandomState(3)
    S, C, size = 7, 20, 224.0
    for trial in range(20):
        n = rng.randint(1, 12)
        x1 = rng.uniform(0, size - 2, n)
        y1 = rng.uniform(0, size - 2, n)
        x2 = np.minimum(x1 + rng.uniform(1, 100, n), size - 1)
        y2 = np.minimum(y1 + rng.uniform(1, 100, n), size - 1)
        corners = np.stack([x1, y1, x2, y2], -1).astype(np.float32)
        cls_inds = rng.randint(0, C, n).astype(np.int32)
        got = native.label_grid(corners, cls_inds, S, C, size)
        want = _numpy_label_grid(corners, cls_inds, S, C, size)
        np.testing.assert_array_equal(got, want)
        # and the public entry point agrees
        np.testing.assert_array_equal(
            build_label_grid(corners, cls_inds, S, C, size), want)


def test_label_grid_first_wins_and_empty():
    # two boxes in the same cell: first wins (reference pascal_voc.py:159)
    corners = np.array([[10, 10, 50, 50], [12, 12, 48, 48]], np.float32)
    cls = np.array([3, 5], np.int32)
    grid = native.label_grid(corners, cls, 7, 20, 224.0)
    cell = grid[0, 0]
    assert cell[0] == 1 and cell[5 + 3] == 1 and cell[5 + 5] == 0
    empty = native.label_grid(np.zeros((0, 4), np.float32),
                              np.zeros((0,), np.int32), 7, 20, 224.0)
    assert empty.shape == (7, 7, 25) and not empty.any()


def _numpy_nms(boxes, scores, classes, iou_thresh, class_aware,
               score_thresh):
    def iou(a, b):
        ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
        ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
        ua = (max((a[2] - a[0]) * (a[3] - a[1]), 0)
              + max((b[2] - b[0]) * (b[3] - b[1]), 0) - inter)
        return inter / ua if ua > 0 else 0.0

    order = sorted(range(len(scores)), key=lambda i: -scores[i])
    alive = [True] * len(scores)
    keep = []
    for oi, i in enumerate(order):
        if not alive[oi] or scores[i] <= score_thresh:
            continue
        keep.append(i)
        for oj in range(oi + 1, len(order)):
            j = order[oj]
            if not alive[oj]:
                continue
            if class_aware and classes[i] != classes[j]:
                continue
            if iou(boxes[i], boxes[j]) > iou_thresh:
                alive[oj] = False
    return keep


@pytest.mark.parametrize("class_aware", [True, False])
def test_nms_matches_numpy(class_aware):
    rng = np.random.RandomState(4)
    for trial in range(10):
        n = 40
        xy = rng.uniform(0, 1, (n, 2))
        wh = rng.uniform(0.05, 0.4, (n, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        classes = rng.randint(0, 3, n).astype(np.int32)
        got = native.nms(boxes, scores, classes, 0.45,
                         class_aware=class_aware, score_thresh=0.1)
        want = _numpy_nms(boxes, scores, classes, 0.45, class_aware, 0.1)
        assert list(got) == want


def test_nms_agrees_with_device_nms():
    # same survivor set as the fixed-shape jax NMS (ops/nms.py)
    import jax.numpy as jnp

    from tensorflow_yolo2_tpu.ops.boxes import Detections
    from tensorflow_yolo2_tpu.ops.nms import nms_fixed
    rng = np.random.RandomState(5)
    n = 30
    xy = rng.uniform(0, 1, (n, 2))
    wh = rng.uniform(0.05, 0.4, (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0.05, 1, n).astype(np.float32)
    classes = rng.randint(0, 3, n).astype(np.int32)

    kept = native.nms(boxes, scores, classes, 0.5, class_aware=True,
                      score_thresh=0.0, max_keep=n)
    dev = nms_fixed(Detections(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.asarray(classes)), 0.5, max_outputs=n)
    dev_scores = np.asarray(dev.scores)
    got_scores = sorted(float(scores[i]) for i in kept)
    want_scores = sorted(float(s) for s in dev_scores if s > 0)
    assert len(got_scores) == len(want_scores)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-6)
