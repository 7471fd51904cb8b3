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


# ---------------------------------------------------------------------------
# Fused JPEG decode + resize + normalize (TFY2_WITH_JPEG build)
# ---------------------------------------------------------------------------

jpeg_mark = pytest.mark.skipif(
    not native.jpeg_available(),
    reason="native library built without libjpeg")


def _smooth_image(h, w, seed=0):
    """Low-frequency content so JPEG round-trips with small error."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        128 + 100 * np.sin(xx / w * 4 + c) * np.cos(yy / h * 3 - c)
        for c in range(3)], axis=-1)
    return np.clip(base + rng.uniform(-4, 4, (h, w, 3)), 0, 255).astype(
        np.uint8)


@jpeg_mark
def test_jpeg_fullscale_matches_cv2_path(tmp_path):
    # fast_scale=False: the decoder sees the same bytes as cv2.imread
    # (both are libjpeg-turbo at default settings), then the exact
    # bilinear arithmetic — within one intensity level end-to-end
    img = _smooth_image(60, 80, seed=7)
    path = str(tmp_path / "img.jpg")
    assert cv2.imwrite(path, img)
    data = open(path, "rb").read()
    for rgb in (False, True):
        for flip in (False, True):
            got = native.jpeg_resize_normalize(
                data, 32, 32, swap_rb=rgb, hflip=flip, fast_scale=False)
            assert got is not None and got.shape == (32, 32, 3)
            want = _cv2_path(cv2.imread(path), 32, rgb=rgb, flip=flip)
            np.testing.assert_allclose(got, want, atol=LEVEL)


@jpeg_mark
def test_jpeg_fast_scale_close_to_cv2_path(tmp_path):
    # DCT-scaled decode (here 1/8-ish on a 1024->64 shrink) is not
    # pixel-identical to full decode + bilinear, but must stay visually
    # equivalent on smooth content
    img = _smooth_image(768, 1024, seed=8)
    path = str(tmp_path / "big.jpg")
    assert cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    data = open(path, "rb").read()
    got = native.jpeg_resize_normalize(data, 64, 64, fast_scale=True)
    assert got is not None
    want = _cv2_path(cv2.imread(path), 64)
    assert np.mean(np.abs(got - want)) < 0.02       # ~2.5 uint8 levels mean
    assert np.max(np.abs(got - want)) < 0.12        # ~15 levels worst pixel


@jpeg_mark
def test_jpeg_small_source_never_upscale_decodes(tmp_path):
    # target larger than the source: fast_scale must decode full-res
    # (scale capped at 8/8) and the result matches the cv2 upscale path
    img = _smooth_image(40, 52, seed=9)
    path = str(tmp_path / "small.jpg")
    assert cv2.imwrite(path, img)
    data = open(path, "rb").read()
    got = native.jpeg_resize_normalize(data, 96, 96, fast_scale=True)
    assert got is not None
    want = _cv2_path(cv2.imread(path), 96)
    np.testing.assert_allclose(got, want, atol=LEVEL)


@jpeg_mark
def test_jpeg_garbage_returns_none():
    assert native.jpeg_resize_normalize(b"not a jpeg", 32, 32) is None


@jpeg_mark
def test_image_read_fast_jpeg_path(tmp_path):
    from tensorflow_yolo2_tpu.data.augment import image_read
    img = _smooth_image(300, 400, seed=10)
    path = str(tmp_path / "img.jpg")
    assert cv2.imwrite(path, img)
    got = image_read(path, 224, fast_jpeg=True)
    want = image_read(path, 224, fast_jpeg=False)
    assert got.shape == want.shape == (224, 224, 3)
    assert np.mean(np.abs(got - want)) < 0.02
    # non-JPEG input silently uses the standard path
    png = str(tmp_path / "img.png")
    assert cv2.imwrite(png, img)
    got_png = image_read(png, 224, fast_jpeg=True)
    want_png = image_read(png, 224, fast_jpeg=False)
    np.testing.assert_allclose(got_png, want_png, atol=LEVEL)


# ---------------------------------------------------------------------------
# uint8-output variants (device-normalize serving path)
# ---------------------------------------------------------------------------


def test_resize_u8_matches_normalized_path():
    # same fixed-point bilinear value: normalize(resize_u8(x)) must be
    # bit-identical to resize_normalize(x)
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (37, 53, 3), np.uint8)
    for rgb in (False, True):
        for flip in (False, True):
            u8 = native.resize_u8(img, 24, 24, swap_rb=rgb, hflip=flip)
            assert u8 is not None and u8.dtype == np.uint8
            want = native.resize_normalize(img, 24, 24, swap_rb=rgb,
                                           hflip=flip)
            np.testing.assert_array_equal(_normalize(u8), want)


@jpeg_mark
def test_jpeg_resize_u8_matches_normalized_path(tmp_path):
    img = _smooth_image(120, 160, seed=12)
    path = str(tmp_path / "img.jpg")
    assert cv2.imwrite(path, img)
    data = open(path, "rb").read()
    for fast in (False, True):
        u8 = native.jpeg_resize_u8(data, 48, 48, fast_scale=fast)
        want = native.jpeg_resize_normalize(data, 48, 48, fast_scale=fast)
        assert u8 is not None and u8.dtype == np.uint8
        np.testing.assert_array_equal(_normalize(u8), want)
    assert native.jpeg_resize_u8(b"junk", 32, 32) is None


def test_image_read_u8_matches_image_read(tmp_path):
    from tensorflow_yolo2_tpu.data.augment import image_read, image_read_u8
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (90, 120, 3), np.uint8)
    path = str(tmp_path / "img.png")  # lossless: exercises the cv2 branch
    assert cv2.imwrite(path, img)
    for rgb in (False, True):
        for flip in (False, True):
            u8 = image_read_u8(path, 64, rgb=rgb, flipped=flip)
            f32 = image_read(path, 64, rgb=rgb, flipped=flip)
            assert u8.dtype == np.uint8
            np.testing.assert_array_equal(_normalize(u8), f32)


def test_device_normalize_matches_host_normalize():
    # the on-device (x/255)*2-1 applied by make_detect_fn to uint8 input
    # must be bit-identical to the host normalize
    import jax.numpy as jnp
    rng = np.random.RandomState(14)
    u8 = rng.randint(0, 256, (2, 8, 8, 3), np.uint8)
    dev = np.asarray(jnp.asarray(u8).astype(jnp.float32) / 255.0 * 2.0
                     - 1.0)
    np.testing.assert_array_equal(dev, _normalize(u8))


def test_detect_fn_uint8_input_matches_float():
    # make_detect_fn serves uint8 batches via on-device normalize; the
    # detections must match the host-normalized float path exactly
    import jax
    import jax.numpy as jnp
    from tensorflow_yolo2_tpu.config import YoloConfig
    from tensorflow_yolo2_tpu.entries.pascal_detect_darknet import (
        make_detect_fn,
    )
    from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector

    yolo = YoloConfig(S=2, image_size=64)
    model = Darknet19Detector(output_channels=yolo.cell_channels)
    rng = np.random.RandomState(15)
    u8 = rng.randint(0, 256, (1, 64, 64, 3), np.uint8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    detect = make_detect_fn(yolo, variables["params"],
                            variables["batch_stats"], object_thresh=0.0,
                            dtype=jnp.float32)
    want = detect(jnp.asarray(_normalize(u8)))
    got = detect(jnp.asarray(u8))
    np.testing.assert_allclose(np.asarray(got.boxes),
                               np.asarray(want.boxes), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(want.scores), atol=1e-6)
