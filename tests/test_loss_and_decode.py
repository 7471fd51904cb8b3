"""Golden tests: jitted loss/decode/NMS vs independent numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_yolo2_tpu.config import YoloConfig, yolo_grid_offset
from tensorflow_yolo2_tpu.losses import yolo_loss
from tensorflow_yolo2_tpu.ops import box_iou, decode_grid, decode_grid_v2, nms_fixed
from tests import reference_numpy as ref

CFG = YoloConfig()


def make_labels(rng, batch, cfg=CFG, n_objects=3):
    """Random ground-truth grids in the VOC label format."""
    labels = np.zeros((batch, cfg.S, cfg.S, 5 + cfg.num_class), np.float32)
    for b in range(batch):
        for _ in range(n_objects):
            cx, cy = rng.uniform(10, cfg.image_size - 10, 2)
            w, h = rng.uniform(15, 100, 2)
            xi = int(cx * cfg.S / cfg.image_size)
            yi = int(cy * cfg.S / cfg.image_size)
            if labels[b, yi, xi, 0] == 1:
                continue
            labels[b, yi, xi, 0] = 1
            labels[b, yi, xi, 1:5] = (cx, cy, w, h)
            labels[b, yi, xi, 5 + rng.randint(cfg.num_class)] = 1
    return labels


def test_grid_offset_matches_reference_construction():
    # The reference builds OFFSET as range(S)*S*B → (B,S,S) → (1,2,0)
    # (src/config.py:40-42); check ours has identical semantics.
    off = yolo_grid_offset(7, 2)
    assert off.shape == (7, 7, 2)
    want = np.transpose(
        np.reshape(np.array(list(range(7)) * 7 * 2, np.float32), (2, 7, 7)),
        (1, 2, 0))
    np.testing.assert_array_equal(off, want)


def test_iou_matches_numpy(rng):
    a = rng.uniform(0, 1, (4, 7, 7, 2, 4)).astype(np.float32)
    b = rng.uniform(0, 1, (4, 7, 7, 2, 4)).astype(np.float32)
    got = jax.jit(box_iou)(a, b)
    np.testing.assert_allclose(got, ref.np_iou_cxcywh(a, b), rtol=1e-5)


def test_iou_exact_cases():
    a = jnp.array([[0.5, 0.5, 0.2, 0.2]])
    np.testing.assert_allclose(box_iou(a, a), [1.0], atol=1e-6)
    b = jnp.array([[0.9, 0.9, 0.1, 0.1]])
    np.testing.assert_allclose(box_iou(a, b), [0.0], atol=1e-6)
    # Half-overlap along x: boxes (0.4..0.6) vs (0.5..0.7) → inter 0.1*0.2,
    # union 0.04+0.04-0.02
    c = jnp.array([[0.6, 0.5, 0.2, 0.2]])
    np.testing.assert_allclose(box_iou(a, c), [0.02 / 0.06], rtol=1e-5)


def test_yolo_loss_matches_numpy(rng):
    batch = 4
    net = rng.normal(0, 0.5, (batch, CFG.S, CFG.S, CFG.cell_channels)).astype(
        np.float32)
    labels = make_labels(rng, batch)
    total, aux = jax.jit(lambda n, l: yolo_loss(n, l, CFG))(net, labels)
    want_total, want = ref.np_yolo_loss(
        net, labels, CFG.S, CFG.B, CFG.num_class, CFG.image_size)
    np.testing.assert_allclose(total, want_total, rtol=1e-4)
    np.testing.assert_allclose(aux.class_loss, want["class_loss"], rtol=1e-4)
    np.testing.assert_allclose(aux.coord_loss, want["coord_loss"], rtol=1e-4)
    np.testing.assert_allclose(aux.object_loss, want["object_loss"], rtol=1e-4)
    np.testing.assert_allclose(aux.noobject_loss, want["noobject_loss"],
                               rtol=1e-4)
    np.testing.assert_allclose(aux.ious, want["ious"], rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(aux.object_mask, want["object_mask"])


def test_yolo_loss_zero_for_perfect_prediction():
    """A prediction that exactly encodes the GT with conf=IoU=1 has loss 0."""
    cfg = CFG
    labels = np.zeros((1, cfg.S, cfg.S, 25), np.float32)
    cx, cy, w, h = 100.0, 60.0, 50.0, 40.0
    xi, yi = int(cx * cfg.S / cfg.image_size), int(cy * cfg.S / cfg.image_size)
    labels[0, yi, xi, 0] = 1
    labels[0, yi, xi, 1:5] = (cx, cy, w, h)
    labels[0, yi, xi, 5 + 3] = 1

    net = np.zeros((1, cfg.S, cfg.S, cfg.cell_channels), np.float32)
    net[0, yi, xi, 3] = 1.0  # class one-hot
    # both box slots encode the gt exactly; conf = 1 = IoU
    tx = cx / cfg.image_size * cfg.S - xi
    ty = cy / cfg.image_size * cfg.S - yi
    for b in range(cfg.B):
        net[0, yi, xi, cfg.num_class + b] = 1.0
        base = cfg.num_class + cfg.B + 4 * b
        net[0, yi, xi, base:base + 4] = (
            tx, ty, np.sqrt(w / cfg.image_size), np.sqrt(h / cfg.image_size))
    total, aux = yolo_loss(jnp.asarray(net), jnp.asarray(labels), cfg)
    assert float(total) < 1e-8
    # tie in IoU → both slots responsible (reference >= semantics)
    assert float(aux.object_mask[0, yi, xi].sum()) == 2.0


def test_loss_gradients_flow_and_are_finite(rng):
    net = rng.normal(0, 0.5, (2, CFG.S, CFG.S, CFG.cell_channels)).astype(
        np.float32)
    labels = make_labels(rng, 2)
    g = jax.grad(lambda n: yolo_loss(n, labels, CFG)[0])(jnp.asarray(net))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_decode_matches_numpy(rng):
    net = rng.normal(0, 0.6, (CFG.S, CFG.S, CFG.cell_channels)).astype(
        np.float32)
    # force a few confident cells
    net[2, 3, CFG.num_class] = 0.9
    net[5, 1, CFG.num_class + 1] = 0.8
    dets = jax.jit(lambda n: decode_grid(n, CFG, 0.5))(net)
    got = [(b[0], b[1], b[2], b[3], s, c)
           for b, s, c in zip(np.asarray(dets.boxes), np.asarray(dets.scores),
                              np.asarray(dets.classes)) if s > 0]
    want = ref.np_decode(net, CFG.S, CFG.B, CFG.num_class, 0.5)
    assert len(got) == len(want)
    got = sorted(got, key=lambda d: -d[4])
    want = sorted(want, key=lambda d: -d[4])
    for g, w in zip(got, want):
        np.testing.assert_allclose(g[:5], w[:5], rtol=1e-5, atol=1e-6)
        assert g[5] == w[5]


def test_decode_v2_produces_valid_boxes(rng):
    cfg = YoloConfig(per_slot_classes=True,
                     anchors=((1.0, 1.5), (2.5, 1.0)))
    net = rng.normal(0, 1.0, (cfg.S, cfg.S, cfg.cell_channels)).astype(
        np.float32)
    dets = jax.jit(lambda n: decode_grid_v2(n, cfg, 0.0))(net)
    boxes = np.asarray(dets.boxes)
    assert boxes.shape == (cfg.S * cfg.S * cfg.B, 4)
    # centers of all boxes must lie inside the image
    cx = (boxes[:, 0] + boxes[:, 2]) / 2
    cy = (boxes[:, 1] + boxes[:, 3]) / 2
    assert ((cx >= 0) & (cx <= 1) & (cy >= 0) & (cy <= 1)).all()
    assert (np.asarray(dets.scores) >= 0).all()
    assert (np.asarray(dets.scores) <= 1).all()


@pytest.mark.parametrize("class_aware", [True, False])
def test_nms_matches_numpy_greedy(rng, class_aware):
    n = 40
    boxes = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.4, (n, 2)).astype(np.float32)
    corners = np.concatenate([boxes - wh / 2, boxes + wh / 2], axis=1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    scores[rng.rand(n) < 0.3] = 0.0  # some below-threshold slots
    classes = rng.randint(0, 3, n).astype(np.int32)

    from tensorflow_yolo2_tpu.ops.boxes import Detections
    out = jax.jit(lambda d: nms_fixed(d, 0.5, max_outputs=n,
                                      class_aware=class_aware))(
        Detections(jnp.asarray(corners), jnp.asarray(scores),
                   jnp.asarray(classes)))
    got = {(round(float(s), 5)) for s in np.asarray(out.scores) if s > 0}

    dets = [(c[0], c[1], c[2], c[3], s, k)
            for c, s, k in zip(corners, scores, classes) if s > 0]
    want = {round(float(d[4]), 5) for d in ref.np_nms(dets, 0.5, class_aware)}
    assert got == want
