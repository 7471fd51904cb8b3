"""YOLOv2 anchor-loss tests: owner selection, perfect-prediction floor,
gradient flow, decode round-trip consistency, end-to-end descent."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import YoloConfig
from tensorflow_yolo2_tpu.losses.yolo_v2 import yolo_v2_loss, yolo_v2_task
from tensorflow_yolo2_tpu.ops.boxes import decode_grid_v2

CFG = YoloConfig(S=4, B=3, num_class=5, image_size=128,
                 per_slot_classes=True,
                 anchors=((1.0, 1.0), (3.0, 1.5), (0.8, 2.5)))


def make_label(cx, cy, w, h, cls, cfg=CFG):
    labels = np.zeros((1, cfg.S, cfg.S, 5 + cfg.num_class), np.float32)
    xi = int(cx * cfg.S / cfg.image_size)
    yi = int(cy * cfg.S / cfg.image_size)
    labels[0, yi, xi, 0] = 1
    labels[0, yi, xi, 1:5] = (cx, cy, w, h)
    labels[0, yi, xi, 5 + cls] = 1
    return labels, xi, yi


def inv_sigmoid(p):
    return float(np.log(p / (1 - p)))


def test_owner_anchor_is_best_shape_match(rng):
    # a wide box (3:1.5 ratio at the scale of anchor 1) must pick anchor 1
    w = 3.0 / CFG.S * CFG.image_size
    h = 1.5 / CFG.S * CFG.image_size
    labels, xi, yi = make_label(60, 60, w, h, cls=2)
    net = rng.normal(0, 0.1, (1, CFG.S, CFG.S, CFG.cell_channels)).astype(
        np.float32)
    _, aux = yolo_v2_loss(jnp.asarray(net), jnp.asarray(labels), CFG)
    owner = np.asarray(aux.owner_mask[0, yi, xi])
    np.testing.assert_array_equal(owner, [0, 1, 0])
    assert np.asarray(aux.owner_mask).sum() == 1  # only that cell owns


def test_perfect_prediction_near_zero_loss():
    cls = 3
    # gt exactly equal to anchor 0 shape, centered in its cell
    w = 1.0 / CFG.S * CFG.image_size
    h = 1.0 / CFG.S * CFG.image_size
    cx = (1 + 0.5) / CFG.S * CFG.image_size  # center of cell x=1
    cy = (2 + 0.5) / CFG.S * CFG.image_size
    labels, xi, yi = make_label(cx, cy, w, h, cls)
    assert (xi, yi) == (1, 2)

    net = np.zeros((1, CFG.S, CFG.S, CFG.cell_channels), np.float32)
    net[..., 4::CFG.num_class + 5] = -12.0  # all conf ≈ 0 (suppressed)
    slot = np.zeros(5 + CFG.num_class, np.float32)
    slot[0] = inv_sigmoid(0.5)   # σ(tx)=0.5 → cell center
    slot[1] = inv_sigmoid(0.5)
    slot[2] = 0.0                # tw = log(gt/anchor) = log(1) = 0
    slot[3] = 0.0
    slot[4] = 12.0               # σ(conf) ≈ 1 = IoU
    slot[5 + cls] = 20.0         # class logit → CE ≈ 0
    net[0, yi, xi, :5 + CFG.num_class] = slot  # owner = anchor 0

    total, aux = yolo_v2_loss(jnp.asarray(net), jnp.asarray(labels), CFG)
    assert float(aux.coord_loss) < 1e-6
    assert float(aux.class_loss) < 1e-6
    assert float(aux.object_loss) < 1e-4
    assert float(aux.noobject_loss) < 1e-6
    assert float(aux.ious[0, yi, xi, 0]) > 0.999


def test_decode_consistency_with_loss_targets():
    """A prediction hitting the loss targets must decode back to the gt."""
    cls = 1
    cx, cy, w, h = 70.0, 44.0, 48.0, 30.0
    labels, xi, yi = make_label(cx, cy, w, h, cls)
    # construct the owner slot from the loss's target equations
    gt = np.array([cx, cy, w, h]) / CFG.image_size
    anchors = np.asarray(CFG.anchors)
    shape_iou = [min(a[0], gt[2] * CFG.S) * min(a[1], gt[3] * CFG.S) /
                 (a[0] * a[1] + gt[2] * CFG.S * gt[3] * CFG.S -
                  min(a[0], gt[2] * CFG.S) * min(a[1], gt[3] * CFG.S))
                 for a in anchors]
    owner = int(np.argmax(shape_iou))
    net = np.full((1, CFG.S, CFG.S, CFG.cell_channels), -9.0, np.float32)
    base = owner * (5 + CFG.num_class)
    net[0, yi, xi, base + 0] = inv_sigmoid(gt[0] * CFG.S - xi)
    net[0, yi, xi, base + 1] = inv_sigmoid(gt[1] * CFG.S - yi)
    net[0, yi, xi, base + 2] = np.log(gt[2] * CFG.S / anchors[owner, 0])
    net[0, yi, xi, base + 3] = np.log(gt[3] * CFG.S / anchors[owner, 1])
    net[0, yi, xi, base + 4] = 9.0
    net[0, yi, xi, base + 5 + cls] = 9.0

    total, aux = yolo_v2_loss(jnp.asarray(net), jnp.asarray(labels), CFG)
    assert float(aux.coord_loss) < 1e-6
    dets = decode_grid_v2(jnp.asarray(net[0]), CFG, object_thresh=0.5)
    k = int(np.argmax(np.asarray(dets.scores)))
    box = np.asarray(dets.boxes[k])  # corners
    np.testing.assert_allclose(
        [(box[0] + box[2]) / 2, (box[1] + box[3]) / 2,
         box[2] - box[0], box[3] - box[1]], gt, rtol=1e-4, atol=1e-5)
    assert int(dets.classes[k]) == cls


def test_gradients_finite_and_loss_descends(rng):
    labels, _, _ = make_label(60, 60, 40, 40, cls=0)
    net = jnp.asarray(rng.normal(0, 0.5,
                                 (1, CFG.S, CFG.S, CFG.cell_channels))
                      .astype(np.float32))
    loss_fn = jax.jit(lambda n: yolo_v2_loss(n, jnp.asarray(labels), CFG)[0])
    g = jax.grad(loss_fn)(net)
    assert np.isfinite(np.asarray(g)).all()
    # a few SGD steps on the raw prediction tensor must reduce the loss
    cur = net
    first = float(loss_fn(cur))
    for _ in range(25):
        cur = cur - 0.2 * jax.grad(loss_fn)(cur)
    final = float(loss_fn(cur))
    assert np.isfinite(final)
    assert final < first


def test_task_wrapper_metrics(rng):
    labels, _, _ = make_label(60, 60, 40, 40, cls=0)
    net = rng.normal(0, 0.5, (1, CFG.S, CFG.S, CFG.cell_channels)).astype(
        np.float32)
    total, metrics = yolo_v2_task(CFG)(jnp.asarray(net), jnp.asarray(labels))
    assert set(metrics) == {"loss", "class_loss", "object_loss",
                            "noobject_loss", "coord_loss", "mean_iou"}
    assert np.isfinite(float(total))


def test_task_grid_size_polymorphism(rng):
    """The task re-grids itself from the label shape: applying the S=4
    task to an S=8 batch must equal yolo_v2_loss at cfg.at_scale(8)
    (the multiscale-training contract)."""
    big = CFG.at_scale(8)
    assert big.image_size == 256
    # anchors stay constant as image fractions: cell units double
    np.testing.assert_allclose(
        np.asarray(big.anchors), np.asarray(CFG.anchors) * 2.0)
    labels, _, _ = make_label(120, 120, 80, 80, cls=2, cfg=big)
    net = rng.normal(0, 0.5, (1, big.S, big.S, big.cell_channels)).astype(
        np.float32)
    total_task, _ = yolo_v2_task(CFG)(jnp.asarray(net), jnp.asarray(labels))
    total_direct, _ = yolo_v2_loss(jnp.asarray(net), jnp.asarray(labels), big)
    np.testing.assert_allclose(float(total_task), float(total_direct),
                               rtol=1e-6)
    assert CFG.at_scale(CFG.S) is CFG
