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
    # lr < 1/(λ_coord·coord_scale_max) ≈ 0.1: the (2−wh) upweighting
    # roughly doubles the coord curvature vs the unscaled loss
    for _ in range(25):
        cur = cur - 0.05 * jax.grad(loss_fn)(cur)
    final = float(loss_fn(cur))
    assert np.isfinite(final)
    assert final < first


def test_task_wrapper_metrics(rng):
    labels, _, _ = make_label(60, 60, 40, 40, cls=0)
    net = rng.normal(0, 0.5, (1, CFG.S, CFG.S, CFG.cell_channels)).astype(
        np.float32)
    total, metrics = yolo_v2_task(CFG)(jnp.asarray(net), jnp.asarray(labels))
    assert set(metrics) == {"loss", "class_loss", "object_loss",
                            "noobject_loss", "coord_loss", "burnin_loss",
                            "mean_iou"}
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


# -- YOLO9000 training stabilizers (darknet region-loss semantics) ----------


def make_slot_label(objs, cfg=CFG):
    """objs: list of (cx, cy, w, h, cls, slot) → (1, S, S, B, 5+C)."""
    labels = np.zeros((1, cfg.S, cfg.S, cfg.B, 5 + cfg.num_class),
                      np.float32)
    for cx, cy, w, h, cls, slot in objs:
        xi = int(cx * cfg.S / cfg.image_size)
        yi = int(cy * cfg.S / cfg.image_size)
        labels[0, yi, xi, slot, 0] = 1
        labels[0, yi, xi, slot, 1:5] = (cx, cy, w, h)
        labels[0, yi, xi, slot, 5 + cls] = 1
    return labels


def test_noobj_ignore_threshold_exempts_overlapping_slot():
    """A non-owner slot predicting a box right on a gt object must not be
    suppressed (best-gt IoU > v2_ignore_iou), while a far-off confident
    slot still is."""
    cls = 0
    w = 1.0 / CFG.S * CFG.image_size   # anchor-0-shaped box
    cx = (1 + 0.5) / CFG.S * CFG.image_size
    cy = (2 + 0.5) / CFG.S * CFG.image_size
    labels, xi, yi = make_label(cx, cy, w, w, cls)

    net = np.zeros((1, CFG.S, CFG.S, CFG.cell_channels), np.float32)
    net[..., 4::CFG.num_class + 5] = -12.0
    stride = 5 + CFG.num_class
    # owner is anchor 0 at (yi, xi). Park a CONFIDENT duplicate on anchor
    # 1 of the same cell, decoded to an anchor-0-shaped box at the same
    # center: σ(xy)=0.5, tw/th = log(anchor0/anchor1) → same w/h.
    a = np.asarray(CFG.anchors)
    net[0, yi, xi, stride + 2] = np.log(a[0, 0] / a[1, 0])
    net[0, yi, xi, stride + 3] = np.log(a[0, 1] / a[1, 1])
    net[0, yi, xi, stride + 4] = 12.0  # confident duplicate
    base = yolo_v2_loss(jnp.asarray(net), jnp.asarray(labels), CFG)
    # with the default 0.6 ignore threshold the duplicate is exempt
    assert float(base[1].noobject_loss) < 1e-6
    # disabling the threshold punishes it hard (σ(12)² ≈ 1 × λ_noobj)
    import dataclasses
    strict = dataclasses.replace(CFG, v2_ignore_iou=1.0)
    loss2, aux2 = yolo_v2_loss(jnp.asarray(net), jnp.asarray(labels), strict)
    assert float(aux2.noobject_loss) > 0.4
    # ...and a far-off confident slot is punished under BOTH configs
    net[0, 0, 0, stride + 4] = 12.0
    _, aux3 = yolo_v2_loss(jnp.asarray(net), jnp.asarray(labels), CFG)
    assert float(aux3.noobject_loss) > 0.4


def test_burnin_prior_loss_schedule(rng):
    """The burn-in term is active while step·batch < v2_burnin_samples,
    zero after, zero when step is None, and pulls non-owner boxes toward
    their anchor prior."""
    labels, _, _ = make_label(60, 60, 40, 40, cls=0)
    net = jnp.asarray(rng.normal(0, 0.5, (1, CFG.S, CFG.S,
                                          CFG.cell_channels))
                      .astype(np.float32))
    off = yolo_v2_loss(net, jnp.asarray(labels), CFG)[1]
    assert float(off.burnin_loss) == 0.0
    early = yolo_v2_loss(net, jnp.asarray(labels), CFG,
                         step=jnp.asarray(0))[1]
    assert float(early.burnin_loss) > 0.0
    late = yolo_v2_loss(net, jnp.asarray(labels), CFG,
                        step=jnp.asarray(CFG.v2_burnin_samples + 1))[1]
    assert float(late.burnin_loss) == 0.0
    # gradient of the burn-in term points boxes toward the prior: a few
    # steps on the total must shrink the prior residual
    def burn(n):
        return yolo_v2_loss(n, jnp.asarray(labels), CFG,
                            step=jnp.asarray(0))[1].burnin_loss
    cur = net
    first = float(burn(cur))
    for _ in range(20):
        cur = cur - 0.5 * jax.grad(
            lambda n: yolo_v2_loss(n, jnp.asarray(labels), CFG,
                                   step=jnp.asarray(0))[0])(cur)
    assert float(burn(cur)) < first


def test_coord_scale_upweights_small_boxes():
    import dataclasses
    small_w = 0.1 * CFG.image_size
    labels, _, _ = make_label(60, 60, small_w, small_w, cls=0)
    net = np.zeros((1, CFG.S, CFG.S, CFG.cell_channels), np.float32)
    net[..., 4::CFG.num_class + 5] = -12.0
    on = yolo_v2_loss(jnp.asarray(net), jnp.asarray(labels), CFG)[1]
    flat = dataclasses.replace(CFG, v2_coord_scale=False)
    off = yolo_v2_loss(jnp.asarray(net), jnp.asarray(labels), flat)[1]
    ratio = float(on.coord_loss) / float(off.coord_loss)
    np.testing.assert_allclose(ratio, 2.0 - 0.1 * 0.1, rtol=1e-5)


def test_per_slot_labels_two_objects_one_cell():
    """Two overlapping objects in ONE cell supervise two different anchor
    slots — the capability the one-object-per-cell grid caps."""
    cx = (1 + 0.5) / CFG.S * CFG.image_size
    cy = (2 + 0.5) / CFG.S * CFG.image_size
    sq = 1.0 / CFG.S * CFG.image_size        # anchor-0-shaped
    wide_w = 3.0 / CFG.S * CFG.image_size    # anchor-1-shaped
    wide_h = 1.5 / CFG.S * CFG.image_size
    labels = make_slot_label([(cx, cy, sq, sq, 2, 0),
                              (cx, cy, wide_w, wide_h, 4, 1)])
    net = np.zeros((1, CFG.S, CFG.S, CFG.cell_channels), np.float32)
    _, aux = yolo_v2_loss(jnp.asarray(net), jnp.asarray(labels), CFG)
    owner = np.asarray(aux.owner_mask)
    assert owner.sum() == 2
    yi, xi = 2, 1
    np.testing.assert_array_equal(owner[0, yi, xi], [1, 1, 0])
    # and a perfect two-object prediction drives the loss to ~0
    stride = 5 + CFG.num_class
    a = np.asarray(CFG.anchors)
    net[..., 4::stride] = -12.0
    for slot, (w, h, cls) in enumerate(((sq, sq, 2), (wide_w, wide_h, 4))):
        base = slot * stride
        net[0, yi, xi, base + 0] = 0.0   # σ=0.5 center
        net[0, yi, xi, base + 1] = 0.0
        net[0, yi, xi, base + 2] = np.log(w / CFG.image_size * CFG.S /
                                          a[slot, 0])
        net[0, yi, xi, base + 3] = np.log(h / CFG.image_size * CFG.S /
                                          a[slot, 1])
        net[0, yi, xi, base + 4] = 12.0
        net[0, yi, xi, base + 5 + cls] = 20.0
    total, aux = yolo_v2_loss(jnp.asarray(net), jnp.asarray(labels), CFG)
    assert float(aux.coord_loss) < 1e-5
    assert float(aux.class_loss) < 1e-6
    assert float(aux.object_loss) < 1e-3
    assert float(aux.noobject_loss) < 1e-6


def test_golden_numpy_v2_loss_legacy_and_slot(rng):
    """Full-term golden equality vs the independent numpy port
    (tests/reference_numpy.np_yolo_v2_loss), both label layouts, with
    burn-in active."""
    from tests.reference_numpy import np_yolo_v2_loss

    labels4, _, _ = make_label(60, 60, 40, 40, cls=0)
    labels4b, _, _ = make_label(100, 20, 60, 25, cls=3)
    labels4 = np.concatenate([labels4, labels4b])
    labels5 = np.concatenate([
        make_slot_label([(60, 60, 40, 40, 0, 0), (60, 60, 90, 40, 4, 1)]),
        make_slot_label([(100, 20, 60, 25, 3, 1)])])
    for labels in (labels4, labels5):
        net = rng.normal(0, 0.8, (2, CFG.S, CFG.S, CFG.cell_channels)
                         ).astype(np.float32)
        total, aux = yolo_v2_loss(jnp.asarray(net), jnp.asarray(labels),
                                  CFG, step=jnp.asarray(1))
        want_total, want = np_yolo_v2_loss(net, labels, CFG, step=1)
        np.testing.assert_allclose(float(total), want_total, rtol=1e-4)
        for k, v in want.items():
            np.testing.assert_allclose(float(getattr(aux, k)), v,
                                       rtol=1e-4, atol=1e-6)


def test_build_label_grid_v2_assignment_and_overflow():
    """Loader-side anchor slot assignment: best shape match first,
    next-best when taken, drop when the cell is full."""
    from tensorflow_yolo2_tpu.data.voc import build_label_grid_v2

    S, B, C = CFG.S, CFG.B, CFG.num_class
    cell = CFG.image_size / S
    # 4 same-shaped square objects centered in cell (2, 1): the first
    # takes anchor 0 (best match), the next two spill to the free slots,
    # the 4th is dropped
    cx, cy = 1.5 * cell, 2.5 * cell
    sq = cell  # anchor-0-shaped
    corners = np.asarray([[cx - sq / 2, cy - sq / 2, cx + sq / 2,
                           cy + sq / 2]] * 4, np.float32)
    cls = np.asarray([0, 1, 2, 3], np.int32)
    grid = build_label_grid_v2(corners, cls, S, B, CFG.anchors, C,
                               CFG.image_size)
    assert grid.shape == (S, S, B, 5 + C)
    assert grid[2, 1, :, 0].sum() == 3  # one object dropped
    assert grid[2, 1, 0, 5 + 0] == 1    # first wins the best anchor
    assert grid[..., 0].sum() == 3
    # distinct shapes land on their own best anchors
    wide = np.asarray([[cx - 1.5 * cell, cy - 0.75 * cell,
                        cx + 1.5 * cell, cy + 0.75 * cell]], np.float32)
    g2 = build_label_grid_v2(np.concatenate([corners[:1], wide]),
                             np.asarray([0, 1], np.int32), S, B,
                             CFG.anchors, C, CFG.image_size)
    np.testing.assert_array_equal(g2[2, 1, :, 0], [1, 1, 0])


def test_pascal_voc_per_slot_labels(tmp_root):
    """PascalVOC emits (b, S, S, B, 5+C) grids for anchor configs and both
    objects of a shared cell survive into the labels."""
    from tests import synthetic

    from tensorflow_yolo2_tpu.data.voc import PascalVOC

    root = tmp_root / "data" / "VOCdevkit"
    synthetic.make_voc(str(root), n_images=6)
    imdb = PascalVOC("trainval", batch_size=2, yolo=CFG,
                     data_path=str(root / "VOC2007"))
    images, labels = imdb.get()
    # num_class comes from the dataset (VOC's 20), the grid/B from the cfg
    assert labels.shape == (2, CFG.S, CFG.S, CFG.B, 5 + imdb.num_class)
    assert labels[..., 0].sum() > 0
