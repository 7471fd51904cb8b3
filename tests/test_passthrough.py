"""Full-YOLOv2 passthrough (reorg) head tests — models.darknet.
Darknet19DetectorV2 / DetectionHeadV2.

The reference never built this head (its detection head is the plain
3×conv_bn stack, src/yolo2_nets/darknet.py:182-201); this is the
YOLO9000 "fine-grained features" route: trunk H/16 512-ch map → 1×1×64
conv → 2×2 space-to-depth → concat with the H/32 main path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import yolo_v2_config
from tensorflow_yolo2_tpu.losses.yolo_v2 import yolo_v2_loss
from tensorflow_yolo2_tpu.models import (
    Darknet19Backbone,
    Darknet19Classifier,
    Darknet19Detector,
    Darknet19DetectorV2,
)
from tensorflow_yolo2_tpu.models.fold import fold_params
from tensorflow_yolo2_tpu.models.layers import space_to_depth


def mesh_input(batch, size, channels=3):
    x = np.linspace(-1, 1, batch * size * size * channels, dtype=np.float32)
    return x.reshape(batch, size, size, channels)


def test_space_to_depth_layout():
    # channel = (2·r_row + r_col)·C + c — each output channel block is one
    # pool-window phase
    x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    y = np.asarray(space_to_depth(jnp.asarray(x)))
    assert y.shape == (2, 2, 2, 12)
    for r in range(2):
        for c in range(2):
            np.testing.assert_array_equal(
                y[..., (2 * r + c) * 3:(2 * r + c + 1) * 3],
                x[:, r::2, c::2, :])


def test_backbone_return_mid_shapes():
    model = Darknet19Backbone()
    x = mesh_input(1, 64)
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mid = model.apply(params, x, train=False, return_mid=True)
    assert out.shape == (1, 2, 2, 1024)
    assert mid.shape == (1, 4, 4, 512)  # H/16, the pre-final-pool map
    # the plain call is unchanged
    out2 = model.apply(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_detector_v2_grid_shape_and_multiscale():
    yolo = yolo_v2_config(416)
    model = Darknet19DetectorV2(output_channels=yolo.cell_channels)
    x = mesh_input(1, 416)
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(params, x, train=False)
    assert y.shape == (1, 13, 13, yolo.cell_channels)  # 125 for VOC B=5
    # fully convolutional: 448 input → S=14, same params
    y2 = model.apply(params, mesh_input(1, 448), train=False)
    assert y2.shape == (1, 14, 14, yolo.cell_channels)


def test_passthrough_head_topology():
    yolo = yolo_v2_config(416)
    model = Darknet19DetectorV2(output_channels=yolo.cell_channels)
    params = model.init(jax.random.PRNGKey(0), mesh_input(1, 64),
                        train=False)["params"]
    det = params["detection"]
    # the reorg route: 1×1 conv 512→64 on the H/16 map
    assert det["passthrough"]["conv"]["kernel"].shape == (1, 1, 512, 64)
    # conv3 consumes the concat: 1024 main + 4·64 reorged = 1280 in
    assert det["conv3"]["conv"]["kernel"].shape == (3, 3, 1280, 1024)
    # linear output conv (paper head): no BN params under output
    assert set(det["output"]) == {"conv"}
    assert det["output"]["conv"]["kernel"].shape[-2:] == (
        1024, yolo.cell_channels)
    # distinct topology from the plain anchor head
    plain = Darknet19Detector(output_channels=yolo.cell_channels,
                              bn_on_output=False)
    plain_params = plain.init(jax.random.PRNGKey(0), mesh_input(1, 64),
                              train=False)["params"]
    assert "passthrough" not in plain_params["detection"]


def test_gradient_reaches_passthrough_conv():
    yolo = yolo_v2_config(64)  # S=2 keeps it tiny
    model = Darknet19DetectorV2(output_channels=yolo.cell_channels)
    x = mesh_input(2, 64)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    labels = np.zeros((2, yolo.S, yolo.S, 5 + yolo.num_class), np.float32)
    labels[0, 1, 1] = [1, 33.0, 30.0, 20.0, 24.0] + [0] * yolo.num_class
    labels[0, 1, 1, 5 + 3] = 1.0

    def loss_fn(params):
        grid, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        total, _ = yolo_v2_loss(grid, jnp.asarray(labels), yolo)
        return total

    grads = jax.grad(loss_fn)(variables["params"])
    g = grads["detection"]["passthrough"]["conv"]["kernel"]
    assert float(jnp.abs(g).max()) > 0.0
    assert np.isfinite(float(loss_fn(variables["params"])))


def test_detector_v2_bn_fold_equivalence():
    yolo = yolo_v2_config(64)
    model = Darknet19DetectorV2(output_channels=yolo.cell_channels)
    x = mesh_input(1, 64)
    variables = model.init(jax.random.PRNGKey(3), x, train=False)
    # make the moving stats non-trivial so folding actually does work
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.25 * jnp.arange(a.size, dtype=a.dtype).reshape(
            a.shape) / a.size,
        variables["batch_stats"])
    ref = model.apply({"params": variables["params"], "batch_stats": stats},
                      x, train=False)
    folded = fold_params(variables["params"], stats)
    fast = Darknet19DetectorV2(output_channels=yolo.cell_channels,
                               fold_bn=True)
    out = fast.apply({"params": folded}, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_classifier_warm_start_intersects_backbone():
    # pascal_train_darknet --v2 --passthrough warm-starts from the ImageNet
    # classifier by name intersection (reference net_utils.py:81-101): the
    # backbone subtree must line up leaf-for-leaf
    cls = Darknet19Classifier(num_classes=10)
    det = Darknet19DetectorV2(output_channels=125)
    cls_params = cls.init(jax.random.PRNGKey(0), mesh_input(1, 64),
                          train=False)["params"]
    det_params = det.init(jax.random.PRNGKey(1), mesh_input(1, 64),
                          train=False)["params"]
    cls_bb = jax.tree_util.tree_leaves_with_path(cls_params["backbone"])
    det_bb = {jax.tree_util.keystr(p): l.shape for p, l in
              jax.tree_util.tree_leaves_with_path(det_params["backbone"])}
    assert len(cls_bb) > 0
    for path, leaf in cls_bb:
        assert det_bb[jax.tree_util.keystr(path)] == leaf.shape


def test_detect_fn_passthrough_serving_path():
    # make_detect_fn(passthrough=True) end-to-end on CPU: folded forward +
    # anchor decode (the jnp path; the fused kernel is TPU-tested)
    from tensorflow_yolo2_tpu.entries.pascal_detect_darknet import (
        make_detect_fn,
    )

    yolo = yolo_v2_config(64)
    model = Darknet19DetectorV2(output_channels=yolo.cell_channels)
    x = mesh_input(1, 64)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    detect = make_detect_fn(yolo, variables["params"],
                            variables["batch_stats"], object_thresh=0.0,
                            use_nms=False, v2=True, passthrough=True,
                            dtype=jnp.float32)
    dets = detect(jnp.asarray(x))
    assert np.asarray(dets.boxes).shape[-1] == 4
    assert np.all(np.isfinite(np.asarray(dets.scores)))
