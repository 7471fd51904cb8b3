"""TF1-checkpoint import parity test.

Builds a TF graph with the *reference's variable-naming conventions*
(unnamed ``tf.Variable``s inside the ``darknet19`` scope → ``Variable``,
``Variable_1``, ...; auto-uniquified ``batch_normalization[_k]`` scopes;
named head sub-scopes), saves a V1-Saver checkpoint with random weights,
imports it with compat.tf_import, and asserts the Flax detector's forward
output matches the TF graph's to tolerance — the golden-box requirement
(BASELINE.md: boxes bitwise-tolerant vs the TF reference via checkpoint
import).
"""

import os

import numpy as np
import pytest

import jax

tf = pytest.importorskip("tensorflow")

from tensorflow_yolo2_tpu.compat.tf_import import (  # noqa: E402
    import_darknet19_checkpoint,
)
from tensorflow_yolo2_tpu.models.darknet import (  # noqa: E402
    _DARKNET19_SCHEDULE,
    Darknet19Detector,
)

EPS = 1e-3  # tf.layers.batch_normalization default (reference darknet.py:42)


def _tf_conv_bn(v1, x, k, cout, rng):
    cin = int(x.shape[-1])
    w = tf.Variable(rng.normal(0, 0.05, (k, k, cin, cout)).astype(np.float32))
    b = tf.Variable(np.full(cout, 0.1, np.float32))
    x = tf.nn.conv2d(x, w, 1, "SAME") + b
    with v1.variable_scope(None, default_name="batch_normalization"):
        gamma = v1.get_variable(
            "gamma", initializer=rng.uniform(0.5, 1.5, cout).astype(np.float32))
        beta = v1.get_variable(
            "beta", initializer=rng.normal(0, 0.2, cout).astype(np.float32))
        mean = v1.get_variable(
            "moving_mean",
            initializer=rng.normal(0, 0.3, cout).astype(np.float32))
        var = v1.get_variable(
            "moving_variance",
            initializer=rng.uniform(0.5, 2.0, cout).astype(np.float32))
    y = (x - mean) * tf.math.rsqrt(var + EPS) * gamma + beta
    return tf.maximum(0.1 * y, y)


def build_tf_detector(v1, images, rng, out_channels=30):
    with v1.variable_scope("darknet19"):
        x = tf.constant(images)
        for item in _DARKNET19_SCHEDULE:
            if item == "M":
                x = tf.nn.max_pool2d(x, 2, 2, "SAME")
            else:
                x = _tf_conv_bn(v1, x, item[0], item[1], rng)
    with v1.variable_scope("darknet19_detection"):
        for name in ("conv1", "conv2", "conv3"):
            with v1.variable_scope(name):
                x = _tf_conv_bn(v1, x, 3, 1024, rng)
        with v1.variable_scope("output"):
            x = _tf_conv_bn(v1, x, 1, out_channels, rng)
    return x


@pytest.mark.slow
def test_darknet_checkpoint_import_forward_parity(tmp_path):
    rng = np.random.RandomState(42)
    images = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)

    v1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        out = build_tf_detector(v1, images, rng)
        saver = v1.train.Saver()
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out = sess.run(out)
            ckpt = str(tmp_path / "darknet19_pascal.ckpt")
            saver.save(sess, ckpt)

    params, stats = import_darknet19_checkpoint(ckpt, detection=True)
    model = Darknet19Detector(output_channels=30)
    got = model.apply({"params": params, "batch_stats": stats},
                      images, train=False)
    got = np.asarray(got)
    assert got.shape == tf_out.shape == (1, 2, 2, 30)
    # fp32 accumulation-order differences (oneDNN vs XLA) grow through 22
    # stacked convs with activations up to ~600; observed max rel diff
    # ~2e-3.
    np.testing.assert_allclose(got, tf_out, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_golden_boxes_through_the_serving_path(tmp_path):
    """Full serving-path golden-box parity (VERDICT r1 item 7): a
    reference-convention TF detector checkpoint, a real image file
    through the entry's own pipeline (image_read BGR/[-1,1] →
    load_detector_params --tf-checkpoint → make_detect_fn with folded BN
    and the fused Pallas decode+NMS), compared against the TF graph's
    output decoded by the numpy port of the reference decode
    (net_utils.py:375-439) + greedy NMS."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax.numpy as jnp
    from reference_numpy import np_decode, np_nms
    from synthetic import make_image

    from tensorflow_yolo2_tpu.config import YoloConfig
    from tensorflow_yolo2_tpu.data.augment import image_read
    from tensorflow_yolo2_tpu.entries.pascal_detect_darknet import (
        load_detector_params,
        make_detect_fn,
    )

    img_path = str(tmp_path / "demo.jpg")
    make_image(img_path, 320, 240, seed=3,
               boxes=[(40, 40, 140, 120), (180, 100, 280, 200)])
    image = image_read(img_path, 224)  # BGR, [-1, 1] (pascal_voc.py:60-67)

    rng = np.random.RandomState(17)
    v1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        out = build_tf_detector(v1, image[None].astype(np.float32), rng)
        saver = v1.train.Saver()
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_grid = sess.run(out)[0]  # (7, 7, 30)
            ckpt = str(tmp_path / "darknet19_pascal.ckpt")
            saver.save(sess, ckpt)

    yolo = YoloConfig()
    # threshold in the widest confidence gap near the top so no conf sits
    # within fp tolerance of the cut
    conf = np.sort(tf_grid[..., yolo.num_class:yolo.num_class + yolo.B]
                   .ravel())[::-1]
    gaps = conf[:12] - conf[1:13]
    gi = int(np.argmax(gaps))
    thresh = float((conf[gi] + conf[gi + 1]) / 2)

    want = np_nms(np_decode(tf_grid, yolo.S, yolo.B, yolo.num_class,
                            thresh), 0.5, class_aware=True)
    assert want, "fixture produced no detections above threshold"

    params, stats = load_detector_params(yolo, tf_checkpoint=ckpt)
    detect = make_detect_fn(yolo, params, stats, object_thresh=thresh,
                            use_nms=True, dtype=jnp.float32)
    dets = detect(image[None])
    scores = np.asarray(dets.scores[0])
    boxes = np.asarray(dets.boxes[0])
    classes = np.asarray(dets.classes[0])
    kept = scores > 0

    assert kept.sum() == len(want)
    want_sorted = sorted(want, key=lambda d: -d[4])
    np.testing.assert_allclose(scores[kept],
                               [d[4] for d in want_sorted],
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(boxes[kept],
                               [d[:4] for d in want_sorted],
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(classes[kept],
                                  [d[5] for d in want_sorted])
