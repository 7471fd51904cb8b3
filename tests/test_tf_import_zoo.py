"""Zoo-wide TF-checkpoint-import forward-parity tests.

Builds TF graphs with slim's variable naming for inception_v2,
inception_v4, resnet_v1_101 and resnet_v2_50 (scopes per the vendored
nets src/slim_dir/nets/{inception_v2,inception_v4,resnet_v1,resnet_v2}.py
under resnet_arg_scope / inception arg_scope conventions), saves
checkpoints with random weights, imports via compat.tf_import, and
asserts the Flax models' logits match — the slim released-checkpoint
warm-start capability (_get_init_fn, yolo1-resnet-adv.py:146-189)
extended across the registered zoo.
"""

import numpy as np
import pytest

import jax

tf = pytest.importorskip("tensorflow")

from tests.test_tf_import_v3_vgg import _avgpool_incl, _conv_bn  # noqa: E402

from tensorflow_yolo2_tpu.compat.tf_import import (  # noqa: E402
    import_checkpoint_for,
    import_inception_v2_checkpoint,
    import_inception_v4_checkpoint,
    import_resnet_v1_checkpoint,
    import_resnet_v2_checkpoint,
)
from tensorflow_yolo2_tpu.models.inception import (  # noqa: E402
    InceptionV2,
    InceptionV4,
)
from tensorflow_yolo2_tpu.models.resnet_v2 import ResNetV2  # noqa: E402
from tensorflow_yolo2_tpu.models.zoo import ResNetV1  # noqa: E402

NUM_CLASSES = 5


def _save(graph, v1, out, tmp_path, name):
    with graph.as_default():
        saver = v1.train.Saver()
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out = sess.run(out)
            ckpt = str(tmp_path / name)
            saver.save(sess, ckpt)
    return tf_out, ckpt


# ---------------------------------------------------------------------------
# inception_v2
# ---------------------------------------------------------------------------

# (scope, b0, (b1a, b1b), (b2a, b2b, b2c), b3, pool) per reference
# inception_v2.py:122-409; reductions interleaved
_IV2_MIXED = [
    ("Mixed_3b", 64, (64, 64), (64, 96, 96), 32, "avg"),
    ("Mixed_3c", 64, (64, 96), (64, 96, 96), 64, "avg"),
    ("Mixed_4a", (128, 160), (64, 96, 96), None, None, None),
    ("Mixed_4b", 224, (64, 96), (96, 128, 128), 128, "avg"),
    ("Mixed_4c", 192, (96, 128), (96, 128, 128), 128, "avg"),
    ("Mixed_4d", 160, (128, 160), (128, 160, 160), 96, "avg"),
    ("Mixed_4e", 96, (128, 192), (160, 192, 192), 96, "avg"),
    ("Mixed_5a", (128, 192), (192, 256, 256), None, None, None),
    ("Mixed_5b", 352, (192, 320), (160, 224, 224), 128, "avg"),
    ("Mixed_5c", 352, (192, 320), (192, 224, 224), 128, "max"),
]


def build_tf_inception_v2(v1, images, rng):
    cb = lambda x, f, kh, kw, s, p, n: _conv_bn(v1, x, f, kh, kw, s, p, n,
                                                rng)
    with v1.variable_scope("InceptionV2"):
        x = tf.constant(images)
        # separable 7×7/2 stem (inception_v2.py:84-98): depthwise mult 8
        with v1.variable_scope("Conv2d_1a_7x7"):
            dw = v1.get_variable("depthwise_weights", initializer=rng.normal(
                0, 0.1, (7, 7, 3, 8)).astype(np.float32))
            pw = v1.get_variable("pointwise_weights", initializer=rng.normal(
                0, 0.1, (1, 1, 24, 64)).astype(np.float32))
            x = tf.nn.separable_conv2d(x, dw, pw, [1, 2, 2, 1], "SAME")
            with v1.variable_scope("BatchNorm"):
                beta = v1.get_variable("beta", initializer=rng.normal(
                    0, 0.2, 64).astype(np.float32))
                mean = v1.get_variable("moving_mean", initializer=rng.normal(
                    0, 0.3, 64).astype(np.float32))
                var = v1.get_variable("moving_variance", initializer=rng.uniform(
                    0.5, 2.0, 64).astype(np.float32))
            x = tf.nn.relu((x - mean) * tf.math.rsqrt(var + 1e-3) + beta)
        x = tf.nn.max_pool2d(x, 3, 2, "SAME")
        x = cb(x, 64, 1, 1, 1, "SAME", "Conv2d_2b_1x1")
        x = cb(x, 192, 3, 3, 1, "SAME", "Conv2d_2c_3x3")
        x = tf.nn.max_pool2d(x, 3, 2, "SAME")

        for scope, b0, b1, b2, b3, pool in _IV2_MIXED:
            with v1.variable_scope(scope):
                if b2 is None:  # reduction block (2 conv branches + pool)
                    with v1.variable_scope("Branch_0"):
                        t = cb(x, b0[0], 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                        br0 = cb(t, b0[1], 3, 3, 2, "SAME", "Conv2d_1a_3x3")
                    with v1.variable_scope("Branch_1"):
                        t = cb(x, b1[0], 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                        t = cb(t, b1[1], 3, 3, 1, "SAME", "Conv2d_0b_3x3")
                        br1 = cb(t, b1[2], 3, 3, 2, "SAME", "Conv2d_1a_3x3")
                    x = tf.concat(
                        [br0, br1, tf.nn.max_pool2d(x, 3, 2, "SAME")], 3)
                    continue
                with v1.variable_scope("Branch_0"):
                    br0 = cb(x, b0, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                with v1.variable_scope("Branch_1"):
                    t = cb(x, b1[0], 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    br1 = cb(t, b1[1], 3, 3, 1, "SAME", "Conv2d_0b_3x3")
                with v1.variable_scope("Branch_2"):
                    t = cb(x, b2[0], 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    t = cb(t, b2[1], 3, 3, 1, "SAME", "Conv2d_0b_3x3")
                    br2 = cb(t, b2[2], 3, 3, 1, "SAME", "Conv2d_0c_3x3")
                with v1.variable_scope("Branch_3"):
                    pooled = (_avgpool_incl(x) if pool == "avg"
                              else tf.nn.max_pool2d(x, 3, 1, "SAME"))
                    br3 = cb(pooled, b3, 1, 1, 1, "SAME", "Conv2d_0b_1x1")
                x = tf.concat([br0, br1, br2, br3], 3)

        x = tf.reduce_mean(x, axis=(1, 2), keepdims=True)
        with v1.variable_scope("Logits"):
            with v1.variable_scope("Conv2d_1c_1x1"):
                w = v1.get_variable("weights", initializer=rng.normal(
                    0, 0.02, (1, 1, 1024, NUM_CLASSES)).astype(np.float32))
                b = v1.get_variable("biases", initializer=rng.normal(
                    0, 0.05, NUM_CLASSES).astype(np.float32))
                x = tf.nn.conv2d(x, w, 1, "SAME") + b
        return tf.squeeze(x, (1, 2))


@pytest.mark.slow
def test_inception_v2_import_forward_parity(tmp_path):
    rng = np.random.RandomState(29)
    images = rng.uniform(-1, 1, (1, 96, 96, 3)).astype(np.float32)
    v1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        out = build_tf_inception_v2(v1, images, rng)
    tf_out, ckpt = _save(graph, v1, out, tmp_path, "inception_v2.ckpt")

    params, stats = import_inception_v2_checkpoint(ckpt)
    model = InceptionV2(num_classes=NUM_CLASSES)
    got = model.apply({"params": params, "batch_stats": stats},
                      jax.numpy.asarray(images), train=False)
    np.testing.assert_allclose(np.asarray(got), tf_out, rtol=5e-3, atol=5e-3)
    p2, _ = import_checkpoint_for("inception_v2", ckpt)
    np.testing.assert_array_equal(
        np.asarray(p2["conv1"]["depthwise"]["kernel"]),
        np.asarray(params["conv1"]["depthwise"]["kernel"]))


# ---------------------------------------------------------------------------
# inception_v4
# ---------------------------------------------------------------------------


def build_tf_inception_v4(v1, images, rng):
    cb = lambda x, f, kh, kw, s, p, n: _conv_bn(v1, x, f, kh, kw, s, p, n,
                                                rng)
    with v1.variable_scope("InceptionV4"):
        x = tf.constant(images)
        x = cb(x, 32, 3, 3, 2, "VALID", "Conv2d_1a_3x3")
        x = cb(x, 32, 3, 3, 1, "VALID", "Conv2d_2a_3x3")
        x = cb(x, 64, 3, 3, 1, "SAME", "Conv2d_2b_3x3")
        with v1.variable_scope("Mixed_3a"):
            p = tf.nn.max_pool2d(x, 3, 2, "VALID")
            with v1.variable_scope("Branch_1"):
                c = cb(x, 96, 3, 3, 2, "VALID", "Conv2d_0a_3x3")
            x = tf.concat([p, c], 3)
        with v1.variable_scope("Mixed_4a"):
            with v1.variable_scope("Branch_0"):
                t0 = cb(x, 64, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                t0 = cb(t0, 96, 3, 3, 1, "VALID", "Conv2d_1a_3x3")
            with v1.variable_scope("Branch_1"):
                t1 = cb(x, 64, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                t1 = cb(t1, 64, 1, 7, 1, "SAME", "Conv2d_0b_1x7")
                t1 = cb(t1, 64, 7, 1, 1, "SAME", "Conv2d_0c_7x1")
                t1 = cb(t1, 96, 3, 3, 1, "VALID", "Conv2d_1a_3x3")
            x = tf.concat([t0, t1], 3)
        with v1.variable_scope("Mixed_5a"):
            with v1.variable_scope("Branch_0"):
                c = cb(x, 192, 3, 3, 2, "VALID", "Conv2d_1a_3x3")
            x = tf.concat([c, tf.nn.max_pool2d(x, 3, 2, "VALID")], 3)

        def block_a(x, scope):
            with v1.variable_scope(scope):
                with v1.variable_scope("Branch_0"):
                    br0 = cb(x, 96, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                with v1.variable_scope("Branch_1"):
                    t = cb(x, 64, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    br1 = cb(t, 96, 3, 3, 1, "SAME", "Conv2d_0b_3x3")
                with v1.variable_scope("Branch_2"):
                    t = cb(x, 64, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    t = cb(t, 96, 3, 3, 1, "SAME", "Conv2d_0b_3x3")
                    br2 = cb(t, 96, 3, 3, 1, "SAME", "Conv2d_0c_3x3")
                with v1.variable_scope("Branch_3"):
                    br3 = cb(_avgpool_incl(x), 96, 1, 1, 1, "SAME",
                             "Conv2d_0b_1x1")
                return tf.concat([br0, br1, br2, br3], 3)

        def block_b(x, scope):
            with v1.variable_scope(scope):
                with v1.variable_scope("Branch_0"):
                    br0 = cb(x, 384, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                with v1.variable_scope("Branch_1"):
                    t = cb(x, 192, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    t = cb(t, 224, 1, 7, 1, "SAME", "Conv2d_0b_1x7")
                    br1 = cb(t, 256, 7, 1, 1, "SAME", "Conv2d_0c_7x1")
                with v1.variable_scope("Branch_2"):
                    t = cb(x, 192, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    t = cb(t, 192, 7, 1, 1, "SAME", "Conv2d_0b_7x1")
                    t = cb(t, 224, 1, 7, 1, "SAME", "Conv2d_0c_1x7")
                    t = cb(t, 224, 7, 1, 1, "SAME", "Conv2d_0d_7x1")
                    br2 = cb(t, 256, 1, 7, 1, "SAME", "Conv2d_0e_1x7")
                with v1.variable_scope("Branch_3"):
                    br3 = cb(_avgpool_incl(x), 128, 1, 1, 1, "SAME",
                             "Conv2d_0b_1x1")
                return tf.concat([br0, br1, br2, br3], 3)

        def block_c(x, scope):
            with v1.variable_scope(scope):
                with v1.variable_scope("Branch_0"):
                    br0 = cb(x, 256, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                with v1.variable_scope("Branch_1"):
                    t = cb(x, 384, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    br1 = tf.concat([
                        cb(t, 256, 1, 3, 1, "SAME", "Conv2d_0b_1x3"),
                        cb(t, 256, 3, 1, 1, "SAME", "Conv2d_0c_3x1")], 3)
                with v1.variable_scope("Branch_2"):
                    t = cb(x, 384, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    t = cb(t, 448, 3, 1, 1, "SAME", "Conv2d_0b_3x1")
                    t = cb(t, 512, 1, 3, 1, "SAME", "Conv2d_0c_1x3")
                    br2 = tf.concat([
                        cb(t, 256, 1, 3, 1, "SAME", "Conv2d_0d_1x3"),
                        cb(t, 256, 3, 1, 1, "SAME", "Conv2d_0e_3x1")], 3)
                with v1.variable_scope("Branch_3"):
                    br3 = cb(_avgpool_incl(x), 256, 1, 1, 1, "SAME",
                             "Conv2d_0b_1x1")
                return tf.concat([br0, br1, br2, br3], 3)

        for i in range(4):
            x = block_a(x, f"Mixed_5{chr(ord('b') + i)}")
        with v1.variable_scope("Mixed_6a"):
            with v1.variable_scope("Branch_0"):
                br0 = cb(x, 384, 3, 3, 2, "VALID", "Conv2d_1a_3x3")
            with v1.variable_scope("Branch_1"):
                t = cb(x, 192, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                t = cb(t, 224, 3, 3, 1, "SAME", "Conv2d_0b_3x3")
                br1 = cb(t, 256, 3, 3, 2, "VALID", "Conv2d_1a_3x3")
            x = tf.concat([br0, br1, tf.nn.max_pool2d(x, 3, 2, "VALID")], 3)
        for i in range(7):
            x = block_b(x, f"Mixed_6{chr(ord('b') + i)}")

        # aux tower off Mixed_6h (inception_v4.py:287-305); unlike v3 the
        # final layer is a fully_connected on the flattened 1×1×768 map
        with v1.variable_scope("AuxLogits"):
            a = tf.nn.avg_pool2d(x, 5, 3, "VALID")
            a = cb(a, 128, 1, 1, 1, "SAME", "Conv2d_1b_1x1")
            k = int(a.shape[1])
            a = cb(a, 768, k, int(a.shape[2]), 1, "VALID", "Conv2d_2a")
            a = tf.reshape(a, (int(a.shape[0]), -1))
            with v1.variable_scope("Aux_logits"):
                w = v1.get_variable("weights", initializer=rng.normal(
                    0, 0.01, (768, NUM_CLASSES)).astype(np.float32))
                b = v1.get_variable("biases", initializer=rng.normal(
                    0, 0.05, NUM_CLASSES).astype(np.float32))
                aux = tf.matmul(a, w) + b

        with v1.variable_scope("Mixed_7a"):
            with v1.variable_scope("Branch_0"):
                t = cb(x, 192, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                br0 = cb(t, 192, 3, 3, 2, "VALID", "Conv2d_1a_3x3")
            with v1.variable_scope("Branch_1"):
                t = cb(x, 256, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                t = cb(t, 256, 1, 7, 1, "SAME", "Conv2d_0b_1x7")
                t = cb(t, 320, 7, 1, 1, "SAME", "Conv2d_0c_7x1")
                br1 = cb(t, 320, 3, 3, 2, "VALID", "Conv2d_1a_3x3")
            x = tf.concat([br0, br1, tf.nn.max_pool2d(x, 3, 2, "VALID")], 3)
        for i in range(3):
            x = block_c(x, f"Mixed_7{chr(ord('b') + i)}")

        x = tf.reduce_mean(x, axis=(1, 2))
        with v1.variable_scope("Logits"):
            with v1.variable_scope("Logits"):
                w = v1.get_variable("weights", initializer=rng.normal(
                    0, 0.02, (1536, NUM_CLASSES)).astype(np.float32))
                b = v1.get_variable("biases", initializer=rng.normal(
                    0, 0.05, NUM_CLASSES).astype(np.float32))
                x = tf.matmul(x, w) + b
        return x, aux


@pytest.mark.slow
def test_inception_v4_import_forward_parity(tmp_path):
    rng = np.random.RandomState(31)
    images = rng.uniform(-1, 1, (1, 160, 160, 3)).astype(np.float32)
    v1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        out = build_tf_inception_v4(v1, images, rng)
    (tf_out, tf_aux), ckpt = _save(graph, v1, out, tmp_path,
                                   "inception_v4.ckpt")

    params, stats = import_inception_v4_checkpoint(ckpt)
    model = InceptionV4(num_classes=NUM_CLASSES, aux_logits=True)
    got, got_aux = model.apply({"params": params, "batch_stats": stats},
                               jax.numpy.asarray(images), train=False)
    np.testing.assert_allclose(np.asarray(got), tf_out, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_aux), tf_aux, rtol=5e-3,
                               atol=5e-3)
    p2, _ = import_checkpoint_for("inception_v4", ckpt)
    np.testing.assert_array_equal(np.asarray(p2["c2_b2b"]["conv"]["kernel"]),
                                  np.asarray(params["c2_b2b"]["conv"]["kernel"]))


# ---------------------------------------------------------------------------
# resnet_v1_101 / resnet_v2_50
# ---------------------------------------------------------------------------


def _conv2d_same(v1, rng, x, f, k, stride, scope):
    """resnet_utils.conv2d_same: explicit pad + VALID for stride>1."""
    cin = int(x.shape[-1])
    with v1.variable_scope(scope):
        w = v1.get_variable("weights", initializer=rng.normal(
            0, 0.05, (k, k, cin, f)).astype(np.float32))
    if stride == 1:
        return tf.nn.conv2d(x, w, 1, "SAME"), scope
    pad = k - 1
    pb, pe = pad // 2, pad - pad // 2
    x = tf.pad(x, [[0, 0], [pb, pe], [pb, pe], [0, 0]])
    return tf.nn.conv2d(x, w, stride, "VALID"), scope


def _bn_scaled(v1, rng, x, scope, relu):
    """slim batch_norm under resnet_arg_scope (scale=True, eps 1e-5)."""
    f = int(x.shape[-1])
    with v1.variable_scope(scope):
        gamma = v1.get_variable("gamma", initializer=rng.uniform(
            0.5, 1.5, f).astype(np.float32))
        beta = v1.get_variable("beta", initializer=rng.normal(
            0, 0.2, f).astype(np.float32))
        mean = v1.get_variable("moving_mean", initializer=rng.normal(
            0, 0.3, f).astype(np.float32))
        var = v1.get_variable("moving_variance", initializer=rng.uniform(
            0.5, 2.0, f).astype(np.float32))
    x = (x - mean) * gamma * tf.math.rsqrt(var + 1e-5) + beta
    return tf.nn.relu(x) if relu else x


def _conv_bias(v1, rng, x, f, k, stride, scope):
    cin = int(x.shape[-1])
    with v1.variable_scope(scope):
        w = v1.get_variable("weights", initializer=rng.normal(
            0, 0.05, (k, k, cin, f)).astype(np.float32))
        b = v1.get_variable("biases", initializer=rng.normal(
            0, 0.1, f).astype(np.float32))
    return tf.nn.conv2d(x, w, stride, "SAME") + b


_R101_UNITS = (3, 4, 23, 3)
_DEPTHS = (256, 512, 1024, 2048)
_BOTTLENECKS = (64, 128, 256, 512)


def build_tf_resnet_v1(v1, images, rng, scope, units):
    def conv_bn(x, f, k, stride, sc, relu):
        x, _ = _conv2d_same(v1, rng, x, f, k, stride, sc)
        return _bn_scaled(v1, rng, x, f"{sc}/BatchNorm", relu)

    with v1.variable_scope(scope):
        x = tf.constant(images)
        x = conv_bn(x, 64, 7, 2, "conv1", relu=True)
        x = tf.nn.max_pool2d(x, 3, 2, "SAME")
        for bi, n in enumerate(units, start=1):
            for ui in range(1, n + 1):
                stride = 2 if (ui == n and bi < len(units)) else 1
                depth, dbn = _DEPTHS[bi - 1], _BOTTLENECKS[bi - 1]
                with v1.variable_scope(
                        f"block{bi}/unit_{ui}/bottleneck_v1"):
                    depth_in = int(x.shape[-1])
                    if depth == depth_in:
                        short = (x if stride == 1
                                 else tf.nn.max_pool2d(x, 1, stride, "SAME"))
                    else:
                        with v1.variable_scope("shortcut"):
                            w = v1.get_variable(
                                "weights", initializer=rng.normal(
                                    0, 0.05, (1, 1, depth_in, depth)
                                ).astype(np.float32))
                        short = tf.nn.conv2d(x, w, stride, "SAME")
                        short = _bn_scaled(v1, rng, short,
                                           "shortcut/BatchNorm", relu=False)
                    r = conv_bn(x, dbn, 1, 1, "conv1", relu=True)
                    r = conv_bn(r, dbn, 3, stride, "conv2", relu=True)
                    r = conv_bn(r, depth, 1, 1, "conv3", relu=False)
                    x = tf.nn.relu(short + r)
        x = tf.reduce_mean(x, axis=(1, 2), keepdims=True)
        x = _conv_bias(v1, rng, x, NUM_CLASSES, 1, 1, "logits")
        return tf.squeeze(x, (1, 2))


@pytest.mark.slow
def test_resnet_v1_101_import_forward_parity(tmp_path):
    rng = np.random.RandomState(37)
    images = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    v1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        out = build_tf_resnet_v1(v1, images, rng, "resnet_v1_101",
                                 _R101_UNITS)
    tf_out, ckpt = _save(graph, v1, out, tmp_path, "resnet_v1_101.ckpt")

    params, stats = import_resnet_v1_checkpoint(ckpt, "resnet_v1_101")
    model = ResNetV1(units=_R101_UNITS, num_classes=NUM_CLASSES)
    got = model.apply({"params": params, "batch_stats": stats},
                      jax.numpy.asarray(images), train=False)
    np.testing.assert_allclose(np.asarray(got), tf_out, rtol=5e-3, atol=5e-3)
    p2, _ = import_checkpoint_for("resnet_v1_101", ckpt)
    np.testing.assert_array_equal(
        np.asarray(p2["block3_unit23"]["conv2"]["kernel"]),
        np.asarray(params["block3_unit23"]["conv2"]["kernel"]))


def build_tf_resnet_v2(v1, images, rng, scope, units):
    with v1.variable_scope(scope):
        x = tf.constant(images)
        # root conv: conv2d_same with bias, no BN (resnet_v2.py:196-200)
        xc, _ = _conv2d_same(v1, rng, x, 64, 7, 2, "conv1")
        with v1.variable_scope("conv1"):
            b = v1.get_variable("biases", initializer=rng.normal(
                0, 0.1, 64).astype(np.float32))
        x = xc + b
        x = tf.nn.max_pool2d(x, 3, 2, "SAME")
        for bi, n in enumerate(units, start=1):
            for ui in range(1, n + 1):
                stride = 2 if (ui == n and bi < len(units)) else 1
                depth, dbn = _DEPTHS[bi - 1], _BOTTLENECKS[bi - 1]
                with v1.variable_scope(
                        f"block{bi}/unit_{ui}/bottleneck_v2"):
                    depth_in = int(x.shape[-1])
                    preact = _bn_scaled(v1, rng, x, "preact", relu=True)
                    if depth == depth_in:
                        short = (x if stride == 1
                                 else tf.nn.max_pool2d(x, 1, stride, "SAME"))
                    else:
                        short = _conv_bias(v1, rng, preact, depth, 1, stride,
                                           "shortcut")
                    r, _ = _conv2d_same(v1, rng, preact, dbn, 1, 1, "conv1")
                    r = _bn_scaled(v1, rng, r, "conv1/BatchNorm", relu=True)
                    r, _ = _conv2d_same(v1, rng, r, dbn, 3, stride, "conv2")
                    r = _bn_scaled(v1, rng, r, "conv2/BatchNorm", relu=True)
                    r = _conv_bias(v1, rng, r, depth, 1, 1, "conv3")
                    x = short + r
        x = _bn_scaled(v1, rng, x, "postnorm", relu=True)
        x = tf.reduce_mean(x, axis=(1, 2), keepdims=True)
        x = _conv_bias(v1, rng, x, NUM_CLASSES, 1, 1, "logits")
        return tf.squeeze(x, (1, 2))


@pytest.mark.slow
def test_resnet_v2_50_import_forward_parity(tmp_path):
    rng = np.random.RandomState(41)
    images = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    v1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        out = build_tf_resnet_v2(v1, images, rng, "resnet_v2_50",
                                 (3, 4, 6, 3))
    tf_out, ckpt = _save(graph, v1, out, tmp_path, "resnet_v2_50.ckpt")

    params, stats = import_resnet_v2_checkpoint(ckpt, "resnet_v2_50")
    model = ResNetV2(units=(3, 4, 6, 3), num_classes=NUM_CLASSES)
    got = model.apply({"params": params, "batch_stats": stats},
                      jax.numpy.asarray(images), train=False)
    np.testing.assert_allclose(np.asarray(got), tf_out, rtol=5e-3, atol=5e-3)
    p2, _ = import_checkpoint_for("resnet_v2_50", ckpt)
    np.testing.assert_array_equal(
        np.asarray(p2["block2_unit3"]["conv3"]["bias"]),
        np.asarray(params["block2_unit3"]["conv3"]["bias"]))
