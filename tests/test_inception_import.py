"""slim inception_resnet_v2 checkpoint-import forward-parity test.

Builds a TF graph with slim's variable naming for inception_resnet_v2
(scopes per the vendored net the reference trains:
``InceptionResnetV2/Conv2d_1a_3x3/...``, ``Repeat/block35_k``,
``Mixed_6a``, ``Repeat_1/block17_k``, ``Mixed_7a``, ``Repeat_2/block8_k``,
final top-scope ``Block8``, ``Conv2d_7b_1x1``, ``Logits/Logits``), saves a
checkpoint with random weights, imports via
compat.tf_import.import_inception_resnet_v2_checkpoint, and asserts the
Flax model's logits match the TF graph — the capability behind the
reference's ``restore_inception_resnet_variables_from_weight``
(net_utils.py:113-134).

Input is 96² (the smallest size that survives the VALID-stride stem to a
1×1 final grid), keeping the single-core TF forward cheap.
"""

import numpy as np
import pytest

import jax

tf = pytest.importorskip("tensorflow")

from tensorflow_yolo2_tpu.compat.tf_import import (  # noqa: E402
    import_inception_resnet_v2_checkpoint,
)
from tensorflow_yolo2_tpu.models.inception import (  # noqa: E402
    InceptionResnetV2,
)

NUM_CLASSES = 7


def _conv_bn(v1, x, f, kh, kw, stride, padding, scope, rng):
    """slim conv2d + batch_norm(scale=False) + relu, eval mode."""
    with v1.variable_scope(scope):
        cin = int(x.shape[-1])
        w = v1.get_variable("weights", initializer=rng.normal(
            0, 0.05, (kh, kw, cin, f)).astype(np.float32))
        x = tf.nn.conv2d(x, w, stride, padding)
        with v1.variable_scope("BatchNorm"):
            beta = v1.get_variable("beta", initializer=rng.normal(
                0, 0.2, f).astype(np.float32))
            mean = v1.get_variable("moving_mean", initializer=rng.normal(
                0, 0.3, f).astype(np.float32))
            var = v1.get_variable(
                "moving_variance",
                initializer=rng.uniform(0.5, 2.0, f).astype(np.float32))
        x = (x - mean) * tf.math.rsqrt(var + 1e-3) + beta
        return tf.nn.relu(x)


def _linear_conv(v1, x, f, scope, rng):
    """slim conv2d with normalizer_fn=None, activation_fn=None (the
    residual up-projection): weights + biases, no BN, no relu."""
    with v1.variable_scope(scope):
        cin = int(x.shape[-1])
        w = v1.get_variable("weights", initializer=rng.normal(
            0, 0.05, (1, 1, cin, f)).astype(np.float32))
        b = v1.get_variable("biases", initializer=rng.normal(
            0, 0.1, f).astype(np.float32))
        return tf.nn.conv2d(x, w, 1, "SAME") + b


def _block35(v1, x, scope, rng, scale=0.17):
    with v1.variable_scope(scope):
        with v1.variable_scope("Branch_0"):
            b0 = _conv_bn(v1, x, 32, 1, 1, 1, "SAME", "Conv2d_1x1", rng)
        with v1.variable_scope("Branch_1"):
            t = _conv_bn(v1, x, 32, 1, 1, 1, "SAME", "Conv2d_0a_1x1", rng)
            b1 = _conv_bn(v1, t, 32, 3, 3, 1, "SAME", "Conv2d_0b_3x3", rng)
        with v1.variable_scope("Branch_2"):
            t = _conv_bn(v1, x, 32, 1, 1, 1, "SAME", "Conv2d_0a_1x1", rng)
            t = _conv_bn(v1, t, 48, 3, 3, 1, "SAME", "Conv2d_0b_3x3", rng)
            b2 = _conv_bn(v1, t, 64, 3, 3, 1, "SAME", "Conv2d_0c_3x3", rng)
        up = _linear_conv(v1, tf.concat([b0, b1, b2], 3),
                          int(x.shape[-1]), "Conv2d_1x1", rng)
        return tf.nn.relu(x + scale * up)


def _block17(v1, x, scope, rng, scale=0.10):
    with v1.variable_scope(scope):
        with v1.variable_scope("Branch_0"):
            b0 = _conv_bn(v1, x, 192, 1, 1, 1, "SAME", "Conv2d_1x1", rng)
        with v1.variable_scope("Branch_1"):
            t = _conv_bn(v1, x, 128, 1, 1, 1, "SAME", "Conv2d_0a_1x1", rng)
            t = _conv_bn(v1, t, 160, 1, 7, 1, "SAME", "Conv2d_0b_1x7", rng)
            b1 = _conv_bn(v1, t, 192, 7, 1, 1, "SAME", "Conv2d_0c_7x1", rng)
        up = _linear_conv(v1, tf.concat([b0, b1], 3),
                          int(x.shape[-1]), "Conv2d_1x1", rng)
        return tf.nn.relu(x + scale * up)


def _block8(v1, x, scope, rng, scale=0.20, relu=True):
    with v1.variable_scope(scope):
        with v1.variable_scope("Branch_0"):
            b0 = _conv_bn(v1, x, 192, 1, 1, 1, "SAME", "Conv2d_1x1", rng)
        with v1.variable_scope("Branch_1"):
            t = _conv_bn(v1, x, 192, 1, 1, 1, "SAME", "Conv2d_0a_1x1", rng)
            t = _conv_bn(v1, t, 224, 1, 3, 1, "SAME", "Conv2d_0b_1x3", rng)
            b1 = _conv_bn(v1, t, 256, 3, 1, 1, "SAME", "Conv2d_0c_3x1", rng)
        up = _linear_conv(v1, tf.concat([b0, b1], 3),
                          int(x.shape[-1]), "Conv2d_1x1", rng)
        out = x + scale * up
        return tf.nn.relu(out) if relu else out


def build_tf_inception_resnet_v2(v1, images, rng):
    cb = lambda x, f, k, s, p, n: _conv_bn(v1, x, f, k, k, s, p, n, rng)
    with v1.variable_scope("InceptionResnetV2"):
        x = tf.constant(images)
        x = cb(x, 32, 3, 2, "VALID", "Conv2d_1a_3x3")
        x = cb(x, 32, 3, 1, "VALID", "Conv2d_2a_3x3")
        x = cb(x, 64, 3, 1, "SAME", "Conv2d_2b_3x3")
        x = tf.nn.max_pool2d(x, 3, 2, "VALID")
        x = cb(x, 80, 1, 1, "VALID", "Conv2d_3b_1x1")
        x = cb(x, 192, 3, 1, "VALID", "Conv2d_4a_3x3")
        x = tf.nn.max_pool2d(x, 3, 2, "VALID")
        with v1.variable_scope("Mixed_5b"):
            with v1.variable_scope("Branch_0"):
                b0 = cb(x, 96, 1, 1, "SAME", "Conv2d_1x1")
            with v1.variable_scope("Branch_1"):
                t = cb(x, 48, 1, 1, "SAME", "Conv2d_0a_1x1")
                b1 = cb(t, 64, 5, 1, "SAME", "Conv2d_0b_5x5")
            with v1.variable_scope("Branch_2"):
                t = cb(x, 64, 1, 1, "SAME", "Conv2d_0a_1x1")
                t = cb(t, 96, 3, 1, "SAME", "Conv2d_0b_3x3")
                b2 = cb(t, 96, 3, 1, "SAME", "Conv2d_0c_3x3")
            with v1.variable_scope("Branch_3"):
                pool = tf.nn.avg_pool2d(x, 3, 1, "SAME")
                b3 = cb(pool, 64, 1, 1, "SAME", "Conv2d_0b_1x1")
            x = tf.concat([b0, b1, b2, b3], 3)
        with v1.variable_scope("Repeat"):
            for k in range(1, 11):
                x = _block35(v1, x, f"block35_{k}", rng)
        with v1.variable_scope("Mixed_6a"):
            with v1.variable_scope("Branch_0"):
                b0 = cb(x, 384, 3, 2, "VALID", "Conv2d_1a_3x3")
            with v1.variable_scope("Branch_1"):
                t = cb(x, 256, 1, 1, "SAME", "Conv2d_0a_1x1")
                t = cb(t, 256, 3, 1, "SAME", "Conv2d_0b_3x3")
                b1 = cb(t, 384, 3, 2, "VALID", "Conv2d_1a_3x3")
            x = tf.concat([b0, b1, tf.nn.max_pool2d(x, 3, 2, "VALID")], 3)
        with v1.variable_scope("Repeat_1"):
            for k in range(1, 21):
                x = _block17(v1, x, f"block17_{k}", rng)
        with v1.variable_scope("Mixed_7a"):
            with v1.variable_scope("Branch_0"):
                t = cb(x, 256, 1, 1, "SAME", "Conv2d_0a_1x1")
                b0 = cb(t, 384, 3, 2, "VALID", "Conv2d_1a_3x3")
            with v1.variable_scope("Branch_1"):
                t = cb(x, 256, 1, 1, "SAME", "Conv2d_0a_1x1")
                b1 = cb(t, 288, 3, 2, "VALID", "Conv2d_1a_3x3")
            with v1.variable_scope("Branch_2"):
                t = cb(x, 256, 1, 1, "SAME", "Conv2d_0a_1x1")
                t = cb(t, 288, 3, 1, "SAME", "Conv2d_0b_3x3")
                b2 = cb(t, 320, 3, 2, "VALID", "Conv2d_1a_3x3")
            x = tf.concat(
                [b0, b1, b2, tf.nn.max_pool2d(x, 3, 2, "VALID")], 3)
        with v1.variable_scope("Repeat_2"):
            for k in range(1, 10):
                x = _block8(v1, x, f"block8_{k}", rng)
        x = _block8(v1, x, "Block8", rng, scale=1.0, relu=False)
        x = cb(x, 1536, 1, 1, "SAME", "Conv2d_7b_1x1")
        x = tf.reduce_mean(x, axis=(1, 2))
        with v1.variable_scope("Logits"):
            with v1.variable_scope("Logits"):
                w = v1.get_variable("weights", initializer=rng.normal(
                    0, 0.05, (1536, NUM_CLASSES)).astype(np.float32))
                b = v1.get_variable("biases", initializer=rng.normal(
                    0, 0.1, NUM_CLASSES).astype(np.float32))
            x = tf.matmul(x, w) + b
        return x


@pytest.fixture(scope="module")
def slim_ckpt(tmp_path_factory):
    """(ckpt path, tf logits, input images) from a slim-convention graph."""
    rng = np.random.RandomState(7)
    images = rng.uniform(-1, 1, (1, 96, 96, 3)).astype(np.float32)
    v1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        out = build_tf_inception_resnet_v2(v1, images, rng)
        saver = v1.train.Saver()
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out = sess.run(out)
            ckpt = str(tmp_path_factory.mktemp("irv2")
                       / "inception_resnet_v2.ckpt")
            saver.save(sess, ckpt)
    return ckpt, tf_out, images


@pytest.mark.slow
def test_inception_resnet_v2_import_forward_parity(slim_ckpt):
    ckpt, tf_out, images = slim_ckpt
    params, stats = import_inception_resnet_v2_checkpoint(ckpt)
    model = InceptionResnetV2(num_classes=NUM_CLASSES)
    got = model.apply({"params": params, "batch_stats": stats},
                      jax.numpy.asarray(images), train=False)
    got = np.asarray(got)
    assert got.shape == tf_out.shape == (1, NUM_CLASSES)
    # fp32 accumulation-order differences through ~100 convs
    np.testing.assert_allclose(got, tf_out, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_warm_start_contrast_model_from_slim_ckpt(slim_ckpt):
    """The adversarial classifier (ContrastInputModel wrapping the
    backbone) warm-starts from slim weights by name/shape intersection:
    every backbone tensor is grafted, the 15-channel input-transform conv
    keeps its fresh init (the reference's exclusion semantics,
    net_utils.py:113-134)."""
    from tensorflow_yolo2_tpu.models.contrast import ContrastInputModel
    from tensorflow_yolo2_tpu.train.checkpoint import merge_pytrees

    ckpt, _, images = slim_ckpt
    model = ContrastInputModel(
        backbone=InceptionResnetV2(num_classes=NUM_CLASSES))
    variables = model.init(jax.random.PRNGKey(0),
                           jax.numpy.asarray(images), train=False)

    bk_params, bk_stats = import_inception_resnet_v2_checkpoint(ckpt)
    n_bk = len(jax.tree_util.tree_leaves(bk_params))
    merged, n = merge_pytrees(variables["params"], {"backbone": bk_params})
    assert n == n_bk  # every imported tensor found its slot
    _, n_stats = merge_pytrees(variables["batch_stats"],
                               {"backbone": bk_stats})
    assert n_stats == len(jax.tree_util.tree_leaves(bk_stats))
    # the input transform is NOT in the checkpoint and keeps its init
    np.testing.assert_array_equal(
        np.asarray(merged["input_transform"]["kernel"]),
        np.asarray(variables["params"]["input_transform"]["kernel"]))
    # a deep backbone leaf actually changed
    got = np.asarray(
        merged["backbone"]["block8_post"]["up"]["kernel"])
    assert not np.array_equal(
        got,
        np.asarray(variables["params"]["backbone"]["block8_post"]["up"]
                   ["kernel"]))
