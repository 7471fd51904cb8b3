"""inception_v3 / vgg_16 TF-checkpoint-import forward-parity tests.

Builds TF graphs with slim's variable naming (scopes per the vendored
nets src/slim_dir/nets/inception_v3.py and vgg.py), saves checkpoints
with random weights, imports via compat.tf_import, and asserts the Flax
models' logits match the TF graphs — the capability behind the
reference's pretrained-inception_v3 FGSM generator warm-start
(imagenet_train_inception_resnet.py:26-69) and slim's _get_init_fn
released-checkpoint fine-tuning (yolo1-resnet-adv.py:146-189).

inception_v3 runs at 160² (smallest VALID-stem-safe size; the aux tower's
kernel auto-reduces exactly as slim's
_reduced_kernel_size_for_small_input does).
"""

import numpy as np
import pytest

import jax

tf = pytest.importorskip("tensorflow")

from tensorflow_yolo2_tpu.compat.tf_import import (  # noqa: E402
    import_checkpoint_for,
    import_inception_v3_checkpoint,
    import_vgg_checkpoint,
)
from tensorflow_yolo2_tpu.models.inception import InceptionV3  # noqa: E402
from tensorflow_yolo2_tpu.models.zoo import VGG  # noqa: E402

NUM_CLASSES = 5


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


def _avgpool_incl(x):
    """slim avg_pool2d 3×3/1 SAME counts only valid frame (cv-style);
    tf.nn.avg_pool2d SAME matches count_include_pad=False semantics."""
    return tf.nn.avg_pool2d(x, 3, 1, "SAME")


def build_tf_inception_v3(v1, images, rng):
    cb = lambda x, f, kh, kw, s, p, n: _conv_bn(v1, x, f, kh, kw, s, p, n,
                                                rng)
    with v1.variable_scope("InceptionV3"):
        x = tf.constant(images)
        x = cb(x, 32, 3, 3, 2, "VALID", "Conv2d_1a_3x3")
        x = cb(x, 32, 3, 3, 1, "VALID", "Conv2d_2a_3x3")
        x = cb(x, 64, 3, 3, 1, "SAME", "Conv2d_2b_3x3")
        x = tf.nn.max_pool2d(x, 3, 2, "VALID")
        x = cb(x, 80, 1, 1, 1, "VALID", "Conv2d_3b_1x1")
        x = cb(x, 192, 3, 3, 1, "VALID", "Conv2d_4a_3x3")
        x = tf.nn.max_pool2d(x, 3, 2, "VALID")

        def mixed_a(x, scope, pool_f, quirk_5c=False):
            b1a = ("Conv2d_0b_1x1" if quirk_5c else "Conv2d_0a_1x1")
            b1b = ("Conv_1_0c_5x5" if quirk_5c else "Conv2d_0b_5x5")
            with v1.variable_scope(scope):
                with v1.variable_scope("Branch_0"):
                    b0 = cb(x, 64, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                with v1.variable_scope("Branch_1"):
                    t = cb(x, 48, 1, 1, 1, "SAME", b1a)
                    b1 = cb(t, 64, 5, 5, 1, "SAME", b1b)
                with v1.variable_scope("Branch_2"):
                    t = cb(x, 64, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    t = cb(t, 96, 3, 3, 1, "SAME", "Conv2d_0b_3x3")
                    b2 = cb(t, 96, 3, 3, 1, "SAME", "Conv2d_0c_3x3")
                with v1.variable_scope("Branch_3"):
                    b3 = cb(_avgpool_incl(x), pool_f, 1, 1, 1, "SAME",
                            "Conv2d_0b_1x1")
                return tf.concat([b0, b1, b2, b3], 3)

        x = mixed_a(x, "Mixed_5b", 32)
        x = mixed_a(x, "Mixed_5c", 64, quirk_5c=True)
        x = mixed_a(x, "Mixed_5d", 64)

        with v1.variable_scope("Mixed_6a"):
            with v1.variable_scope("Branch_0"):
                b0 = cb(x, 384, 3, 3, 2, "VALID", "Conv2d_1a_1x1")
            with v1.variable_scope("Branch_1"):
                t = cb(x, 64, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                t = cb(t, 96, 3, 3, 1, "SAME", "Conv2d_0b_3x3")
                b1 = cb(t, 96, 3, 3, 2, "VALID", "Conv2d_1a_1x1")
            x = tf.concat([b0, b1, tf.nn.max_pool2d(x, 3, 2, "VALID")], 3)

        def mixed_b(x, scope, c7):
            with v1.variable_scope(scope):
                with v1.variable_scope("Branch_0"):
                    b0 = cb(x, 192, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                with v1.variable_scope("Branch_1"):
                    t = cb(x, c7, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    t = cb(t, c7, 1, 7, 1, "SAME", "Conv2d_0b_1x7")
                    b1 = cb(t, 192, 7, 1, 1, "SAME", "Conv2d_0c_7x1")
                with v1.variable_scope("Branch_2"):
                    t = cb(x, c7, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    t = cb(t, c7, 7, 1, 1, "SAME", "Conv2d_0b_7x1")
                    t = cb(t, c7, 1, 7, 1, "SAME", "Conv2d_0c_1x7")
                    t = cb(t, c7, 7, 1, 1, "SAME", "Conv2d_0d_7x1")
                    b2 = cb(t, 192, 1, 7, 1, "SAME", "Conv2d_0e_1x7")
                with v1.variable_scope("Branch_3"):
                    b3 = cb(_avgpool_incl(x), 192, 1, 1, 1, "SAME",
                            "Conv2d_0b_1x1")
                return tf.concat([b0, b1, b2, b3], 3)

        for scope, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160),
                          ("Mixed_6d", 160), ("Mixed_6e", 192)):
            x = mixed_b(x, scope, c7)

        # aux tower off Mixed_6e (inception_v3.py:497-523)
        with v1.variable_scope("AuxLogits"):
            a = tf.nn.avg_pool2d(x, 5, 3, "VALID")
            a = cb(a, 128, 1, 1, 1, "SAME", "Conv2d_1b_1x1")
            k = min(5, int(a.shape[1]))
            a = cb(a, 768, k, k, 1, "VALID", "Conv2d_2a_5x5")
            with v1.variable_scope("Conv2d_2b_1x1"):
                w = v1.get_variable("weights", initializer=rng.normal(
                    0, 0.01, (1, 1, 768, NUM_CLASSES)).astype(np.float32))
                b = v1.get_variable("biases", initializer=rng.normal(
                    0, 0.05, NUM_CLASSES).astype(np.float32))
                a = tf.nn.conv2d(a, w, 1, "SAME") + b
            aux = tf.reduce_mean(a, axis=(1, 2))

        with v1.variable_scope("Mixed_7a"):
            with v1.variable_scope("Branch_0"):
                t = cb(x, 192, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                b0 = cb(t, 320, 3, 3, 2, "VALID", "Conv2d_1a_3x3")
            with v1.variable_scope("Branch_1"):
                t = cb(x, 192, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                t = cb(t, 192, 1, 7, 1, "SAME", "Conv2d_0b_1x7")
                t = cb(t, 192, 7, 1, 1, "SAME", "Conv2d_0c_7x1")
                b1 = cb(t, 192, 3, 3, 2, "VALID", "Conv2d_1a_3x3")
            x = tf.concat([b0, b1, tf.nn.max_pool2d(x, 3, 2, "VALID")], 3)

        def mixed_c(x, scope, second_split):
            with v1.variable_scope(scope):
                with v1.variable_scope("Branch_0"):
                    b0 = cb(x, 320, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                with v1.variable_scope("Branch_1"):
                    t = cb(x, 384, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    b1 = tf.concat([
                        cb(t, 384, 1, 3, 1, "SAME", "Conv2d_0b_1x3"),
                        cb(t, 384, 3, 1, 1, "SAME", second_split)], 3)
                with v1.variable_scope("Branch_2"):
                    t = cb(x, 448, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    t = cb(t, 384, 3, 3, 1, "SAME", "Conv2d_0b_3x3")
                    b2 = tf.concat([
                        cb(t, 384, 1, 3, 1, "SAME", "Conv2d_0c_1x3"),
                        cb(t, 384, 3, 1, 1, "SAME", "Conv2d_0d_3x1")], 3)
                with v1.variable_scope("Branch_3"):
                    b3 = cb(_avgpool_incl(x), 192, 1, 1, 1, "SAME",
                            "Conv2d_0b_1x1")
                return tf.concat([b0, b1, b2, b3], 3)

        x = mixed_c(x, "Mixed_7b", "Conv2d_0b_3x1")
        x = mixed_c(x, "Mixed_7c", "Conv2d_0c_3x1")

        x = tf.reduce_mean(x, axis=(1, 2), keepdims=True)
        with v1.variable_scope("Logits"):
            with v1.variable_scope("Conv2d_1c_1x1"):
                w = v1.get_variable("weights", initializer=rng.normal(
                    0, 0.02, (1, 1, 2048, NUM_CLASSES)).astype(np.float32))
                b = v1.get_variable("biases", initializer=rng.normal(
                    0, 0.05, NUM_CLASSES).astype(np.float32))
                x = tf.nn.conv2d(x, w, 1, "SAME") + b
        return tf.squeeze(x, (1, 2)), aux


@pytest.mark.slow
def test_inception_v3_import_forward_parity(tmp_path):
    rng = np.random.RandomState(11)
    images = rng.uniform(-1, 1, (1, 160, 160, 3)).astype(np.float32)
    v1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        out, aux_out = build_tf_inception_v3(v1, images, rng)
        saver = v1.train.Saver()
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out, tf_aux = sess.run([out, aux_out])
            ckpt = str(tmp_path / "inception_v3.ckpt")
            saver.save(sess, ckpt)

    params, stats = import_inception_v3_checkpoint(ckpt)
    model = InceptionV3(num_classes=NUM_CLASSES, aux_logits=True)
    got, got_aux = model.apply({"params": params, "batch_stats": stats},
                               jax.numpy.asarray(images), train=False)
    np.testing.assert_allclose(np.asarray(got), tf_out,
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_aux), tf_aux,
                               rtol=5e-3, atol=5e-3)
    # the family dispatcher resolves the same importer
    p2, _ = import_checkpoint_for("inception_v3", ckpt)
    np.testing.assert_array_equal(
        np.asarray(p2["mixed7_1"]["b0"]["conv"]["kernel"]),
        np.asarray(params["mixed7_1"]["b0"]["conv"]["kernel"]))


@pytest.mark.slow
def test_vgg_16_import_forward_parity(tmp_path):
    rng = np.random.RandomState(13)
    images = rng.uniform(-1, 1, (1, 224, 224, 3)).astype(np.float32)
    v1 = tf.compat.v1
    stages = (2, 2, 3, 3, 3)
    widths = (64, 128, 256, 512, 512)

    def conv_relu(x, f, kh, kw, padding, scope):
        with v1.variable_scope(scope):
            cin = int(x.shape[-1])
            w = v1.get_variable("weights", initializer=rng.normal(
                0, 0.03, (kh, kw, cin, f)).astype(np.float32))
            b = v1.get_variable("biases", initializer=rng.normal(
                0, 0.05, f).astype(np.float32))
            return tf.nn.relu(tf.nn.conv2d(x, w, 1, padding) + b)

    graph = tf.Graph()
    with graph.as_default():
        with v1.variable_scope("vgg_16"):
            x = tf.constant(images)
            for si, (n, w_) in enumerate(zip(stages, widths), start=1):
                with v1.variable_scope(f"conv{si}"):
                    for ci in range(1, n + 1):
                        x = conv_relu(x, w_, 3, 3, "SAME",
                                      f"conv{si}_{ci}")
                x = tf.nn.max_pool2d(x, 2, 2, "VALID")
            x = conv_relu(x, 4096, 7, 7, "VALID", "fc6")
            x = conv_relu(x, 4096, 1, 1, "SAME", "fc7")
            with v1.variable_scope("fc8"):
                w = v1.get_variable("weights", initializer=rng.normal(
                    0, 0.02, (1, 1, 4096, NUM_CLASSES)).astype(np.float32))
                b = v1.get_variable("biases", initializer=rng.normal(
                    0, 0.05, NUM_CLASSES).astype(np.float32))
                x = tf.nn.conv2d(x, w, 1, "SAME") + b
            out = tf.reduce_mean(x, axis=(1, 2))
        saver = v1.train.Saver()
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out = sess.run(out)
            ckpt = str(tmp_path / "vgg_16.ckpt")
            saver.save(sess, ckpt)

    params, stats = import_vgg_checkpoint(ckpt, "vgg_16")
    assert stats == {}
    model = VGG(stages=stages, num_classes=NUM_CLASSES)
    got = model.apply({"params": params}, jax.numpy.asarray(images),
                      train=False)
    np.testing.assert_allclose(np.asarray(got), tf_out,
                               rtol=2e-3, atol=2e-3)
