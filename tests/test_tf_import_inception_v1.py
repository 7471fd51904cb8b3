"""inception_v1 TF-checkpoint-import forward-parity test.

Builds a TF graph with slim's inception_v1 variable naming (scopes per
the vendored net, reference src/slim_dir/nets/inception_v1.py:30-245),
saves a checkpoint with random weights, imports via compat.tf_import,
and asserts the Flax InceptionV1's logits match the TF graph — the
capability behind slim's released-checkpoint warm-start
(finetune_inception_v1_on_flowers.sh; _get_init_fn,
yolo1-resnet-adv.py:146-189).
"""

import numpy as np
import pytest

import jax

tf = pytest.importorskip("tensorflow")

from tensorflow_yolo2_tpu.compat.tf_import import (  # noqa: E402
    import_checkpoint_for,
    import_inception_v1_checkpoint,
)
from tensorflow_yolo2_tpu.models.inception import InceptionV1  # noqa: E402

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


# slim channel spec per block: (scope, b0, (b1a, b1b), (b2a, b2b), b3)
_BLOCKS = [
    ("Mixed_3b", 64, (96, 128), (16, 32), 32),
    ("Mixed_3c", 128, (128, 192), (32, 96), 64), ("MaxPool_4a", 0, 0, 0, 0),
    ("Mixed_4b", 192, (96, 208), (16, 48), 64),
    ("Mixed_4c", 160, (112, 224), (24, 64), 64),
    ("Mixed_4d", 128, (128, 256), (24, 64), 64),
    ("Mixed_4e", 112, (144, 288), (32, 64), 64),
    ("Mixed_4f", 256, (160, 320), (32, 128), 128),
    ("MaxPool_5a", 0, 0, 0, 0),
    ("Mixed_5b", 256, (160, 320), (32, 128), 128),
    ("Mixed_5c", 384, (192, 384), (48, 128), 128),
]


def build_tf_inception_v1(v1, images, rng):
    cb = lambda x, f, kh, kw, s, p, n: _conv_bn(v1, x, f, kh, kw, s, p, n,
                                                rng)
    with v1.variable_scope("InceptionV1"):
        x = tf.constant(images)
        x = cb(x, 64, 7, 7, 2, "SAME", "Conv2d_1a_7x7")
        x = tf.nn.max_pool2d(x, 3, 2, "SAME")
        x = cb(x, 64, 1, 1, 1, "SAME", "Conv2d_2b_1x1")
        x = cb(x, 192, 3, 3, 1, "SAME", "Conv2d_2c_3x3")
        x = tf.nn.max_pool2d(x, 3, 2, "SAME")

        for scope, b0, b1, b2, b3 in _BLOCKS:
            if scope == "MaxPool_4a":
                x = tf.nn.max_pool2d(x, 3, 2, "SAME")
                continue
            if scope == "MaxPool_5a":
                # slim quirk: the last inter-stage pool is 2×2
                # (inception_v1.py:207-208)
                x = tf.nn.max_pool2d(x, 2, 2, "SAME")
                continue
            with v1.variable_scope(scope):
                with v1.variable_scope("Branch_0"):
                    br0 = cb(x, b0, 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                with v1.variable_scope("Branch_1"):
                    t = cb(x, b1[0], 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    br1 = cb(t, b1[1], 3, 3, 1, "SAME", "Conv2d_0b_3x3")
                with v1.variable_scope("Branch_2"):
                    t = cb(x, b2[0], 1, 1, 1, "SAME", "Conv2d_0a_1x1")
                    # slim naming quirk: Mixed_5b's conv is Conv2d_0a_3x3
                    # (inception_v1.py:221)
                    name = ("Conv2d_0a_3x3" if scope == "Mixed_5b"
                            else "Conv2d_0b_3x3")
                    br2 = cb(t, b2[1], 3, 3, 1, "SAME", name)
                with v1.variable_scope("Branch_3"):
                    t = tf.nn.max_pool2d(x, 3, 1, "SAME")
                    br3 = cb(t, b3, 1, 1, 1, "SAME", "Conv2d_0b_1x1")
                x = tf.concat([br0, br1, br2, br3], 3)

        x = tf.reduce_mean(x, axis=(1, 2), keepdims=True)
        with v1.variable_scope("Logits"):
            with v1.variable_scope("Conv2d_0c_1x1"):
                w = v1.get_variable("weights", initializer=rng.normal(
                    0, 0.02, (1, 1, 1024, NUM_CLASSES)).astype(np.float32))
                b = v1.get_variable("biases", initializer=rng.normal(
                    0, 0.05, NUM_CLASSES).astype(np.float32))
                x = tf.nn.conv2d(x, w, 1, "SAME") + b
        return tf.squeeze(x, (1, 2))


@pytest.mark.slow
def test_inception_v1_import_forward_parity(tmp_path):
    rng = np.random.RandomState(17)
    images = rng.uniform(-1, 1, (1, 224, 224, 3)).astype(np.float32)
    v1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        out = build_tf_inception_v1(v1, images, rng)
        saver = v1.train.Saver()
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            tf_out = sess.run(out)
            ckpt = str(tmp_path / "inception_v1.ckpt")
            saver.save(sess, ckpt)

    params, stats = import_inception_v1_checkpoint(ckpt)
    model = InceptionV1(num_classes=NUM_CLASSES)
    got = model.apply({"params": params, "batch_stats": stats},
                      jax.numpy.asarray(images), train=False)
    np.testing.assert_allclose(np.asarray(got), tf_out,
                               rtol=5e-3, atol=5e-3)
    # the family dispatcher resolves the same importer
    p2, _ = import_checkpoint_for("inception_v1", ckpt)
    np.testing.assert_array_equal(
        np.asarray(p2["mixed_5b"]["b2b"]["conv"]["kernel"]),
        np.asarray(params["mixed_5b"]["b2b"]["conv"]["kernel"]))


@pytest.mark.slow
def test_train_classifier_warm_starts_from_tf_checkpoint(tmp_root, capsys):
    """slim _get_init_fn parity: train_classifier --checkpoint-path takes
    a released TF zoo checkpoint directly (here a generated slim-naming
    inception_v1 ckpt), minus --checkpoint-exclude-scopes, and fine-tunes
    (the finetune_inception_v1_on_flowers.sh warm-start,
    reference train_image_classifier.py:372-398)."""
    from tests import synthetic

    from tensorflow_yolo2_tpu.entries import train_classifier

    synthetic.make_flowers(str(tmp_root / "data" / "TF_flowers"),
                           per_class=4)

    rng = np.random.RandomState(23)
    images = np.zeros((1, 64, 64, 3), np.float32)
    v1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        build_tf_inception_v1(v1, images, rng)
        saver = v1.train.Saver()
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            ckpt = str(tmp_root / "inception_v1.ckpt")
            saver.save(sess, ckpt)

    rc = train_classifier.main([
        "--model-name", "inception_v1", "--dataset-name", "flowers",
        "--image-size", "64", "--iters", "2", "--batch-size", "4",
        "--num-workers", "1", "--optimizer", "sgd",
        "--learning-rate", "0.001", "--compute-dtype", "float32",
        "--save-every", "2",
        "--checkpoint-path", ckpt,
        "--checkpoint-exclude-scopes", "logits"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Imported TF checkpoint" in out
    # 3 stem + 9 blocks × 6 branch convs = 57 conv+BN pairs restored
    # (kernel + beta each; mean + var each in stats); logits excluded
    assert "Warm-started 114 param + 114 batch-stat tensors" in out


@pytest.mark.slow
def test_eval_classifier_scores_tf_checkpoint(tmp_root, capsys):
    """slim eval_image_classifier parity: --tf-checkpoint evaluates a
    released TF zoo checkpoint directly, no framework snapshot involved
    (reference eval_image_classifier.py:40-43,150-187)."""
    from tests import synthetic

    from tensorflow_yolo2_tpu.entries import eval_classifier

    # 5 classes to match the generated checkpoint's logits head (a
    # class-count mismatch would drop the head by shape intersection)
    synthetic.make_flowers(str(tmp_root / "data" / "TF_flowers"),
                           classes=("a", "b", "c", "d", "e"), per_class=4)

    rng = np.random.RandomState(29)
    images = np.zeros((1, 64, 64, 3), np.float32)
    v1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        build_tf_inception_v1(v1, images, rng)
        saver = v1.train.Saver()
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            ckpt = str(tmp_root / "inception_v1_eval.ckpt")
            saver.save(sess, ckpt)

    rc = eval_classifier.main([
        "--model-name", "inception_v1", "--dataset-name", "flowers",
        "--image-size", "64", "--batch-size", "4", "--max-batches", "2",
        "--compute-dtype", "float32",
        "--tf-checkpoint", ckpt])
    assert rc == 0
    out = capsys.readouterr().out
    # full net + logits head restored (57 conv/BN pairs + kernel/bias)
    assert "Imported 116 param + 114 batch-stat tensors" in out
    assert "accuracy" in out
