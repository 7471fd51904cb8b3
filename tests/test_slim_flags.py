"""Slim trainer flag-surface tail: label smoothing + labels offset.

Reference semantics: slim train_image_classifier.py —
``label_smoothing`` (:142) blends the one-hot CE target on the main AND
aux losses (:474-477); ``labels_offset`` (:178) shrinks the logits layer
to num_classes-offset (:422) and shifts the dataset labels down (:444)
(the vgg/resnet no-background-class convention; eval twin at
eval_image_classifier.py:62,104,116).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tensorflow_yolo2_tpu.train.trainer import softmax_task


def _manual_smoothed_ce(logits, labels, eps):
    k = logits.shape[-1]
    onehot = np.eye(k, dtype=np.float64)[labels]
    target = onehot * (1.0 - eps) + eps / k
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits)), np.float64)
    return float(np.mean(-(target * logp).sum(-1)))


def test_label_smoothing_matches_manual(rng):
    logits = rng.normal(0, 2, (8, 5)).astype(np.float32)
    labels = rng.randint(0, 5, 8).astype(np.int32)
    eps = 0.1
    task = softmax_task(label_smoothing=eps)
    loss, metrics = task(jnp.asarray(logits), jnp.asarray(labels))
    want = _manual_smoothed_ce(logits, labels, eps)
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    # smoothing strictly increases the loss of a confident correct model
    conf = 10.0 * np.eye(5, dtype=np.float32)[labels]
    plain, _ = softmax_task()(jnp.asarray(conf), jnp.asarray(labels))
    smooth, _ = task(jnp.asarray(conf), jnp.asarray(labels))
    assert float(smooth) > float(plain)


def test_label_smoothing_zero_is_plain_ce(rng):
    logits = rng.normal(0, 2, (8, 5)).astype(np.float32)
    labels = rng.randint(0, 5, 8).astype(np.int32)
    l0, _ = softmax_task(label_smoothing=0.0)(jnp.asarray(logits),
                                              jnp.asarray(labels))
    want = float(jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        jnp.asarray(logits), jnp.asarray(labels))))
    np.testing.assert_allclose(float(l0), want, rtol=1e-6)


def test_label_smoothing_applies_to_aux_head(rng):
    """The aux CE term smooths too (slim :474 smooths the aux loss)."""
    logits = rng.normal(0, 2, (8, 5)).astype(np.float32)
    aux = rng.normal(0, 2, (8, 5)).astype(np.float32)
    labels = rng.randint(0, 5, 8).astype(np.int32)
    eps = 0.2
    task = softmax_task(aux_weight=0.4, label_smoothing=eps)
    loss, metrics = task((jnp.asarray(logits), jnp.asarray(aux)),
                         jnp.asarray(labels))
    want = (_manual_smoothed_ce(logits, labels, eps)
            + 0.4 * _manual_smoothed_ce(aux, labels, eps))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["aux_loss"]),
                               _manual_smoothed_ce(aux, labels, eps),
                               rtol=1e-5)


@pytest.mark.slow
def test_labels_offset_trains_and_shrinks_logits(tmp_root):
    """--labels-offset K: logits layer has num_class-K outputs and the
    run trains/saves (slim train_image_classifier.py:422,444)."""
    from tensorflow_yolo2_tpu.entries import train_classifier
    from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager

    rc = train_classifier.main([
        "--model-name", "lenet", "--dataset-name", "synthetic-bg",
        "--iters", "2", "--batch-size", "8", "--num-workers", "1",
        "--optimizer", "sgd", "--learning-rate", "0.01",
        "--compute-dtype", "float32", "--save-every", "2",
        "--labels-offset", "1", "--label-smoothing", "0.1"])
    assert rc == 0
    mgr = CheckpointManager("lenet", "synthetic_10")
    state = mgr.restore_raw()
    # synthetic has 10 classes; offset 1 → 9-way logits (lenet fc4)
    assert state["params"]["fc4"]["kernel"].shape[-1] == 9


def test_labels_offset_out_of_range_rejected(tmp_root):
    from tensorflow_yolo2_tpu.entries import train_classifier

    with pytest.raises(SystemExit):
        train_classifier.main([
            "--model-name", "lenet", "--dataset-name", "synthetic",
            "--iters", "1", "--batch-size", "8",
            "--labels-offset", "10"])
