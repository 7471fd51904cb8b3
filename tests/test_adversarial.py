"""Adversarial capability tests: FGSM increases loss, contrast features
match a hand-rolled computation, sign-noise stays in range."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_yolo2_tpu.models.contrast import ContrastInputModel
from tensorflow_yolo2_tpu.models.zoo import LeNet
from tensorflow_yolo2_tpu.train.adversarial import (
    fgsm,
    make_attack_loss,
    random_sign_noise,
)
from tensorflow_yolo2_tpu.utils.helpers import (
    add_contrast_channels,
    compare_label_values,
)


def test_contrast_channels_match_manual(rng):
    x = rng.normal(0, 1, (2, 8, 8, 3)).astype(np.float32)
    out = np.asarray(add_contrast_channels(jnp.asarray(x)))
    assert out.shape == (2, 8, 8, 15)
    np.testing.assert_array_equal(out[..., :3], x)
    # up-neighbor |Δ|, zero first row (helpers.py:57-58 semantics)
    np.testing.assert_allclose(out[:, 1:, :, 3:6],
                               np.abs(x[:, 1:] - x[:, :-1]), rtol=1e-6)
    np.testing.assert_array_equal(out[:, 0, :, 3:6], 0.0)
    # left-neighbor |Δ|, zero first col
    np.testing.assert_allclose(out[:, :, 1:, 9:12],
                               np.abs(x[:, :, 1:] - x[:, :, :-1]), rtol=1e-6)
    np.testing.assert_array_equal(out[:, :, 0, 9:12], 0.0)


def test_fgsm_increases_loss(rng):
    model = LeNet(num_classes=4)
    # inputs inside the clip range so the ε bound check is exact
    x = rng.uniform(-0.9, 0.9, (4, 28, 28, 3)).astype(np.float32)
    labels = np.array([0, 1, 2, 3], np.int32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    loss_fn = make_attack_loss(model, variables, labels)
    clean_loss = float(loss_fn(x))
    adv = fgsm(loss_fn, jnp.asarray(x), epsilon=0.05)
    adv_loss = float(loss_fn(adv))
    assert adv_loss > clean_loss
    assert float(jnp.max(jnp.abs(adv - x))) <= 0.05 + 1e-6


def test_random_sign_noise_bounds(rng):
    x = rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)
    out = random_sign_noise(jax.random.PRNGKey(0), jnp.asarray(x))
    assert float(jnp.max(out)) <= 1.0 and float(jnp.min(out)) >= -1.0
    delta = np.abs(np.asarray(out) - x)
    # every pixel moved by exactly ε (unless clipped)
    moved = delta[(np.asarray(out) < 1.0) & (np.asarray(out) > -1.0)]
    eps_set = {round(float(e) / 255 * 2, 6) for e in (4, 8, 12, 16)}
    assert all(round(float(d), 6) in eps_set for d in moved.ravel()[:50])


def test_contrast_input_model_forward(rng):
    model = ContrastInputModel(backbone=LeNet(num_classes=5))
    x = rng.normal(0, 1, (2, 28, 28, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 5)
    # the 15→3 transform conv exists
    assert variables["params"]["input_transform"]["kernel"].shape == \
        (3, 3, 15, 3)


def test_compare_label_values():
    count, acc = compare_label_values([1, 2, 3, 4], [1, 2, 0, 4])
    assert count == 3 and acc == 0.75


def test_transfer_attack_uses_generator_not_classifier(rng):
    """FGSM against a separate frozen generator must raise the
    *generator's* loss (reference transfer attack: a pretrained
    inception_v3 crafts the examples)."""
    from tensorflow_yolo2_tpu.train.adversarial import make_jitted_attack
    from tensorflow_yolo2_tpu.models.zoo import CifarNet

    gen = CifarNet(num_classes=4)
    x = rng.uniform(-0.9, 0.9, (4, 32, 32, 3)).astype(np.float32)
    labels = np.array([0, 1, 2, 3], np.int32)
    gvars = gen.init(jax.random.PRNGKey(1), x, train=False)
    attack = make_jitted_attack(gen, epsilon=0.05)
    adv = attack(gvars["params"], gvars.get("batch_stats", {}),
                 jnp.asarray(x), jnp.asarray(labels))
    loss_fn = make_attack_loss(gen, gvars, labels)
    assert float(loss_fn(adv)) > float(loss_fn(x))
    assert float(jnp.max(jnp.abs(adv - jnp.asarray(x)))) <= 0.05 + 1e-6


@pytest.mark.slow
def test_adversarial_entry_with_generator(tmp_root, ilsvrc_dir):
    """imagenet_train_adversarial end-to-end with --attack-model (separate
    generator) and the 4 metric streams (train/val × clean/adv)."""
    from tensorflow_yolo2_tpu.entries import imagenet_train_adversarial

    rc = imagenet_train_adversarial.main([
        "--backbone", "lenet", "--attack-model", "cifarnet",
        "--image-size", "32", "--iters", "3", "--batch-size", "2",
        "--log-every", "1", "--eval-every", "2", "--save-every", "2",
        "--data-path", ilsvrc_dir, "--compute-dtype", "float32"])
    assert rc == 0
    ckpts = tmp_root / "ckpts" / "lenet_adv" / "ilsvrc_2017_cls"
    assert (ckpts / "train_iter_2").exists()
    # exit off the save cadence → the tail is snapshotted too
    assert (ckpts / "train_iter_3").exists()
    train_events = tmp_root / "tensorboard" / "lenet_adv" / \
        "ilsvrc_2017_cls" / "train" / "events.jsonl"
    val_events = tmp_root / "tensorboard" / "lenet_adv" / \
        "ilsvrc_2017_cls" / "val" / "events.jsonl"
    assert train_events.exists() and val_events.exists()
    import json
    val_rec = [json.loads(line) for line in
               val_events.read_text().splitlines()]
    keys = {k for r in val_rec for k in r if k.startswith(("clean/", "adv/"))}
    assert any(k.startswith("clean/") for k in keys)
    assert any(k.startswith("adv/") for k in keys)
