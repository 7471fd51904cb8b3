"""uint8-transfer training path: the host ships raw uint8 batches and the
device normalizes ((x/255)*2-1) as its first op — 4x fewer host↔device
bytes than float32, same pixel values.

Covers: loader equality (uint8 batch normalizes to the float batch
bit-for-bit), augmentation-path equality (same rng draw order), and the
trainer end-to-end (uint8 train/eval step == float step exactly on the
CPU backend). The serving twin is tested in tests/test_quant.py."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_yolo2_tpu.config import OptimizerConfig
from tensorflow_yolo2_tpu.data.augment import (
    AugmentConfig,
    augment_image,
    augment_image_u8,
    normalize,
)
from tensorflow_yolo2_tpu.data.voc import PascalVOC
from tensorflow_yolo2_tpu.train.trainer import (
    Trainer,
    device_normalize,
    softmax_task,
)
from tests import synthetic


@pytest.fixture()
def voc_dir(tmp_path):
    return synthetic.make_voc(str(tmp_path / "VOCdevkit"))


def test_voc_uint8_batch_normalizes_to_float_batch(tmp_path, voc_dir,
                                                   monkeypatch):
    monkeypatch.setenv("TFY2_ROOT", str(tmp_path))
    np.random.seed(7)
    imdb_f = PascalVOC("trainval", batch_size=3, data_path=voc_dir)
    np.random.seed(7)  # same prepare() shuffle → same batch order
    imdb_u = PascalVOC("trainval", batch_size=3, data_path=voc_dir,
                       uint8=True)
    imgs_f, labels_f = imdb_f.get()
    imgs_u, labels_u = imdb_u.get()
    assert imgs_u.dtype == np.uint8
    assert imgs_f.dtype == np.float32
    np.testing.assert_array_equal(labels_f, labels_u)
    np.testing.assert_array_equal(normalize(imgs_u), imgs_f)


def test_augment_u8_matches_float_path(rng):
    image = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
    cfg = AugmentConfig(image_size=64)
    out_f = augment_image(image.copy(), cfg, random.Random(3))
    out_u = augment_image_u8(image.copy(), cfg, random.Random(3))
    assert out_u.dtype == np.uint8
    np.testing.assert_array_equal(normalize(out_u), out_f)


def test_augment_u8_rejects_random_noise(rng):
    image = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    cfg = AugmentConfig(image_size=64, random_noise=True)
    with pytest.raises(AssertionError):
        augment_image_u8(image, cfg, random.Random(0))


def test_device_normalize_semantics():
    u8 = jnp.arange(0, 256, dtype=jnp.uint8).reshape(1, 16, 16, 1)
    f = device_normalize(u8)
    assert f.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(f).ravel()[:2],
                               [(0 / 255) * 2 - 1, (1 / 255) * 2 - 1])
    # float input is a pass-through (trace-time branch)
    x = jnp.ones((2, 2), jnp.float32)
    assert device_normalize(x) is x


def test_trainer_uint8_step_matches_float_step(rng):
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=2)(x)
            x = nn.relu(x)
            return nn.Dense(5)(x.mean(axis=(1, 2)))

    images_u8 = rng.randint(0, 255, (8, 16, 16, 3)).astype(np.uint8)
    images_f = normalize(images_u8)
    labels = rng.randint(0, 5, (8,)).astype(np.int32)

    def run(images):
        trainer = Trainer(Tiny(), softmax_task(),
                          OptimizerConfig(name="sgd"), donate=False)
        state = trainer.create_state(jax.random.PRNGKey(0), images[:1])
        state, metrics = trainer.train_step(state, images, labels)
        ev = trainer.eval_step(state, images, labels)
        return state, metrics, ev

    state_u, m_u, e_u = run(images_u8)
    state_f, m_f, e_f = run(images_f)
    # the pixel values are identical, but XLA fuses the on-device
    # normalize into the first conv and may reassociate — equality holds
    # to fusion-level rounding (~1 ulp of the inputs), not bit-for-bit
    np.testing.assert_allclose(np.asarray(m_u["loss"]),
                               np.asarray(m_f["loss"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(e_u["accuracy"]),
                                  np.asarray(e_f["accuracy"]))
    for a, b in zip(jax.tree_util.tree_leaves(state_u.params),
                    jax.tree_util.tree_leaves(state_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-9)
