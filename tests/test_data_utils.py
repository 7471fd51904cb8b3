"""Tests for synset maps, preprocessing factory, prepared-shard datasets."""

import numpy as np
import pytest

from tensorflow_yolo2_tpu.data.prepared import (
    PreparedDataset,
    convert_image_directory,
)
from tensorflow_yolo2_tpu.data.preprocessing import get_preprocessing
from tensorflow_yolo2_tpu.data.synsets import (
    build_maps_from_list,
    load_maps,
    load_synset_list,
    save_maps,
)
from tests import synthetic


def test_synset_maps_roundtrip(tmp_path):
    synsets = ["n01440764", "n01443537", "n01484850"]
    listing = tmp_path / "synsets.txt"
    listing.write_text("\n".join(synsets) + "\n")
    loaded = load_synset_list(str(listing))
    assert loaded == synsets
    syn2id, id2syn = build_maps_from_list(loaded)
    assert syn2id["n01440764"] == 1  # 1-based devkit convention
    assert id2syn[3] == "n01484850"
    save_maps(syn2id, id2syn, str(tmp_path))
    s2, i2 = load_maps(str(tmp_path))
    assert s2 == syn2id and i2 == id2syn


@pytest.mark.parametrize("name", ["vgg_16", "inception_v3", "darknet19",
                                  "lenet", "cifarnet", "resnet_v2_50"])
@pytest.mark.parametrize("train", [True, False])
def test_preprocessing_factory_contract(rng, name, train):
    fn = get_preprocessing(name, is_training=train, image_size=64)
    img = rng.randint(0, 255, (90, 120, 3)).astype(np.uint8)
    out = fn(img)
    assert out.shape == (64, 64, 3)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()


def test_preprocessing_unknown_name():
    with pytest.raises(ValueError, match="was not recognized"):
        get_preprocessing("nope")


def test_crop_or_pad_semantics():
    # tf.image.resize_image_with_crop_or_pad: floor center offsets,
    # zero padding
    from tensorflow_yolo2_tpu.data.preprocessing import crop_or_pad

    img = np.arange(5 * 7 * 3, dtype=np.float32).reshape(5, 7, 3)
    crop = crop_or_pad(img, 3)  # crop: top=(5-3)//2=1, left=(7-3)//2=2
    np.testing.assert_array_equal(crop, img[1:4, 2:5])
    pad = crop_or_pad(img[:2, :2], 4)  # pad: top=(4-2)//2=1, left=1
    assert pad.shape == (4, 4, 3)
    np.testing.assert_array_equal(pad[1:3, 1:3], img[:2, :2])
    assert pad[0].sum() == 0 and pad[3].sum() == 0
    assert pad[:, 0].sum() == 0 and pad[:, 3].sum() == 0
    mixed = crop_or_pad(img[:2], 3)  # crop W 7→3, pad H 2→3
    assert mixed.shape == (3, 3, 3)
    np.testing.assert_array_equal(mixed[0:2], img[:2, 2:5])
    assert mixed[2].sum() == 0


def test_lenet_preprocessing_exact(rng):
    # lenet_preprocessing.py:39-44: crop-or-pad + (x - 128) / 128, no
    # randomness, identical train/eval
    img = rng.randint(0, 255, (28, 28, 1)).astype(np.uint8)
    train_fn = get_preprocessing("lenet", is_training=True, image_size=28)
    eval_fn = get_preprocessing("lenet", is_training=False, image_size=28)
    expected = (img.astype(np.float32) - 128.0) / 128.0
    np.testing.assert_allclose(train_fn(img), expected)
    np.testing.assert_allclose(eval_fn(img), expected)
    # pad path: 28 -> 32 zero-pads the border which maps to -1.0
    padded = get_preprocessing("lenet", image_size=32)(img)
    assert padded.shape == (32, 32, 1)
    np.testing.assert_allclose(padded[0], -1.0)


def test_cifarnet_eval_is_standardized_crop(rng):
    # cifarnet_preprocessing.py:73-96: crop-or-pad + per-image
    # standardization with adjusted_stddev = max(std, 1/sqrt(N))
    img = rng.randint(0, 255, (40, 40, 3)).astype(np.uint8)
    out = get_preprocessing("cifarnet", is_training=False, image_size=32)(img)
    crop = img[4:36, 4:36].astype(np.float32)
    expected = (crop - crop.mean()) / max(crop.std(),
                                          1.0 / np.sqrt(crop.size))
    np.testing.assert_allclose(out, expected, rtol=1e-5)
    assert abs(out.mean()) < 1e-4 and abs(out.std() - 1.0) < 1e-3


def test_cifarnet_train_distorts(rng):
    # cifarnet_preprocessing.py:30-70: pad-4 random crop + flip +
    # brightness/contrast jitter, then standardization — stochastic but
    # always standardized; deterministic under a fixed factory seed
    img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    fn = get_preprocessing("cifarnet", is_training=True, image_size=32,
                           seed=7)
    a, b = fn(img), fn(img)
    assert a.shape == (32, 32, 3)
    assert abs(a.mean()) < 1e-4 and abs(a.std() - 1.0) < 1e-3
    assert not np.allclose(a, b)  # per-call random distortions
    fn2 = get_preprocessing("cifarnet", is_training=True, image_size=32,
                            seed=7)
    np.testing.assert_allclose(fn2(img), a)  # same seed → same stream


def test_prepared_convert_and_read(tmp_path):
    src = synthetic.make_flowers(str(tmp_path / "raw"),
                                 classes=("a", "b"), per_class=5)
    out = str(tmp_path / "prepared")
    manifest = convert_image_directory(src, out, image_size=32, shard_size=4)
    assert manifest["num_examples"] == 10
    assert len(manifest["shards"]) == 3  # 4+4+2
    ds = PreparedDataset(out, batch_size=4)
    assert ds.num_class == 2
    images, labels = ds.get()
    assert images.shape == (4, 32, 32, 3)
    assert images.min() >= -1.0 and images.max() <= 1.0
    assert set(np.unique(labels)) <= {0, 1}
    # epoch rollover
    for _ in range(4):
        ds.get()
    assert ds.epoch >= 2
