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
                                  "lenet"])
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
