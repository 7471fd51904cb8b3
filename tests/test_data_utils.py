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


class TestInceptionPreprocessing:
    """Faithful slim inception preprocessing
    (inception_preprocessing.py:45-273): distorted-bbox crop
    distribution, ordered color distortion, central-crop eval."""

    def test_hsv_roundtrip_matches_colorsys(self, rng):
        """Golden cross-check of the vectorized HSV math against the
        stdlib's independent implementation."""
        import colorsys

        from tensorflow_yolo2_tpu.data.preprocessing import (
            _hsv_to_rgb,
            _rgb_to_hsv,
        )

        pix = rng.rand(64, 1, 3).astype(np.float32)
        ours = _rgb_to_hsv(pix)
        for i in range(64):
            ref = colorsys.rgb_to_hsv(*pix[i, 0])
            np.testing.assert_allclose(ours[i, 0], ref, atol=1e-5)
        back = _hsv_to_rgb(ours)
        np.testing.assert_allclose(back, pix, atol=1e-5)

    def test_crop_distribution(self):
        """sample_distorted_bounding_box: aspect ∈ [0.75, 1.33], area
        fraction ∈ [0.05, 1.0], and the area range is actually explored
        (not clustered) — the distribution the reference trains on
        (inception_preprocessing.py:99-155)."""
        import random as pyrandom

        from tensorflow_yolo2_tpu.data.preprocessing import (
            sample_distorted_bounding_box,
        )

        r = pyrandom.Random(7)
        h, w = 300, 400
        aspects, areas = [], []
        for _ in range(500):
            top, left, ch, cw = sample_distorted_bounding_box(h, w, r)
            assert 0 <= top and top + ch <= h
            assert 0 <= left and left + cw <= w
            if (top, left, ch, cw) == (0, 0, h, w):
                continue  # max_attempts fallback (rare)
            aspects.append(cw / ch)
            areas.append(ch * cw / (h * w))
        areas = np.asarray(areas)
        assert len(areas) > 450
        # round-to-int slop on tiny crops widens aspect by < 2%
        assert min(aspects) >= 0.75 * 0.98 and max(aspects) <= 1.33 * 1.02
        assert areas.min() >= 0.05 and areas.max() <= 1.0
        assert np.percentile(areas, 10) < 0.2  # small crops happen
        assert np.percentile(areas, 90) > 0.6  # large crops happen

    def test_crop_respects_min_object_covered(self):
        import random as pyrandom

        from tensorflow_yolo2_tpu.data.preprocessing import (
            sample_distorted_bounding_box,
        )

        r = pyrandom.Random(3)
        h, w = 200, 200
        box = np.array([[0.4, 0.4, 0.6, 0.6]])  # center 40x40 box
        for _ in range(100):
            top, left, ch, cw = sample_distorted_bounding_box(
                h, w, r, bboxes=box, min_object_covered=0.5)
            if (top, left, ch, cw) == (0, 0, h, w):
                continue
            iy = max(0, min(0.6 * h, top + ch) - max(0.4 * h, top))
            ix = max(0, min(0.6 * w, left + cw) - max(0.4 * w, left))
            assert iy * ix / (0.2 * h * 0.2 * w) >= 0.5 - 1e-6

    def test_distort_color_orderings(self, rng):
        import random as pyrandom

        from tensorflow_yolo2_tpu.data.preprocessing import distort_color

        img = rng.rand(16, 16, 3).astype(np.float32)
        outs = []
        for ordering in range(4):
            out = distort_color(img.copy(), ordering,
                                pyrandom.Random(11), fast_mode=False)
            assert out.min() >= 0.0 and out.max() <= 1.0
            outs.append(out)
        # non-commutative ops + same rng stream → orderings differ
        assert not np.allclose(outs[0], outs[2], atol=1e-3)

    def test_adjust_ops_semantics(self):
        from tensorflow_yolo2_tpu.data.preprocessing import (
            _adjust_hue,
            _adjust_saturation,
        )

        red = np.zeros((1, 1, 3), np.float32)
        red[..., 0] = 1.0
        # saturation 0 → gray at the value (max channel)
        gray = _adjust_saturation(red, 0.0)
        np.testing.assert_allclose(gray, 1.0, atol=1e-6)
        # hue + 1/2 turn on pure red → cyan
        cyan = _adjust_hue(red, 0.5)
        np.testing.assert_allclose(cyan[0, 0], [0.0, 1.0, 1.0], atol=1e-5)
        # identity factors are no-ops
        np.testing.assert_allclose(_adjust_saturation(red, 1.0), red,
                                   atol=1e-6)
        np.testing.assert_allclose(_adjust_hue(red, 0.0), red, atol=1e-6)

    def test_eval_central_crop(self):
        """Eval = central_crop(0.875) → resize: border pixels never
        reach the output (inception_preprocessing.py:262-267)."""
        from tensorflow_yolo2_tpu.data.preprocessing import (
            get_preprocessing,
        )

        img = np.zeros((160, 160, 3), np.uint8)
        img[:10] = 255  # bright band in the cropped-away border
        img[10:] = 128
        out = get_preprocessing("inception_v3", is_training=False,
                                image_size=64)(img)
        # 0.875 crop drops rows < 10; only the 128 level remains
        np.testing.assert_allclose(out, 128 / 255 * 2 - 1, atol=0.02)

    def test_train_output_range_and_shape(self, rng):
        from tensorflow_yolo2_tpu.data.preprocessing import (
            get_preprocessing,
        )

        fn = get_preprocessing("inception_v3", is_training=True,
                               image_size=96, seed=5)
        for _ in range(8):
            img = rng.randint(0, 255, (200, 260, 3)).astype(np.uint8)
            out = fn(img)
            assert out.shape == (96, 96, 3)
            assert out.min() >= -1.0 and out.max() <= 1.0
