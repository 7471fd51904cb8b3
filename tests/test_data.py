"""Data-layer tests: VOC label grids, flowers loader, augmentation
distribution bounds, prefetch pipeline semantics."""

import random

import numpy as np
import pytest

from tensorflow_yolo2_tpu.config import YoloConfig
from tensorflow_yolo2_tpu.data import PascalVOC, PrefetchLoader, TFFlowers
from tensorflow_yolo2_tpu.data.augment import AugmentConfig, augment_image
from tensorflow_yolo2_tpu.data.prefetch import device_prefetch
from tests import synthetic


@pytest.fixture()
def voc_dir(tmp_path):
    return synthetic.make_voc(str(tmp_path / "VOCdevkit"))


def test_voc_label_grid_semantics(tmp_path, voc_dir, monkeypatch):
    monkeypatch.setenv("TFY2_ROOT", str(tmp_path))
    imdb = PascalVOC("trainval", batch_size=2, data_path=voc_dir)
    assert imdb.num_class == 20
    entry = imdb.gt_labels[0]
    label = entry["label"]
    assert label.shape == (7, 7, 25)
    resp = label[..., 0]
    assert resp.sum() >= 1
    ys, xs = np.nonzero(resp)
    for y, x in zip(ys, xs):
        cx, cy, w, h = label[y, x, 1:5]
        # cell indexing must match the stored center (reference
        # pascal_voc.py:157-158: x_ind = cx*S/image_size)
        assert int(cx * 7 / 224) == x
        assert int(cy * 7 / 224) == y
        assert w > 0 and h > 0
        assert label[y, x, 5:].sum() == 1  # one-hot class


def test_voc_cache_roundtrip(tmp_path, voc_dir, monkeypatch):
    monkeypatch.setenv("TFY2_ROOT", str(tmp_path))
    imdb1 = PascalVOC("trainval", batch_size=2, data_path=voc_dir)
    # second construction must hit the pickle cache
    imdb2 = PascalVOC("trainval", batch_size=2, data_path=voc_dir)
    assert len(imdb1.gt_labels) == len(imdb2.gt_labels)


def test_voc_get_batches_and_epoch_rollover(tmp_path, voc_dir, monkeypatch):
    monkeypatch.setenv("TFY2_ROOT", str(tmp_path))
    imdb = PascalVOC("trainval", batch_size=3, data_path=voc_dir)
    n = len(imdb.gt_labels)
    images, labels = imdb.get()
    assert images.shape == (3, 224, 224, 3)
    assert labels.shape == (3, 7, 7, 25)
    assert images.min() >= -1.0 and images.max() <= 1.0
    for _ in range(n):  # force a rollover
        imdb.get()
    assert imdb.epoch >= 2


def test_voc_flipped_labels(tmp_path, voc_dir, monkeypatch):
    monkeypatch.setenv("TFY2_ROOT", str(tmp_path))
    plain = PascalVOC("trainval", batch_size=2, data_path=voc_dir)
    flip = PascalVOC("trainval", batch_size=2, data_path=voc_dir,
                     flipped=True)
    assert len(flip.gt_labels) == 2 * len(plain.gt_labels)
    flipped_entries = [e for e in flip.gt_labels if e["flipped"]]
    base = {id(e): e for e in flip.gt_labels if not e["flipped"]}
    assert flipped_entries and base
    for e in flipped_entries:
        resp = e["label"][..., 0]
        ys, xs = np.nonzero(resp)
        for y, x in zip(ys, xs):
            cx = e["label"][y, x, 1]
            assert int(cx * 7 / 224) in range(7)
            # mirrored center must live in the mirrored cell
            assert 0 <= cx <= 223


def test_flowers_loader(tmp_path):
    root = synthetic.make_flowers(str(tmp_path / "TF_flowers"))
    imdb = TFFlowers(batch_size=4, image_size=64, val_split=0.25,
                     data_path=root, data_aug=True)
    assert imdb.num_class == 3
    xi, yi = imdb.get_train()
    assert xi.shape == (4, 64, 64, 3)
    assert yi.shape == (4,)
    assert set(yi) <= {0, 1, 2}
    xv, yv = imdb.get_val()
    assert xv.shape == (4, 64, 64, 3)


def test_augment_output_contract(rng):
    img = rng.randint(0, 255, (100, 140, 3)).astype(np.uint8)
    cfg = AugmentConfig(image_size=64, rand_crop_upbound=84)
    r = random.Random(3)
    for _ in range(20):
        out = augment_image(img, cfg, r)
        assert out.shape == (64, 64, 3)
        assert out.dtype == np.float32
        assert out.min() >= -1.0 and out.max() <= 1.0


def test_augment_noise_bounds(rng):
    img = rng.randint(0, 255, (80, 80, 3)).astype(np.uint8)
    cfg = AugmentConfig(image_size=64, rand_crop_upbound=80,
                        random_noise=True, flip=False, rotate=False,
                        color_pert=False, exposure_shift=False,
                        random_crop=False)
    out = augment_image(img, cfg, random.Random(0))
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_prefetch_loader_delivers_all_batches():
    counter = {"n": 0}

    def get_batch():
        counter["n"] += 1
        return np.full((2, 2), counter["n"])

    with PrefetchLoader(get_batch, num_workers=3, prefetch_size=4) as loader:
        got = [int(next(loader)[0, 0]) for _ in range(10)]
    # no batch duplicated or dropped (order may interleave across workers)
    assert len(set(got)) == 10
    assert min(got) == 1 and max(got) <= counter["n"]

    def get_batch2():
        counter["n"] += 1
        return np.full((2, 2), counter["n"])

    counter["n"] = 0
    with PrefetchLoader(get_batch2, num_workers=1, prefetch_size=2) as loader:
        ordered = [int(next(loader)[0, 0]) for _ in range(5)]
    assert ordered == [1, 2, 3, 4, 5]  # single worker → strict order


def test_prefetch_loader_propagates_errors():
    def get_batch():
        raise RuntimeError("boom")

    loader = PrefetchLoader(get_batch, num_workers=1)
    with pytest.raises(RuntimeError, match="boom"):
        next(loader)
    loader.close()


def test_prefetch_loader_drains_queue_before_end_of_stream():
    """A finite stream must deliver every produced batch before
    StopIteration — no tail batches dropped by the stop flag."""
    import threading

    lock = threading.Lock()
    counter = {"n": 0}

    def finite_batch():
        with lock:
            if counter["n"] >= 10:
                raise StopIteration
            counter["n"] += 1
            return np.full((1,), counter["n"])

    with PrefetchLoader(finite_batch, num_workers=3,
                        prefetch_size=8) as loader:
        got = sorted(int(b[0]) for b in loader)
    assert got == list(range(1, 11))


def test_prefetch_loader_drains_queue_before_error():
    """Batches already produced are delivered before the stored error."""
    import threading

    lock = threading.Lock()
    counter = {"n": 0}

    def flaky_batch():
        with lock:
            counter["n"] += 1
            if counter["n"] == 4:
                raise RuntimeError("boom")
            return np.full((1,), counter["n"])

    loader = PrefetchLoader(flaky_batch, num_workers=1, prefetch_size=8)
    got = []
    with pytest.raises(RuntimeError, match="boom"):
        for b in loader:
            got.append(int(b[0]))
    loader.close()
    assert got == [1, 2, 3]


def test_prefetch_loader_close_joins_workers():
    """After close(), no worker keeps consuming the shared source."""
    import threading
    import time

    lock = threading.Lock()
    counter = {"n": 0}

    def get_batch():
        with lock:
            counter["n"] += 1
        time.sleep(0.01)
        return np.zeros((1,))

    loader = PrefetchLoader(get_batch, num_workers=2, prefetch_size=2)
    next(loader)
    loader.close()
    n_at_close = counter["n"]
    time.sleep(0.1)
    assert counter["n"] == n_at_close
    assert not any(t.is_alive() for t in loader._threads)


def test_device_prefetch_orders_and_transfers():
    batches = iter([np.ones((2,)) * i for i in range(5)])
    out = list(device_prefetch(batches, size=2))
    assert len(out) == 5
    assert [float(b[0]) for b in out] == [0, 1, 2, 3, 4]


def test_augment_large_image_sizes(rng):
    """image_size > rand_crop_upbound (299²/448² inputs) must not crash:
    the crop headroom scales with the target size."""
    import random

    from tensorflow_yolo2_tpu.data.augment import AugmentConfig, augment_image

    image = (rng.uniform(0, 255, (500, 620, 3))).astype(np.uint8)
    for size in (299, 448):
        out = augment_image(image, AugmentConfig(image_size=size),
                            random.Random(0))
        assert out.shape == (size, size, 3)


def test_random_noise_seed_reproducible(rng):
    import random

    from tensorflow_yolo2_tpu.data.augment import AugmentConfig, augment_image

    image = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    cfg = AugmentConfig(image_size=32, flip=False, rotate=False,
                        color_pert=False, exposure_shift=False,
                        random_crop=False, random_noise=True)
    a = augment_image(image, cfg, random.Random(7))
    b = augment_image(image, cfg, random.Random(7))
    np.testing.assert_array_equal(a, b)


def test_flowers_val_wrap_does_not_corrupt_train_order(tmp_path):
    from tests import synthetic

    root = synthetic.make_flowers(str(tmp_path / "f"), per_class=3)
    imdb = TFFlowers(batch_size=4, image_size=32, val_split=0.0,
                     data_path=root)
    assert not imdb.val_list  # falls back to train_list
    order_before = list(imdb.train_list)
    for _ in range(4):  # wraps the 9-entry list
        imdb.get_val()
    assert imdb.train_list == order_before
