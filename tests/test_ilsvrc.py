"""ILSVRC loader tests on a synthetic ILSVRC directory tree."""

import os

import numpy as np
import pytest

from tensorflow_yolo2_tpu.data.ilsvrc import IlsvrcCls
from tensorflow_yolo2_tpu.data.prefetch import PrefetchLoader


# the ilsvrc_dir fixture lives in conftest.py (shared with the
# adversarial-entry test)


def test_train_listing_and_batches(tmp_root, ilsvrc_dir):
    imdb = IlsvrcCls("train", batch_size=4, image_size=32,
                     data_path=ilsvrc_dir)
    assert imdb.num_class == 3
    assert len(imdb.gt_labels) == 12
    images, labels = imdb.get()
    assert images.shape == (4, 32, 32, 3)
    assert images.min() >= -1.0 and images.max() <= 1.0
    assert set(labels) <= {0, 1, 2}
    for _ in range(3):  # epoch rollover
        imdb.get()
    assert imdb.epoch >= 2


def test_val_labels_from_xml(tmp_root, ilsvrc_dir):
    imdb = IlsvrcCls("val", batch_size=3, image_size=32,
                     data_path=ilsvrc_dir)
    assert len(imdb.gt_labels) == 6
    # labels follow the XML synsets
    classes = sorted({cls for _, cls in imdb.gt_labels})
    assert classes == [0, 1, 2]


def test_cache_roundtrip(tmp_root, ilsvrc_dir):
    imdb1 = IlsvrcCls("train", batch_size=4, data_path=ilsvrc_dir)
    imdb2 = IlsvrcCls("train", batch_size=4, data_path=ilsvrc_dir)
    assert len(imdb1.gt_labels) == len(imdb2.gt_labels)


def test_aug_and_pad_policies(tmp_root, ilsvrc_dir):
    aug = IlsvrcCls("train", batch_size=2, image_size=32, data_aug=True,
                    data_path=ilsvrc_dir)
    images, _ = aug.get()
    assert images.shape == (2, 32, 32, 3)
    pad = IlsvrcCls("train", batch_size=2, image_size=32,
                    resize_policy="pad", data_path=ilsvrc_dir)
    images, _ = pad.get()
    # pad policy letterboxes the 64×48 source: zero bands must exist
    assert (images == -1.0).any() or (np.abs(images) < 1.01).all()


def test_random_noise_batch(tmp_root, ilsvrc_dir):
    """The ±ε sign-noise float path (ilsvrc_cls_multithread_scipy.py:364-369)
    must deliver augmented batches — regression test for the round-3 break
    where augment_image handed a random_noise cfg to the u8 helper."""
    imdb = IlsvrcCls("train", batch_size=2, image_size=32, data_aug=True,
                     random_noise=True, data_path=ilsvrc_dir)
    images, labels = imdb.get()
    assert images.shape == (2, 32, 32, 3)
    assert images.dtype == np.float32
    assert images.min() >= -1.0 and images.max() <= 1.0
    # noise-free twin of the same seed differs (the ±ε noise is applied)
    clean = IlsvrcCls("train", batch_size=2, image_size=32, data_aug=True,
                      data_path=ilsvrc_dir)
    clean_images, _ = clean.get()
    assert not np.array_equal(images, clean_images)


@pytest.mark.slow
def test_imagenet_train_process_workers(tmp_root, ilsvrc_dir):
    """--process-workers: the exactly-once epoch-sharded PROCESS pool
    feeds the trainer end-to-end (the reference's 10-process loader
    reachable from the CLI)."""
    from tensorflow_yolo2_tpu.entries import imagenet_train_darknet

    rc = imagenet_train_darknet.main([
        "--iters", "2", "--batch-size", "4", "--process-workers", "2",
        "--save-every", "2", "--eval-every", "2",
        "--data-path", ilsvrc_dir, "--compute-dtype", "float32"])
    assert rc == 0
    ckpts = tmp_root / "ckpts" / "darknet19" / "ilsvrc_2017_cls"
    assert any(p.name.startswith("train_") for p in ckpts.iterdir())


@pytest.mark.slow
def test_imagenet_train_and_test_entries(tmp_root, ilsvrc_dir):
    """imagenet_train_darknet (2 iters, epoch-named snapshot) then the
    imagenet_test_darknet accuracy/throughput harness end-to-end."""
    from tensorflow_yolo2_tpu.entries import (
        imagenet_test_darknet,
        imagenet_train_darknet,
    )

    rc = imagenet_train_darknet.main([
        "--iters", "2", "--batch-size", "4", "--num-workers", "1",
        "--save-every", "2", "--eval-every", "2",
        "--data-path", ilsvrc_dir, "--compute-dtype", "float32"])
    assert rc == 0
    ckpts = tmp_root / "ckpts" / "darknet19" / "ilsvrc_2017_cls"
    assert any(p.name.startswith("train_epoch_") for p in ckpts.iterdir())

    rc = imagenet_test_darknet.main([
        "--batch-size", "3", "--max-batches", "2", "--num-workers", "1",
        "--data-path", ilsvrc_dir, "--compute-dtype", "float32"])
    assert rc == 0

    # eval_classifier must find the EPOCH-named snapshot (fallback from
    # the iter namespace) and accept slim's 'validation' split name
    from tensorflow_yolo2_tpu.entries import eval_classifier

    rc = eval_classifier.main([
        "--model-name", "darknet19", "--dataset-name", "imagenet",
        "--dataset-split-name", "validation", "--data-path", ilsvrc_dir,
        "--batch-size", "3", "--max-batches", "1",
        "--compute-dtype", "float32"])
    assert rc == 0

    # single-image top-5 predict from the same snapshot
    import glob as _glob

    from tensorflow_yolo2_tpu.entries import imagenet_predict_darknet

    image = sorted(_glob.glob(os.path.join(
        ilsvrc_dir, "Data", "CLS-LOC", "train", "*", "*.JPEG")))[0]
    rc = imagenet_predict_darknet.main([image, "--data-path", ilsvrc_dir])
    assert rc == 0


def test_parallel_prefetch_no_drop_no_dup(tmp_root, ilsvrc_dir):
    """thread_safe prefetch over the locked imdb: with one worker the
    order is strict, so one epoch's batches hold each example exactly
    once; with several workers delivery interleaves across the epoch
    boundary, so only aggregate balance can be asserted."""
    imdb = IlsvrcCls("train", batch_size=3, image_size=32,
                     data_path=ilsvrc_dir)
    with PrefetchLoader(imdb.get, num_workers=1, prefetch_size=2,
                        thread_safe=True) as loader:
        labels = np.concatenate([next(loader)[1] for _ in range(4)])
    counts = np.bincount(labels, minlength=3)
    np.testing.assert_array_equal(counts, [4, 4, 4])

    imdb2 = IlsvrcCls("train", batch_size=3, image_size=32,
                      data_path=ilsvrc_dir, seed=1)
    with PrefetchLoader(imdb2.get, num_workers=3, prefetch_size=4,
                        thread_safe=True) as loader:
        labels = np.concatenate([next(loader)[1] for _ in range(8)])
    # 24 items over ~2 epochs; interleaving shifts at most one batch of
    # any class across the window
    counts = np.bincount(labels, minlength=3)
    assert counts.sum() == 24
    assert all(5 <= c <= 11 for c in counts)
