"""MNIST / CIFAR-10 loaders + dataset-factory registration.

Capability parity with reference src/slim_dir/datasets/{mnist,cifar10}.py
and dataset_factory.py:30-61 — readers over the standard on-disk formats
with the uniform imdb interface.
"""

import numpy as np
import pytest

from tensorflow_yolo2_tpu.data.cifar10 import Cifar10
from tensorflow_yolo2_tpu.data.mnist import MNIST
from tensorflow_yolo2_tpu.entries.datasets import get_dataset
from tests import synthetic


@pytest.mark.parametrize("gz", [False, True])
def test_mnist_reader(tmp_path, gz):
    root = synthetic.make_mnist(str(tmp_path), n_train=32, n_test=16, gz=gz)
    imdb = MNIST("train", batch_size=8, data_path=root)
    assert imdb.num_class == 10 and len(imdb.classes) == 10
    assert imdb.total_batch == 4
    images, labels = imdb.get()
    assert images.shape == (8, 28, 28, 1) and images.dtype == np.float32
    assert images.min() >= -1.0 and images.max() <= 1.0
    assert labels.shape == (8,) and labels.dtype == np.int32
    assert (labels >= 0).all() and (labels < 10).all()

    test = MNIST("test", batch_size=16, data_path=root)
    test.get()
    assert test.epoch == 2  # 16 examples, one batch consumes the epoch


def test_mnist_epoch_reshuffle(tmp_path):
    root = synthetic.make_mnist(str(tmp_path), n_train=16, n_test=4)
    imdb = MNIST("train", batch_size=16, data_path=root)
    first, lab1 = imdb.get()
    second, lab2 = imdb.get()
    assert imdb.epoch == 3
    # same multiset of examples, (almost surely) different order
    assert sorted(lab1.tolist()) == sorted(lab2.tolist())


@pytest.mark.parametrize("fmt", ["python", "bin"])
def test_cifar10_reader(tmp_path, fmt):
    root = synthetic.make_cifar10(str(tmp_path), per_batch=8, fmt=fmt)
    imdb = Cifar10("train", batch_size=10, data_path=root)
    assert imdb.num_class == 10
    assert imdb.classes[0] == "airplane" and imdb.classes[-1] == "truck"
    assert len(imdb._labels) == 40  # 5 train batches x 8
    images, labels = imdb.get()
    assert images.shape == (10, 32, 32, 3) and images.dtype == np.float32
    assert images.min() >= -1.0 and images.max() <= 1.0

    test = Cifar10("test", batch_size=4, data_path=root)
    assert len(test._labels) == 8


def test_cifar10_chw_layout(tmp_path):
    # the 3072-byte record is CHW: first 1024 bytes are the R plane
    root = synthetic.make_cifar10(str(tmp_path), per_batch=4, fmt="bin")
    raw = np.fromfile(f"{root}/data_batch_1.bin", np.uint8).reshape(-1, 3073)
    imdb = Cifar10("train", batch_size=4, data_path=root, seed=0)
    r_plane = raw[0, 1:1025].reshape(32, 32)
    np.testing.assert_array_equal(imdb._images[0, :, :, 0], r_plane)


def test_inmemory_imdb_thread_safety(tmp_path):
    """PrefetchLoader(thread_safe=True) contract: concurrent get() calls
    must neither crash nor lose/duplicate samples within an epoch."""
    import threading

    root = synthetic.make_mnist(str(tmp_path), n_train=64, n_test=4)
    imdb = MNIST("train", batch_size=4, data_path=root)
    out, errors = [], []

    def worker():
        try:
            for _ in range(8):
                out.append(imdb.get())
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    labels = np.concatenate([lb for _, lb in out])
    # 4 threads x 8 gets x batch 4 = 128 samples = exactly 2 epochs of 64:
    # every example must appear exactly twice
    assert len(labels) == 128
    assert imdb.epoch == 3
    ref = np.sort(np.concatenate([imdb._labels, imdb._labels]))
    np.testing.assert_array_equal(np.sort(labels), ref)


def test_factory_registration(tmp_path):
    mroot = synthetic.make_mnist(str(tmp_path / "mnist"))
    croot = synthetic.make_cifar10(str(tmp_path / "cifar"))
    m = get_dataset("mnist", "train", data_path=mroot, batch_size=4)
    c = get_dataset("cifar10", "test", data_path=croot, batch_size=4)
    assert m.get()[0].shape == (4, 28, 28, 1)
    assert c.get()[0].shape == (4, 32, 32, 3)
    with pytest.raises(ValueError):
        get_dataset("prepared")  # needs data_path


def test_factory_preprocessing_name(tmp_path):
    # slim's --preprocessing_name routed through the dataset factory
    # (train_image_classifier.py:85-88,428-435)
    mroot = synthetic.make_mnist(str(tmp_path / "mnist"))
    croot = synthetic.make_cifar10(str(tmp_path / "cifar"))
    m = get_dataset("mnist", "train", data_path=mroot, batch_size=4,
                    preprocessing_name="lenet")
    images, _ = m.get()
    assert images.shape == (4, 28, 28, 1)
    # lenet preprocessing is (x-128)/128, NOT the default x/255*2-1
    # scaling: un-mapping must recover exact uint8 levels
    recon = images * 128.0 + 128.0
    np.testing.assert_allclose(recon, np.round(recon), atol=1e-5)
    assert recon.min() >= 0 and recon.max() <= 255
    c = get_dataset("cifar10", "test", data_path=croot, batch_size=4,
                    preprocessing_name="cifarnet")
    cimages, _ = c.get()
    # per-image standardization: each image ~zero-mean/unit-std
    assert cimages.shape == (4, 32, 32, 3)
    assert np.abs(cimages.mean(axis=(1, 2, 3))).max() < 1e-3
    np.testing.assert_allclose(cimages.std(axis=(1, 2, 3)), 1.0, atol=1e-2)
    with pytest.raises(ValueError, match="not supported"):
        get_dataset("synthetic", preprocessing_name="cifarnet")


def test_flowers_preprocess_name(tmp_path):
    from tensorflow_yolo2_tpu.data.flowers import TFFlowers

    root = synthetic.make_flowers(str(tmp_path / "fl"),
                                  classes=("a", "b"), per_class=4)
    imdb = TFFlowers(batch_size=2, image_size=64, val_split=0.25,
                     data_path=root, preprocess_name="inception_v1")
    train_imgs, _ = imdb.get_train()
    val_imgs, _ = imdb.get_val()
    # inception preprocessing lands in [-1, 1]
    for imgs in (train_imgs, val_imgs):
        assert imgs.shape == (2, 64, 64, 3)
        assert imgs.min() >= -1.0 and imgs.max() <= 1.0
