"""download_and_convert CLI (reference download_and_convert_data.py:1-72
+ per-dataset converters) → prepared shards → train/eval through the
prepared reader."""

import numpy as np
import pytest

from tests import synthetic


def test_convert_mnist_and_cifar10(tmp_path):
    from tensorflow_yolo2_tpu.data.prepared import PreparedDataset
    from tensorflow_yolo2_tpu.entries import download_and_convert

    mnist = synthetic.make_mnist(str(tmp_path / "mnist"), n_train=24,
                                 n_test=8)
    rc = download_and_convert.main([
        "--dataset-name", "mnist", "--source-dir", mnist,
        "--dataset-dir", str(tmp_path / "mnist_prep"),
        "--shard-size", "10"])
    assert rc == 0
    ds = PreparedDataset(str(tmp_path / "mnist_prep" / "train"),
                         batch_size=4)
    images, labels = ds.get()
    assert images.shape == (4, 28, 28, 1)
    assert images.dtype == np.float32 and abs(images).max() <= 1.0
    assert ds.num_class == 10

    cifar = synthetic.make_cifar10(str(tmp_path / "cifar"), per_batch=6)
    rc = download_and_convert.main([
        "--dataset-name", "cifar10", "--source-dir", cifar,
        "--dataset-dir", str(tmp_path / "cifar_prep")])
    assert rc == 0
    ds = PreparedDataset(str(tmp_path / "cifar_prep" / "test"),
                         batch_size=3)
    images, labels = ds.get()
    assert images.shape == (3, 32, 32, 3)
    assert ds.classes[0] == "airplane"


def test_convert_flowers(tmp_path):
    from tensorflow_yolo2_tpu.data.prepared import PreparedDataset
    from tensorflow_yolo2_tpu.entries import download_and_convert

    flowers = synthetic.make_flowers(str(tmp_path / "flowers"),
                                     per_class=3)
    rc = download_and_convert.main([
        "--dataset-name", "flowers", "--source-dir", flowers,
        "--dataset-dir", str(tmp_path / "flowers_prep"),
        "--image-size", "48"])
    assert rc == 0
    ds = PreparedDataset(str(tmp_path / "flowers_prep" / "train"),
                         batch_size=2)
    images, _ = ds.get()
    assert images.shape == (2, 48, 48, 3)


def test_missing_source_is_a_clear_error(tmp_path, capsys):
    from tensorflow_yolo2_tpu.entries import download_and_convert

    with pytest.raises(SystemExit):
        download_and_convert.main([
            "--dataset-name", "cifar10",
            "--source-dir", str(tmp_path / "nope"),
            "--dataset-dir", str(tmp_path / "out")])


@pytest.mark.slow
def test_cifarnet_trains_from_converted_shards(tmp_path, tmp_root):
    """The train_cifarnet_on_cifar10.sh recipe body: convert → train
    cifarnet on the prepared reader → eval (reference
    scripts/train_cifarnet_on_cifar10.sh)."""
    from tensorflow_yolo2_tpu.entries import (
        download_and_convert,
        eval_classifier,
        train_classifier,
    )

    cifar = synthetic.make_cifar10(str(tmp_path / "cifar"), per_batch=16)
    prep = tmp_path / "prep"
    assert download_and_convert.main([
        "--dataset-name", "cifar10", "--source-dir", cifar,
        "--dataset-dir", str(prep)]) == 0
    assert train_classifier.main([
        "--model-name", "cifarnet", "--dataset-name", "prepared",
        "--preprocessing-name", "cifarnet",
        "--data-path", str(prep / "train"), "--iters", "3",
        "--batch-size", "8", "--optimizer", "sgd",
        "--compute-dtype", "float32", "--num-workers", "1",
        "--save-every", "3", "--log-every", "1"]) == 0
    assert eval_classifier.main([
        "--model-name", "cifarnet", "--dataset-name", "prepared",
        "--preprocessing-name", "cifarnet",
        "--data-path", str(prep / "test"), "--max-batches", "2",
        "--batch-size", "4", "--compute-dtype", "float32"]) == 0


def _tar_up(src_dir, tar_path, arcname):
    import tarfile

    with tarfile.open(tar_path, "w:gz") as tar:
        tar.add(src_dir, arcname=arcname)
    return tar_path


def test_fetch_tarball_via_file_url(tmp_path):
    """URL/tarball plumbing (reference dataset_utils.py:66-84): download a
    cifar10 tarball over a file:// URL, unpack, convert, read back."""
    from tensorflow_yolo2_tpu.data.fetch import fetch_dataset
    from tensorflow_yolo2_tpu.data.prepared import PreparedDataset
    from tensorflow_yolo2_tpu.entries import download_and_convert

    cifar = synthetic.make_cifar10(str(tmp_path / "src"), per_batch=6)
    tarball = _tar_up(cifar, str(tmp_path / "cifar-10-python.tar.gz"),
                      "cifar-10-batches-py")

    # module-level API: unpacks into the table's expected subdir
    raw = fetch_dataset("cifar10", str(tmp_path / "raw"),
                        urls=[f"file://{tarball}"], progress=False)
    assert raw.endswith("cifar-10-batches-py")

    # CLI surface: --download-url end to end
    rc = download_and_convert.main([
        "--dataset-name", "cifar10",
        "--download-url", f"file://{tarball}",
        "--dataset-dir", str(tmp_path / "prep")])
    assert rc == 0
    ds = PreparedDataset(str(tmp_path / "prep" / "train"), batch_size=3)
    images, labels = ds.get()
    assert images.shape == (3, 32, 32, 3)


def test_fetch_mnist_gz_files_via_file_urls(tmp_path):
    """Multi-file fetch (reference download_and_convert_mnist.py:145-169):
    four .gz IDX files stay gzipped on disk; the reader opens them."""
    from tensorflow_yolo2_tpu.entries import download_and_convert

    mnist = synthetic.make_mnist(str(tmp_path / "src"), n_train=12,
                                 n_test=6, gz=True)
    urls = [f"file://{mnist}/{f}.gz" for f in (
        "train-images-idx3-ubyte", "train-labels-idx1-ubyte",
        "t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte")]
    args = ["--dataset-name", "mnist", "--dataset-dir",
            str(tmp_path / "prep")]
    for u in urls:
        args += ["--download-url", u]
    assert download_and_convert.main(args) == 0
    from tensorflow_yolo2_tpu.data.prepared import PreparedDataset

    ds = PreparedDataset(str(tmp_path / "prep" / "train"), batch_size=4)
    images, _ = ds.get()
    assert images.shape == (4, 28, 28, 1)


def test_fetch_rejects_path_traversal(tmp_path):
    import io
    import tarfile

    import pytest as _pytest

    from tensorflow_yolo2_tpu.data.fetch import uncompress

    evil = tmp_path / "evil.tar.gz"
    with tarfile.open(evil, "w:gz") as tar:
        info = tarfile.TarInfo("../escape.txt")
        data = b"nope"
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    with _pytest.raises(ValueError, match="escapes"):
        uncompress(str(evil), str(tmp_path / "out"))
