"""End-to-end smoke tests through the CLI entries (the analog of the
reference's shell-recipe integration tests, slim_dir/scripts/*.sh):
train-on-synthetic-data → checkpoint → resume → detect-from-checkpoint,
all on the 8-device CPU mesh."""

import os

import numpy as np
import pytest

from tests import synthetic


@pytest.mark.slow
def test_flowers_train_entry_end_to_end(tmp_root, monkeypatch):
    from tensorflow_yolo2_tpu.entries import flowers_train

    flowers_dir = synthetic.make_flowers(
        str(tmp_root / "data" / "TF_flowers"), per_class=4)
    rc = flowers_train.main([
        "--iters", "4", "--batch-size", "4", "--image-size", "64",
        "--num-workers", "1", "--eval-every", "2", "--save-every", "4",
        "--data-path", flowers_dir, "--compute-dtype", "float32"])
    assert rc == 0
    ckpt_dir = tmp_root / "ckpts" / "darknet19" / "tf_flowers"
    assert (ckpt_dir / "train_iter_4").exists()
    events = tmp_root / "tensorboard" / "darknet19" / "tf_flowers" / \
        "train" / "events.jsonl"
    assert events.exists()

    # resume: next run starts from iter 4
    rc = flowers_train.main([
        "--iters", "2", "--batch-size", "4", "--image-size", "64",
        "--num-workers", "1", "--eval-every", "100", "--save-every", "2",
        "--data-path", flowers_dir, "--compute-dtype", "float32"])
    assert rc == 0
    assert (ckpt_dir / "train_iter_6").exists()


@pytest.mark.slow
def test_pascal_train_then_detect_end_to_end(tmp_root):
    from tensorflow_yolo2_tpu.entries import (
        pascal_detect_darknet,
        pascal_train_darknet,
    )

    voc = synthetic.make_voc(str(tmp_root / "data" / "VOCdevkit"),
                             n_images=3)
    rc = pascal_train_darknet.main([
        "--iters", "2", "--batch-size", "2", "--num-workers", "1",
        "--save-every", "2", "--log-every", "1", "--data-path", voc,
        "--compute-dtype", "float32"])
    assert rc == 0
    assert (tmp_root / "ckpts" / "darknet19" / "voc_2007" /
            "train_iter_2").exists()
    # the loss-side distribution metrics (reference net_utils.py:361-370
    # histograms) reach the event log
    import json
    events = tmp_root / "tensorboard" / "darknet19" / "voc_2007" / \
        "train" / "events.jsonl"
    recs = [json.loads(line) for line in events.read_text().splitlines()]
    hists = {r["hist"] for r in recs if "hist" in r}
    assert "hist/iou" in hists and "hist/confidence" in hists

    image = os.path.join(voc, "JPEGImages", "000000.jpg")
    out_path = str(tmp_root / "out.png")
    rc = pascal_detect_darknet.main(
        [image, "--threshold", "0.1", "--nms", "--out", out_path])
    assert rc == 0
    assert os.path.exists(out_path)


@pytest.mark.slow
def test_pascal_train_v2_anchor_head(tmp_root):
    """--v2: anchor-based YOLOv2 head + loss end-to-end."""
    from tensorflow_yolo2_tpu.entries import pascal_train_darknet

    voc = synthetic.make_voc(str(tmp_root / "data" / "VOCdevkit"),
                             n_images=3)
    rc = pascal_train_darknet.main([
        "--v2", "--iters", "2", "--batch-size", "2", "--num-workers", "1",
        "--save-every", "2", "--data-path", voc,
        "--compute-dtype", "float32"])
    assert rc == 0
    assert (tmp_root / "ckpts" / "darknet19_v2" / "voc_2007" /
            "train_iter_2").exists()

    from tensorflow_yolo2_tpu.entries import pascal_detect_darknet

    image = os.path.join(voc, "JPEGImages", "000000.jpg")
    out_path = str(tmp_root / "out_v2.png")
    rc = pascal_detect_darknet.main(
        [image, "--v2", "--threshold", "0.05", "--nms", "--out", out_path])
    assert rc == 0
    assert os.path.exists(out_path)


@pytest.mark.slow
def test_pascal_train_v2_kmeans_anchors(tmp_root):
    """--anchors kmeans: dimension clusters computed on the training set,
    persisted to anchors.json, and resolved by the detect entry (the
    B=k head restores only if serving reads the same priors)."""
    import json

    from tensorflow_yolo2_tpu.entries import (
        pascal_detect_darknet,
        pascal_train_darknet,
    )

    voc = synthetic.make_voc(str(tmp_root / "data" / "VOCdevkit"),
                             n_images=3)
    rc = pascal_train_darknet.main([
        "--v2", "--anchors", "kmeans", "--num-anchors", "3",
        "--iters", "2", "--batch-size", "2", "--num-workers", "1",
        "--save-every", "2", "--data-path", voc,
        "--compute-dtype", "float32"])
    assert rc == 0
    anchors_json = (tmp_root / "ckpts" / "darknet19_v2" / "voc_2007" /
                    "anchors.json")
    assert anchors_json.exists()
    payload = json.loads(anchors_json.read_text())
    assert len(payload["anchors"]) == 3 and payload["S"] == 7

    image = os.path.join(voc, "JPEGImages", "000000.jpg")
    out_path = str(tmp_root / "out_v2_km.png")
    rc = pascal_detect_darknet.main(
        [image, "--v2", "--threshold", "0.05", "--nms", "--out", out_path])
    assert rc == 0
    assert os.path.exists(out_path)


@pytest.mark.slow
def test_train_classifier_entry_synthetic(tmp_root):
    from tensorflow_yolo2_tpu.entries import train_classifier

    rc = train_classifier.main([
        "--model-name", "lenet", "--dataset-name", "synthetic",
        "--iters", "3", "--batch-size", "8", "--num-workers", "1",
        "--optimizer", "sgd", "--learning-rate", "0.01",
        "--compute-dtype", "float32", "--save-every", "3"])
    assert rc == 0
    assert (tmp_root / "ckpts" / "lenet" / "synthetic_10" /
            "train_iter_3").exists()


def test_v2_detect_ignores_implicit_v1_tf_checkpoint(tmp_root):
    """A v2 (per-slot) detect run must not import the implicit v1 TF
    checkpoint at weights/darknet19_pascal.ckpt — with no v2 snapshot
    it should report the missing snapshot, not a TF-import failure."""
    from tensorflow_yolo2_tpu.config import YoloConfig
    from tensorflow_yolo2_tpu.entries.pascal_detect_darknet import (
        load_detector_params,
    )

    weights = tmp_root / "weights"
    weights.mkdir(parents=True)
    (weights / "darknet19_pascal.ckpt.index").write_bytes(b"junk")
    v2 = YoloConfig(B=5, per_slot_classes=True,
                    anchors=((1.0, 1.0),) * 5)
    with pytest.raises(FileNotFoundError):
        load_detector_params(v2, network_name="darknet19_v2")


@pytest.mark.slow
def test_pascal_train_v2_multiscale(tmp_root):
    """YOLO9000 multiscale training: static-shape buckets (64² → S=2,
    96² → S=3) cycling through one donated train step per bucket."""
    from tensorflow_yolo2_tpu.entries import pascal_train_darknet

    voc = synthetic.make_voc(str(tmp_root / "data" / "VOCdevkit"),
                             n_images=3)
    rc = pascal_train_darknet.main([
        "--v2", "--multiscale", "64,96", "--iters", "24",
        "--batch-size", "2", "--num-workers", "1", "--save-every", "24",
        "--log-every", "12", "--data-path", voc,
        "--compute-dtype", "float32"])
    assert rc == 0
    assert (tmp_root / "ckpts" / "darknet19_v2" / "voc_2007" /
            "train_iter_24").exists()
    # both scale buckets produced label caches (per-slot anchor grids;
    # kmeans priors append an anchor-hash suffix — data/voc.py cache
    # keying — so match by prefix)
    assert list((tmp_root / "cache").glob(
        "pascal_trainval_gt_labels_64x2_slots5*.pkl"))
    assert list((tmp_root / "cache").glob(
        "pascal_trainval_gt_labels_96x3_slots5*.pkl"))


@pytest.mark.slow
def test_ema_train_then_eval_ema_weights(tmp_root):
    """EMA training (--moving-average-decay) + wall-clock snapshots
    (--save-interval-secs) + EMA-weights evaluation (--use-ema), the
    slim train/eval EMA path."""
    from tensorflow_yolo2_tpu.entries import eval_classifier, train_classifier

    rc = train_classifier.main([
        "--model-name", "lenet", "--dataset-name", "synthetic",
        "--iters", "3", "--batch-size", "8", "--num-workers", "1",
        "--optimizer", "sgd", "--learning-rate", "0.01",
        "--moving-average-decay", "0.9", "--compute-dtype", "float32",
        "--save-every", "100", "--save-interval-secs", "0.001"])
    assert rc == 0
    # the modular cadence (every 100) never fired — only timed saves did
    assert (tmp_root / "ckpts" / "lenet" / "synthetic_10" /
            "train_iter_3").exists()

    rc = eval_classifier.main([
        "--model-name", "lenet", "--dataset-name", "synthetic",
        "--max-batches", "2", "--batch-size", "8",
        "--use-ema", "--compute-dtype", "float32"])
    assert rc == 0


@pytest.mark.slow
def test_train_then_eval_classifier_mnist(tmp_root):
    """scripts/train_lenet_on_mnist.sh capability: train lenet on IDX
    MNIST, then eval the test split from the saved snapshot."""
    from tensorflow_yolo2_tpu.entries import eval_classifier, train_classifier

    mnist_dir = synthetic.make_mnist(str(tmp_root / "data" / "mnist"),
                                     n_train=32, n_test=16)
    rc = train_classifier.main([
        "--model-name", "lenet", "--dataset-name", "mnist",
        "--data-path", mnist_dir, "--preprocessing-name", "lenet",
        "--iters", "3", "--batch-size", "8", "--num-workers", "1",
        "--optimizer", "sgd", "--learning-rate", "0.01",
        "--compute-dtype", "float32", "--save-every", "3"])
    assert rc == 0
    assert (tmp_root / "ckpts" / "lenet" / "mnist" / "train_iter_3").exists()

    rc = eval_classifier.main([
        "--model-name", "lenet", "--dataset-name", "mnist",
        "--data-path", mnist_dir, "--dataset-split-name", "test",
        "--preprocessing-name", "lenet",
        "--batch-size", "8", "--max-batches", "2",
        "--compute-dtype", "float32"])
    assert rc == 0


@pytest.mark.slow
def test_train_darknet19_imagenet_recipe(tmp_root):
    """scripts/train_darknet19_imagenet.sh capability (reference
    slim_train_darknet19_imagenet.sh): darknet19 on an ILSVRC CLS-LOC
    tree through the flag-driven classifier trainer + eval."""
    from tensorflow_yolo2_tpu.entries import eval_classifier, train_classifier

    ilsvrc = synthetic.make_cls_pretrain(
        str(tmp_root / "data" / "ilsvrc"), per_class=4, n_val=8)
    rc = train_classifier.main([
        "--model-name", "darknet19", "--dataset-name", "imagenet",
        "--data-path", ilsvrc, "--image-size", "64",
        "--preprocessing-name", "vgg",
        "--iters", "2", "--batch-size", "4", "--num-workers", "1",
        "--optimizer", "momentum", "--learning-rate", "0.001",
        "--momentum", "0.9",
        "--compute-dtype", "float32", "--save-every", "2"])
    assert rc == 0
    assert (tmp_root / "ckpts" / "darknet19" / "ilsvrc_2017_cls" /
            "train_iter_2").exists()
    rc = eval_classifier.main([
        "--model-name", "darknet19", "--dataset-name", "imagenet",
        "--data-path", ilsvrc, "--image-size", "64",
        "--preprocessing-name", "vgg", "--dataset-split-name", "val",
        "--batch-size", "4", "--max-batches", "2",
        "--compute-dtype", "float32"])
    assert rc == 0


def test_registry_zoo_models_forward():
    import jax
    import numpy as np

    from tensorflow_yolo2_tpu.models.registry import get_network

    x = np.random.RandomState(0).normal(
        0, 1, (1, 32, 32, 3)).astype(np.float32)
    for name in ("lenet", "cifarnet"):
        model = get_network(name, num_classes=7)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        y = model.apply(variables, x, train=False)
        assert y.shape == (1, 7)
        assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_resnet_pair_and_eval_map_entries(tmp_root):
    """The remaining CLI surfaces end-to-end: pascal_train_resnet →
    pascal_detect_resnet (fused decode+NMS serving), and the
    pascal_eval_map entry over a trained darknet snapshot."""
    from tensorflow_yolo2_tpu.entries import (
        pascal_detect_resnet,
        pascal_eval_map,
        pascal_train_darknet,
        pascal_train_resnet,
    )

    voc = synthetic.make_voc(str(tmp_root / "data" / "VOCdevkit"),
                             n_images=3)
    rc = pascal_train_resnet.main([
        "--iters", "2", "--batch-size", "2", "--num-workers", "1",
        "--save-every", "2", "--data-path", voc,
        "--compute-dtype", "float32"])
    assert rc == 0
    assert (tmp_root / "ckpts" / "resnet50" / "voc_2007" /
            "train_iter_2").exists()
    image = os.path.join(voc, "JPEGImages", "000000.jpg")
    out_path = str(tmp_root / "out_resnet.png")
    rc = pascal_detect_resnet.main(
        [image, "--threshold", "0.05", "--nms", "--out", out_path])
    assert rc == 0
    assert os.path.exists(out_path)

    rc = pascal_train_darknet.main([
        "--iters", "2", "--batch-size", "2", "--num-workers", "1",
        "--save-every", "2", "--data-path", voc,
        "--compute-dtype", "float32"])
    assert rc == 0
    rc = pascal_eval_map.main([
        "--image-set", "trainval", "--data-path", voc,
        "--batch-size", "2", "--max-images", "2", "--threshold", "0.05"])
    assert rc == 0


@pytest.mark.slow
def test_spatial_train_then_detect_cli(tmp_root):
    """--spatial N end-to-end (VERDICT r4 item 3): H-sharded live-BN
    training (pascal_train_darknet --spatial 2) → snapshot → resume
    (exact, incl. optimizer state) → spatially-sharded serving
    (pascal_detect_darknet --spatial 2) from the same snapshot — the
    §5.7 capability through its user-facing CLI on the CPU mesh."""
    from tensorflow_yolo2_tpu.entries import (
        pascal_detect_darknet,
        pascal_train_darknet,
    )

    voc = synthetic.make_voc(str(tmp_root / "data" / "VOCdevkit"),
                             n_images=3)
    rc = pascal_train_darknet.main([
        "--iters", "2", "--batch-size", "2", "--num-workers", "1",
        "--save-every", "2", "--log-every", "1", "--data-path", voc,
        "--compute-dtype", "float32", "--spatial", "2",
        "--bn-momentum", "0.9"])
    assert rc == 0
    ckpt = tmp_root / "ckpts" / "darknet19" / "voc_2007"
    assert (ckpt / "train_iter_2").exists()
    events = tmp_root / "tensorboard" / "darknet19" / "voc_2007" / \
        "train" / "events.jsonl"
    assert events.exists() and "loss" in events.read_text()

    # exact resume through the spatial trainer's own snapshot layout
    rc = pascal_train_darknet.main([
        "--iters", "2", "--batch-size", "2", "--num-workers", "1",
        "--save-every", "2", "--log-every", "1", "--data-path", voc,
        "--compute-dtype", "float32", "--spatial", "2",
        "--bn-momentum", "0.9"])
    assert rc == 0
    assert (ckpt / "train_iter_4").exists()

    # spatially-sharded serving of the spatially-trained snapshot
    # (128 = 32·2·2 satisfies the 2-shard divisibility; the detector is
    # fully convolutional so the 224-trained weights re-grid to S=4)
    image = os.path.join(voc, "JPEGImages", "000000.jpg")
    out_path = str(tmp_root / "out_spatial.png")
    rc = pascal_detect_darknet.main(
        [image, "--threshold", "0.05", "--nms", "--image-size", "128",
         "--spatial", "2", "--out", out_path])
    assert rc == 0
    assert os.path.exists(out_path)


@pytest.mark.slow
def test_spatial_v2_train_then_detect_cli(tmp_root):
    """--spatial 2 --v2 end-to-end: the ANCHOR loss trained H-sharded
    (spatial_yolo_v2_train_fn — ignore-term GT pool via all_gather) →
    snapshot + anchors.json → spatially-sharded --v2 serving from the
    same snapshot."""
    from tensorflow_yolo2_tpu.entries import (
        pascal_detect_darknet,
        pascal_train_darknet,
    )

    voc = synthetic.make_voc(str(tmp_root / "data" / "VOCdevkit"),
                             n_images=3)
    rc = pascal_train_darknet.main([
        "--iters", "2", "--batch-size", "2", "--num-workers", "1",
        "--save-every", "2", "--log-every", "1", "--data-path", voc,
        "--compute-dtype", "float32", "--spatial", "2", "--v2",
        "--bn-momentum", "0.9"])
    assert rc == 0
    ckpt = tmp_root / "ckpts" / "darknet19_v2" / "voc_2007"
    assert (ckpt / "train_iter_2").exists()
    assert (ckpt / "anchors.json").exists()

    image = os.path.join(voc, "JPEGImages", "000000.jpg")
    out_path = str(tmp_root / "out_spatial_v2.png")
    rc = pascal_detect_darknet.main(
        [image, "--threshold", "0.05", "--nms", "--image-size", "128",
         "--spatial", "2", "--v2", "--out", out_path])
    assert rc == 0
    assert os.path.exists(out_path)


@pytest.mark.slow
def test_spatial_v2p_train_then_detect_cli(tmp_root):
    """--spatial 2 --v2 --passthrough end-to-end: the FULL YOLOv2
    architecture (reorg head) trained H-sharded with live sync-BN
    (spatial_yolo_v2_train_fn(head='v2p') — shard-local space-to-depth
    on the H/16 mid map) → snapshot + anchors.json → spatially-sharded
    --v2 --passthrough serving from the same snapshot."""
    from tensorflow_yolo2_tpu.entries import (
        pascal_detect_darknet,
        pascal_train_darknet,
    )

    voc = synthetic.make_voc(str(tmp_root / "data" / "VOCdevkit"),
                             n_images=3)
    rc = pascal_train_darknet.main([
        "--iters", "2", "--batch-size", "2", "--num-workers", "1",
        "--save-every", "2", "--log-every", "1", "--data-path", voc,
        "--compute-dtype", "float32", "--spatial", "2", "--v2",
        "--passthrough", "--bn-momentum", "0.9"])
    assert rc == 0
    ckpt = tmp_root / "ckpts" / "darknet19_v2p" / "voc_2007"
    assert (ckpt / "train_iter_2").exists()
    assert (ckpt / "anchors.json").exists()

    image = os.path.join(voc, "JPEGImages", "000000.jpg")
    out_path = str(tmp_root / "out_spatial_v2p.png")
    rc = pascal_detect_darknet.main(
        [image, "--threshold", "0.05", "--nms", "--image-size", "128",
         "--spatial", "2", "--v2", "--passthrough", "--out", out_path])
    assert rc == 0
    assert os.path.exists(out_path)


def test_spatial_cli_guards(tmp_root):
    """--spatial flag validation on both entries."""
    from tensorflow_yolo2_tpu.entries import (
        pascal_detect_darknet,
        pascal_train_darknet,
    )

    with pytest.raises(SystemExit):
        pascal_train_darknet.main(["--spatial", "1"])
    with pytest.raises(SystemExit):
        # passthrough is a --v2 head; bare --spatial --passthrough
        # still fails the v2 requirement
        pascal_train_darknet.main(["--spatial", "2", "--passthrough"])
    with pytest.raises(SystemExit):
        pascal_train_darknet.main(["--spatial", "2", "--uint8-transfer"])
    with pytest.raises(SystemExit):
        pascal_detect_darknet.main(["x.jpg", "--spatial", "2", "--int8"])
    with pytest.raises(SystemExit):
        pascal_detect_darknet.main(
            ["x.jpg", "--spatial", "2", "--pallas-stem"])
