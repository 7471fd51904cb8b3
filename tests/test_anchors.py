"""Dimension-cluster (k-means IoU) anchor priors: clustering quality,
determinism, persistence round-trip, and snapshot-config resolution
(data/anchors.py — the YOLO9000 prior recipe the reference never had)."""

import numpy as np
import pytest

from tensorflow_yolo2_tpu.config import Paths, yolo_v2_config
from tensorflow_yolo2_tpu.data.anchors import (
    collect_voc_wh_cells,
    iou_kmeans,
    load_anchors,
    persist_anchors,
    save_anchors,
    v2_config_for_snapshot,
)
from tests import synthetic


def _planted_wh(n_per=200):
    rng = np.random.RandomState(0)
    modes = np.array([[0.5, 0.7], [2.0, 1.5], [4.5, 5.0]])
    wh = np.concatenate([
        m * (1.0 + 0.05 * rng.randn(n_per, 2)) for m in modes])
    return np.abs(wh), modes


def _avg_best_iou(wh, anchors):
    a = np.asarray(anchors, np.float64)
    inter = (np.minimum(wh[:, None, 0], a[None, :, 0]) *
             np.minimum(wh[:, None, 1], a[None, :, 1]))
    union = (wh[:, None, 0] * wh[:, None, 1] +
             a[None, :, 0] * a[None, :, 1] - inter)
    return float(np.mean(np.max(inter / union, axis=1)))


def test_kmeans_recovers_planted_modes():
    wh, modes = _planted_wh()
    anchors, avg_iou = iou_kmeans(wh, k=3)
    assert avg_iou > 0.9
    # each planted mode has a centroid within 10% in both dims
    for m in modes:
        rel = np.abs(anchors - m) / m
        assert rel.max(axis=1).min() < 0.1


def test_kmeans_deterministic_and_sorted():
    wh, _ = _planted_wh()
    a1, i1 = iou_kmeans(wh, k=3)
    a2, i2 = iou_kmeans(wh, k=3)
    np.testing.assert_array_equal(a1, a2)
    assert i1 == i2
    areas = a1[:, 0] * a1[:, 1]
    assert np.all(np.diff(areas) >= 0)


def test_kmeans_beats_classic_on_mismatched_shapes():
    # a box population the classic VOC priors fit poorly (tiny objects)
    rng = np.random.RandomState(1)
    wh = np.abs(np.array([[0.3, 0.4]]) * (1 + 0.2 * rng.randn(500, 2)))
    anchors, avg_iou = iou_kmeans(wh, k=5)
    classic = yolo_v2_config().anchors
    assert avg_iou > _avg_best_iou(wh, classic) + 0.2


def test_kmeans_handles_tiny_datasets():
    anchors, _ = iou_kmeans(np.array([[1.0, 2.0], [2.0, 1.0]]), k=5)
    assert anchors.shape == (5, 2)
    assert (anchors > 0).all()


def test_save_load_roundtrip_rescales(tmp_path):
    anchors = [(0.5, 0.7), (2.0, 1.5)]
    save_anchors(str(tmp_path), anchors, S=7)
    same = load_anchors(str(tmp_path), S=7)
    np.testing.assert_allclose(np.asarray(same), np.asarray(anchors))
    # cell-unit priors rescale linearly with the grid (constant as image
    # fractions — the YoloConfig.at_scale property)
    doubled = load_anchors(str(tmp_path), S=14)
    np.testing.assert_allclose(np.asarray(doubled),
                               2.0 * np.asarray(anchors))
    assert load_anchors(str(tmp_path / "nope"), S=7) is None


def test_v2_config_for_snapshot(tmp_path, monkeypatch):
    monkeypatch.setenv("TFY2_ROOT", str(tmp_path))
    paths = Paths()
    # no anchors.json anywhere → classic priors, B=5
    cfg = v2_config_for_snapshot("darknet19_v2", "voc_2007", paths=paths)
    assert cfg.anchors == yolo_v2_config().anchors
    # persisted custom priors → B follows len(anchors)
    custom = [(0.4, 0.6), (1.0, 1.2), (3.0, 2.5)]
    save_anchors(paths.ckpts_dir("darknet19_v2", "voc_2007"), custom, S=7)
    cfg = v2_config_for_snapshot("darknet19_v2", "voc_2007", paths=paths)
    assert cfg.B == 3
    np.testing.assert_allclose(np.asarray(cfg.anchors),
                               np.asarray(custom))
    assert cfg.cell_channels == 3 * 25


def test_persist_anchors_guard(tmp_path):
    """anchors.json is shared by every snapshot in the dir — a run with
    different priors must refuse to re-prior a populated dir (advisor
    round-3 medium finding)."""
    d = str(tmp_path)
    classic = yolo_v2_config().anchors
    custom = [(0.4, 0.6), (1.0, 1.2), (3.0, 2.5), (5.0, 4.0), (8.0, 7.0)]

    # empty dir: any priors write freely
    assert persist_anchors(d, custom, S=7, has_snapshots=False) is not None
    np.testing.assert_allclose(np.asarray(load_anchors(d, 7)),
                               np.asarray(custom))
    # populated dir + identical priors: no rewrite (None), file untouched
    assert persist_anchors(d, custom, S=7, has_snapshots=True) is None
    # populated dir + different priors: refuse
    with pytest.raises(SystemExit):
        persist_anchors(d, classic, S=7, has_snapshots=True)
    # populated dir with NO anchors.json decodes via the classic fallback:
    # writing non-classic priors would re-prior those snapshots → refuse,
    # while re-affirming the classic priors is fine
    d2 = str(tmp_path / "legacy")
    import os
    os.makedirs(d2)
    with pytest.raises(SystemExit):
        persist_anchors(d2, custom, S=7, has_snapshots=True)
    assert persist_anchors(d2, classic, S=7, has_snapshots=True) is not None


def test_v2_config_for_snapshot_external_weights(tmp_path, monkeypatch):
    """--tf-checkpoint serving must not pick up a stale local
    anchors.json, and the lookup must not mkdir (advisor low finding)."""
    import os

    monkeypatch.setenv("TFY2_ROOT", str(tmp_path))
    paths = Paths()
    ckpt_dir = os.path.join(paths.ckpts, "darknet19_v2", "voc_2007")
    os.makedirs(ckpt_dir)
    save_anchors(ckpt_dir, [(0.4, 0.6), (1.0, 1.2)], S=7)
    cfg = v2_config_for_snapshot("darknet19_v2", "voc_2007", paths=paths,
                                 external_weights=True)
    assert cfg.anchors == yolo_v2_config().anchors  # classic, not stale
    # pure read: resolving a config for a dir that doesn't exist must not
    # create it
    cfg = v2_config_for_snapshot("darknet19_v2p", "voc_2007", paths=paths)
    assert not os.path.isdir(os.path.join(paths.ckpts, "darknet19_v2p"))


def test_kmeans_empty_cluster_reseeds_distinct():
    """Two clusters emptied in the same iteration must reseed to distinct
    boxes (advisor low finding: duplicate-centroid survival)."""
    # k far above the number of distinct shapes forces empty clusters
    wh = np.array([[1.0, 1.0], [1.01, 1.0], [4.0, 4.0], [4.02, 4.0],
                   [9.0, 9.0]], np.float64)
    anchors, _ = iou_kmeans(wh, k=5)
    # no two final centroids identical
    for i in range(len(anchors)):
        for j in range(i):
            assert not np.array_equal(anchors[i], anchors[j])


def test_collect_voc_wh_tolerates_empty_size_tag(tmp_path):
    """<size> present but missing <width>/<height> children → cv2
    fallback, not AttributeError (advisor low finding)."""
    voc = synthetic.make_voc(str(tmp_path / "VOCdevkit"), n_images=2)
    import os
    import re
    xmls = sorted(os.listdir(os.path.join(voc, "Annotations")))
    p = os.path.join(voc, "Annotations", xmls[0])
    with open(p) as f:
        txt = f.read()
    txt = re.sub(r"<width>\d+</width>", "", txt)
    with open(p, "w") as f:
        f.write(txt)
    wh = collect_voc_wh_cells(voc, "trainval", S=7, image_size=224)
    assert wh.shape[0] >= 2  # both images still contribute boxes


def test_collect_voc_wh_matches_grid_math(tmp_path):
    voc = synthetic.make_voc(str(tmp_path / "VOCdevkit"), n_images=4)
    wh = collect_voc_wh_cells(voc, "trainval", S=7, image_size=224)
    assert wh.shape[0] >= 4 and wh.shape[1] == 2
    # synthetic boxes are 30-60px in a 320x240 source → resized to 224²
    # they span ~[30*224/320, 60*224/240] px → in (0, 2] cell units
    assert (wh > 0).all() and (wh < 2.5).all()


def test_voc_cache_keyed_by_anchors(tmp_path, monkeypatch):
    from tensorflow_yolo2_tpu.data import PascalVOC
    monkeypatch.setenv("TFY2_ROOT", str(tmp_path))
    voc = synthetic.make_voc(str(tmp_path / "VOCdevkit"), n_images=3)
    classic = yolo_v2_config()
    custom = yolo_v2_config(anchors=[(0.5, 0.5), (1.5, 1.5)])
    imdb_c = PascalVOC("trainval", batch_size=2, yolo=classic,
                       data_path=voc)
    imdb_k = PascalVOC("trainval", batch_size=2, yolo=custom,
                       data_path=voc)
    # grids built against different priors must come from different
    # cache files — slot shapes differ (B=5 vs B=2)
    assert imdb_c.gt_labels[0]["label"].shape == (7, 7, 5, 25)
    assert imdb_k.gt_labels[0]["label"].shape == (7, 7, 2, 25)
    # and re-construction still hits each one's own cache
    again = PascalVOC("trainval", batch_size=2, yolo=custom, data_path=voc)
    assert again.gt_labels[0]["label"].shape == (7, 7, 2, 25)


def test_kmeans_anchor_slot_assignment_in_loss():
    """The per-slot label grid built with custom anchors feeds the v2
    loss without shape errors and owner slots follow the priors."""
    from tensorflow_yolo2_tpu.data.voc import build_label_grid_v2

    anchors = [(0.5, 0.5), (3.0, 3.0)]
    cfg = yolo_v2_config(anchors=anchors)
    # one small and one large box in the same cell → different slots
    corners = np.array([[100.0, 100.0, 112.0, 112.0],
                        [80.0, 80.0, 144.0, 144.0]], np.float32)
    grid = build_label_grid_v2(corners, np.array([0, 1]), cfg.S, cfg.B,
                               cfg.anchors, cfg.num_class,
                               float(cfg.image_size))
    cell = grid[3, 3]
    assert cell[0, 0] == 1 and cell[1, 0] == 1  # both slots owned
    assert cell[0, 5 + 0] == 1   # small box → small prior slot
    assert cell[1, 5 + 1] == 1   # large box → large prior slot
