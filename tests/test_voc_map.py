"""mAP evaluator unit tests with hand-computed expectations."""

import numpy as np
import pytest

from tensorflow_yolo2_tpu.eval import VocMapEvaluator, voc_ap


def test_perfect_detections_give_map_1():
    ev = VocMapEvaluator(num_classes=3)
    gt = np.array([[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.8, 0.8]])
    cls = np.array([0, 1])
    ev.add_image(0, gt, np.array([0.9, 0.8]), cls, gt, cls)
    mAP, aps = ev.mean_ap()
    assert mAP == pytest.approx(1.0)
    assert set(aps) == {0, 1}


def test_miss_and_false_positive():
    ev = VocMapEvaluator(num_classes=1)
    gt = np.array([[0.1, 0.1, 0.3, 0.3], [0.6, 0.6, 0.9, 0.9]])
    # one perfect hit (higher score), one FP far away
    dets = np.array([[0.1, 0.1, 0.3, 0.3], [0.0, 0.6, 0.1, 0.7]])
    ev.add_image(0, dets, np.array([0.9, 0.5]), np.zeros(2, int),
                 gt, np.zeros(2, int))
    mAP, _ = ev.mean_ap()
    # curve: (r=.5, p=1), then (r=.5, p=.5) → AP = 0.5 (all-points)
    assert mAP == pytest.approx(0.5)


def test_duplicate_detection_counts_as_fp():
    ev = VocMapEvaluator(num_classes=1)
    gt = np.array([[0.1, 0.1, 0.3, 0.3]])
    dets = np.array([[0.1, 0.1, 0.3, 0.3], [0.11, 0.1, 0.31, 0.3]])
    ev.add_image(0, dets, np.array([0.9, 0.8]), np.zeros(2, int),
                 gt, np.zeros(1, int))
    mAP, _ = ev.mean_ap()
    assert mAP == pytest.approx(1.0)  # recall hits 1 at rank 1; dup FP after


def test_wrong_class_never_matches():
    ev = VocMapEvaluator(num_classes=2)
    gt = np.array([[0.1, 0.1, 0.3, 0.3]])
    ev.add_image(0, gt, np.array([0.9]), np.array([1]), gt, np.array([0]))
    mAP, aps = ev.mean_ap()
    assert aps[0] == pytest.approx(0.0)  # class 0 GT never found
    assert 1 not in aps  # class 1 has no GT → excluded from mean


def test_voc07_metric_differs():
    recall = np.array([0.5])
    precision = np.array([1.0])
    assert voc_ap(recall, precision, use_07_metric=False) == pytest.approx(0.5)
    # 11-point: t in {0, .1, ..., .5} have p=1 → 6/11
    assert voc_ap(recall, precision, use_07_metric=True) == pytest.approx(6 / 11)


def test_label_grid_ingestion():
    ev = VocMapEvaluator(num_classes=20)
    grid = np.zeros((7, 7, 25), np.float32)
    grid[3, 2, 0] = 1
    grid[3, 2, 1:5] = (80, 110, 40, 60)  # pixel cxcywh in 224 space
    grid[3, 2, 5 + 11] = 1  # class 'dog'
    det_box = np.array([[(80 - 20) / 224, (110 - 30) / 224,
                         (80 + 20) / 224, (110 + 30) / 224]])
    ev.add_label_grid(0, det_box, np.array([0.9]), np.array([11]),
                      grid, 224)
    mAP, aps = ev.mean_ap()
    assert aps[11] == pytest.approx(1.0)
