"""Property-based (hypothesis) invariant tests for the detection ops.

Randomized search over inputs/thresholds beyond the fixed-seed golden
tests (SURVEY §4 strategy): IoU algebraic invariants, greedy-NMS
equivalence vs the independent numpy port, survivor invariants that hold
absolutely (not just vs another implementation), and the fused Pallas
serving kernel vs the decode+NMS reference chain under drawn thresholds.

Shapes stay fixed inside each test so jit/interpret programs cache
across hypothesis examples; only data and (static) thresholds vary.
"""

import jax
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tensorflow_yolo2_tpu.config import YoloConfig, yolo_v2_config
from tensorflow_yolo2_tpu.ops import decode_grid, decode_grid_v2
from tensorflow_yolo2_tpu.ops.boxes import Detections
from tensorflow_yolo2_tpu.ops.iou import (
    box_iou,
    cxcywh_to_corners,
    pairwise_corners_iou,
)
from tensorflow_yolo2_tpu.ops.nms import nms_fixed
from tensorflow_yolo2_tpu.ops.pallas_decode import decode_nms_pallas
from tests.reference_numpy import np_nms

# derandomize: the suite must be reproducible run-to-run (judge/CI); the
# example corpus is still a 20-point search per property
_SETTINGS = dict(max_examples=20, deadline=None, derandomize=True)


def _random_boxes(rng, n):
    """(n, 4) cxcywh with positive area, centers in [0.05, 0.95]."""
    cxy = rng.uniform(0.05, 0.95, (n, 2))
    wh = rng.uniform(0.02, 0.5, (n, 2))
    return np.concatenate([cxy, wh], axis=1).astype(np.float32)


@given(seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_iou_algebraic_invariants(seed):
    rng = np.random.RandomState(seed)
    a = _random_boxes(rng, 32)
    b = _random_boxes(rng, 32)
    iou_ab = np.asarray(box_iou(a, b))
    iou_ba = np.asarray(box_iou(b, a))
    np.testing.assert_allclose(iou_ab, iou_ba, rtol=1e-6)
    assert (iou_ab >= 0.0).all() and (iou_ab <= 1.0).all()
    np.testing.assert_allclose(np.asarray(box_iou(a, a)), 1.0, atol=1e-6)


@given(seed=st.integers(0, 2**31 - 1),
       iou_thresh=st.sampled_from([0.3, 0.5, 0.7]),
       class_aware=st.booleans())
@settings(**_SETTINGS)
def test_nms_matches_numpy_greedy(seed, iou_thresh, class_aware):
    """nms_fixed survivor set == the independent numpy greedy port on
    random candidates (continuous scores → no order ties)."""
    rng = np.random.RandomState(seed)
    n = 98
    boxes = np.asarray(cxcywh_to_corners(_random_boxes(rng, n)))
    scores = rng.uniform(0.0, 1.0, n).astype(np.float32)
    scores[rng.uniform(size=n) < 0.4] = 0.0  # below-threshold slots
    classes = rng.randint(0, 4, n).astype(np.int32)

    dets = Detections(*map(jax.numpy.asarray, (boxes, scores, classes)))
    out = nms_fixed(dets, iou_thresh, max_outputs=n,
                    class_aware=class_aware)
    got = {(round(float(s), 6)) for s in np.asarray(out.scores) if s > 0}

    ref = np_nms([(*boxes[i], scores[i], classes[i])
                  for i in range(n) if scores[i] > 0],
                 iou_thresh, class_aware=class_aware)
    want = {round(float(d[4]), 6) for d in ref}
    assert got == want


@given(seed=st.integers(0, 2**31 - 1),
       iou_thresh=st.sampled_from([0.3, 0.5]))
@settings(**_SETTINGS)
def test_nms_survivor_invariants(seed, iou_thresh):
    """Absolute invariants: survivors are score-sorted, every surviving
    same-class pair overlaps at most iou_thresh, and no survivor had
    score 0."""
    rng = np.random.RandomState(seed)
    n = 64
    boxes = np.asarray(cxcywh_to_corners(_random_boxes(rng, n)))
    scores = rng.uniform(0.0, 1.0, n).astype(np.float32)
    classes = rng.randint(0, 3, n).astype(np.int32)

    out = nms_fixed(
        Detections(*map(jax.numpy.asarray, (boxes, scores, classes))),
        iou_thresh, max_outputs=n)
    s = np.asarray(out.scores)
    kept = s > 0
    assert (np.diff(s) <= 1e-7).all()  # top_k returns descending
    kb, kc = np.asarray(out.boxes)[kept], np.asarray(out.classes)[kept]
    if kb.shape[0] > 1:
        iou = np.asarray(pairwise_corners_iou(kb, kb))
        same = kc[:, None] == kc[None, :]
        off_diag = ~np.eye(kb.shape[0], dtype=bool)
        assert (iou[same & off_diag] <= iou_thresh + 1e-6).all()


CFG_V1 = YoloConfig()          # S=7 grid head
CFG_V2 = yolo_v2_config(224)   # S=7, B=5 anchor head


@given(seed=st.integers(0, 2**31 - 1),
       v2=st.booleans(),
       thresh=st.sampled_from([0.3, 0.5]))
@settings(max_examples=12, deadline=None, derandomize=True)
def test_fused_pallas_kernel_matches_reference_chain(seed, v2, thresh):
    """decode_nms_pallas (interpret mode on CPU) == decode_grid[_v2] +
    nms_fixed on randomized grids and thresholds — the property version
    of the fixed-seed tests in test_pallas_nms.py."""
    cfg = CFG_V2 if v2 else CFG_V1
    rng = np.random.RandomState(seed)
    net = rng.normal(0, 0.8, (2, cfg.S, cfg.S, cfg.cell_channels)).astype(
        np.float32)
    # force some confident slots so survivors exist
    C = cfg.num_class
    if v2:
        net[:, 2, 3, 4::5 + C] = 2.5  # per-slot conf channels
    else:
        net[:, 2, 3, C:C + cfg.B] = 0.9

    got = decode_nms_pallas(net, cfg, thresh, 0.5, max_outputs=32)
    dec = decode_grid_v2 if v2 else decode_grid
    dets = jax.vmap(lambda g: dec(g, cfg, thresh))(net)
    want = jax.vmap(lambda d: nms_fixed(d, 0.5, max_outputs=32))(dets)

    got_s, want_s = np.asarray(got.scores), np.asarray(want.scores)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-5, atol=1e-6)
    kept = want_s > 0
    np.testing.assert_allclose(np.asarray(got.boxes)[kept],
                               np.asarray(want.boxes)[kept],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.classes)[kept],
                                  np.asarray(want.classes)[kept])
