"""Fused Pallas decode+NMS vs the decode_grid → nms_fixed reference path.

CPU tests run the kernel in interpreter mode; the @tpu tests compile the
kernel for the real chip (SURVEY §4: every Pallas kernel is tested against
a jnp reference — and the serving kernel additionally compiled on TPU,
not only interpreted). Run the tpu set with scripts/run_tpu_tests.sh.
"""

import jax
import numpy as np
import pytest

from tensorflow_yolo2_tpu.config import YoloConfig, yolo_v2_config
from tensorflow_yolo2_tpu.ops import decode_grid, decode_grid_v2
from tensorflow_yolo2_tpu.ops.nms import nms_fixed
from tensorflow_yolo2_tpu.ops.pallas_decode import (
    decode_grid_pallas,
    decode_nms_pallas,
)

CFG = YoloConfig()  # S=7 (224²)
CFG448 = YoloConfig(S=14, image_size=448)
CFG_V2 = yolo_v2_config(224)  # S=7, B=5 anchor head

K = 32


def _reference(net, cfg, thresh=0.5, iou=0.5):
    """decode_grid[_v2] + nms_fixed, per image."""
    dec = decode_grid_v2 if cfg.per_slot_classes else decode_grid
    dets = jax.vmap(lambda g: dec(g, cfg, thresh))(net)
    return jax.vmap(lambda d: nms_fixed(d, iou, max_outputs=K))(dets)


def _assert_equivalent(got, want):
    """Same survivor scores/boxes/classes; box/class values of empty
    (score-0) slots are unspecified in both implementations."""
    got_s, want_s = np.asarray(got.scores), np.asarray(want.scores)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-5, atol=1e-6)
    kept = want_s > 0
    np.testing.assert_allclose(np.asarray(got.boxes)[kept],
                               np.asarray(want.boxes)[kept],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.classes)[kept],
                                  np.asarray(want.classes)[kept])


def _random_grid(rng, cfg, batch=3):
    net = rng.normal(0, 0.6,
                     (batch, cfg.S, cfg.S, cfg.cell_channels)).astype(
        np.float32)
    # confident slots, incl. same-cell box pairs so the suppression sweep
    # actually fires (both slots of a cell share the class argmax)
    C = cfg.num_class
    net[:, 1, 2, C] = 0.95
    net[:, 1, 2, C + 1] = 0.9
    net[:, 1, 3, C] = 0.8
    return net


def test_fused_nms_matches_reference(rng):
    net = _random_grid(rng, CFG)
    got = decode_nms_pallas(net, CFG, 0.5, 0.5, max_outputs=K)
    want = _reference(net, CFG)
    _assert_equivalent(got, want)


def test_fused_nms_448_grid(rng):
    net = _random_grid(rng, CFG448, batch=2)
    got = decode_nms_pallas(net, CFG448, 0.5, 0.5, max_outputs=K)
    want = _reference(net, CFG448)
    _assert_equivalent(got, want)


def test_fused_nms_suppresses_duplicates(rng):
    """Two heavily-overlapping confident boxes of the same class → one
    survivor; different classes → both survive (class-aware)."""
    cfg = CFG
    C = cfg.num_class
    net = np.zeros((1, cfg.S, cfg.S, cfg.cell_channels), np.float32)
    # cell (3,3): box 0 and box 1 almost identical, conf .9/.8
    net[0, 3, 3, C] = 0.9
    net[0, 3, 3, C + 1] = 0.8
    net[0, 3, 3, C + cfg.B:C + cfg.B + 4] = (0.5, 0.5, 0.5, 0.5)
    net[0, 3, 3, C + cfg.B + 4:C + cfg.B + 8] = (0.52, 0.5, 0.5, 0.5)
    net[0, 3, 3, 0] = 1.0  # class 0 for the cell
    got = decode_nms_pallas(net, cfg, 0.5, 0.5, max_outputs=K)
    s = np.asarray(got.scores[0])
    assert (s > 0).sum() == 1
    assert s[0] == pytest.approx(0.9)
    want = _reference(net, cfg)
    _assert_equivalent(got, want)


def _random_grid_v2(rng, cfg, batch=3):
    """Per-slot anchor grid with a few confident slots (conf logit 4 →
    sigmoid≈.98; one class logit at 5 → max softmax ≈ .89; score ≈ .87)."""
    net = rng.normal(0, 0.6,
                     (batch, cfg.S, cfg.S, cfg.cell_channels)).astype(
        np.float32)
    C = cfg.num_class
    for (y, x, b) in ((1, 2, 0), (1, 2, 1), (1, 3, 0), (4, 4, 3)):
        base = b * (5 + C)
        net[:, y, x, base + 4] = 4.0        # conf logit
        net[:, y, x, base + 5] = 5.0        # class-0 logit dominates
    return net


def test_fused_nms_v2_matches_reference(rng):
    net = _random_grid_v2(rng, CFG_V2)
    got = decode_nms_pallas(net, CFG_V2, 0.5, 0.5, max_outputs=K)
    want = _reference(net, CFG_V2)
    _assert_equivalent(got, want)


def test_fused_nms_v2_suppresses_duplicates():
    """Two anchor slots in one cell decoded to the same box + class →
    one survivor (anchor priors differ, so the wh logits are chosen per
    slot to hit the same 0.3×0.3 box)."""
    cfg = CFG_V2
    C = cfg.num_class
    net = np.zeros((1, cfg.S, cfg.S, cfg.cell_channels), np.float32)
    for b in (0, 1):
        base = b * (5 + C)
        aw, ah = cfg.anchors[b]
        net[0, 3, 3, base + 2] = np.log(0.3 * cfg.S / aw)  # w = 0.3
        net[0, 3, 3, base + 3] = np.log(0.3 * cfg.S / ah)  # h = 0.3
        net[0, 3, 3, base + 4] = 4.0 - b  # conf: slot 0 wins
        net[0, 3, 3, base + 5] = 5.0      # class 0
    got = decode_nms_pallas(net, cfg, 0.5, 0.5, max_outputs=K)
    s = np.asarray(got.scores[0])
    assert (s > 0).sum() == 1
    assert np.asarray(got.classes[0])[0] == 0
    want = _reference(net, cfg)
    _assert_equivalent(got, want)


def test_fused_nms_empty_grid():
    net = np.zeros((2, CFG.S, CFG.S, CFG.cell_channels), np.float32)
    got = decode_nms_pallas(net, CFG, 0.5)
    assert np.asarray(got.scores).max() == 0.0


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs the real TPU backend")
def test_fused_nms_compiled_on_tpu(rng):
    """The serving kernel compiled by Mosaic (interpret=False) matches the
    jnp reference path — the VERDICT r1 requirement that the flagship
    kernel is exercised compiled, not only interpreted."""
    for cfg in (CFG, CFG448, CFG_V2):
        net = (_random_grid_v2(rng, cfg, batch=2) if cfg.per_slot_classes
               else _random_grid(rng, cfg, batch=2))
        got = decode_nms_pallas(net, cfg, 0.5, 0.5, max_outputs=K,
                                interpret=False)
        got = jax.tree_util.tree_map(np.asarray, got)  # force host fetch
        want = _reference(net, cfg)
        _assert_equivalent(got, want)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs the real TPU backend")
def test_decode_only_compiled_on_tpu(rng):
    net = _random_grid(rng, CFG, batch=2)
    got = decode_grid_pallas(net, CFG, 0.5, interpret=False)
    got = jax.tree_util.tree_map(np.asarray, got)
    want = jax.vmap(lambda g: decode_grid(g, CFG, 0.5))(net)
    np.testing.assert_allclose(got.boxes, np.asarray(want.boxes),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.scores, np.asarray(want.scores),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got.classes, np.asarray(want.classes))
