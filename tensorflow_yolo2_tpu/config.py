"""Typed configuration system.

Replaces the reference's two config tiers with one typed system:
- module-level constants + run-dir helpers (reference: src/config.py:10-89)
- the slim ``tf.app.flags`` knob surface (reference:
  src/slim_dir/train_image_classifier.py:57-370) — exposed here as the
  :class:`TrainConfig` / :class:`OptimizerConfig` dataclasses consumed by
  ``train.optimizers`` and the CLI entries.

All hyperparameter defaults mirror the reference values so behavior is
comparable out of the box (BATCH_SIZE=48, IMAGE_SIZE=224, S=7, B=2,
LAMBDA_COORD=5, LAMBDA_NOOBJ=0.5 — src/config.py:32-45).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Sequence

import numpy as np

# ---------------------------------------------------------------------------
# Path layout (reference: src/config.py:7-24). The root is overridable with
# TFY2_ROOT so tests and benchmarks can point at a scratch directory.
# ---------------------------------------------------------------------------

_PKG_DIR = os.path.dirname(__file__)
_DEFAULT_ROOT = os.path.abspath(os.path.join(_PKG_DIR, os.pardir))


def root_dir() -> str:
    return os.environ.get("TFY2_ROOT", _DEFAULT_ROOT)


@dataclass(frozen=True)
class Paths:
    """Canonical run-directory layout (reference: src/config.py:10-24,55-89)."""

    root: str = field(default_factory=root_dir)

    @property
    def pascal(self) -> str:
        return os.path.join(self.root, "data", "VOCdevkit")

    @property
    def ilsvrc(self) -> str:
        return os.path.join(self.root, "data", "ILSVRC")

    @property
    def flowers(self) -> str:
        return os.path.join(self.root, "data", "TF_flowers")

    @property
    def cache(self) -> str:
        return os.path.join(self.root, "cache")

    @property
    def weights(self) -> str:
        return os.path.join(self.root, "weights")

    @property
    def ckpts(self) -> str:
        return os.path.join(self.root, "ckpts")

    @property
    def tensorboard(self) -> str:
        return os.path.join(self.root, "tensorboard")

    def ckpts_dir(self, network_name: str, imdb_name: str) -> str:
        """Per-(net, dataset) checkpoint dir (reference: src/config.py:78-89)."""
        out = os.path.join(self.ckpts, network_name, imdb_name)
        os.makedirs(out, exist_ok=True)
        return out

    def tb_dirs(self, network_name: str, imdb_name: str, val: bool = True):
        """(train_dir, val_dir) metric-writer dirs (reference: src/config.py:55-75)."""
        out = os.path.join(self.tensorboard, network_name, imdb_name)
        train_dir = os.path.join(out, "train")
        os.makedirs(train_dir, exist_ok=True)
        val_dir = None
        if val:
            val_dir = os.path.join(out, "val")
            os.makedirs(val_dir, exist_ok=True)
        return train_dir, val_dir


# Snapshot naming (reference: src/config.py:30, net_utils.py:27-28).
TRAIN_SNAPSHOT_PREFIX = "train"

# ---------------------------------------------------------------------------
# Detection grid hyperparameters (reference: src/config.py:32-45).
# ---------------------------------------------------------------------------


def scope_matches(key: str, scopes) -> bool:
    """True when a '/'-joined pytree path lies inside any scope prefix.

    Matching is per path component: 'backbone/conv1' matches
    'backbone/conv1/kernel' but NOT 'backbone/conv19/kernel' (bare
    startswith would silently include sibling layers sharing the
    prefix). Used by trainable-scope masks, grouped optimizers and
    checkpoint scope exclusions."""
    return any(key == s or key.startswith(s + "/") for s in scopes)


def yolo_grid_offset(S: int, B: int) -> np.ndarray:
    """The [S, S, B] column-index offset grid.

    ``offset[y, x, b] == x``; its (1, 0, 2) transpose gives the row index.
    Mirrors the construction at reference src/config.py:40-42.
    """
    off = np.tile(np.arange(S, dtype=np.float32), S * B).reshape(B, S, S)
    return np.transpose(off, (1, 2, 0))


@dataclass(frozen=True)
class YoloConfig:
    """YOLO grid-detection head/loss hyperparameters.

    The head emits ``S*S`` cells with channel layout
    ``[num_class | B confidences | B*(x, y, w, h)]`` (5B + C channels;
    reference: src/pascal/pascal_train_darknet.py:40-42). The generalized
    ``per_slot_classes`` layout gives every box slot its own class logits
    (``B*(5 + C)`` channels) — the natural superset covering the
    anchor-based YOLOv2 decode.
    """

    S: int = 7
    B: int = 2
    num_class: int = 20
    image_size: int = 224
    lambda_coord: float = 5.0
    lambda_noobj: float = 0.5
    per_slot_classes: bool = False
    # Anchor priors (w, h) in grid-cell units, used only by the v2-style
    # decode/loss; the reference YOLOv1 path has no anchors (SURVEY caveat).
    anchors: tuple[tuple[float, float], ...] = ()
    # -- YOLO9000 training stabilizers (losses.yolo_v2 only; the darknet
    # region-loss semantics the reference never implemented) --------------
    # Slots whose best IoU against ANY ground-truth box exceeds this are
    # exempt from the no-object penalty (darknet region_layer thresh=0.6);
    # 1.0 disables the exemption.
    v2_ignore_iou: float = 0.6
    # For the first N training *samples*, regress non-owner raw boxes
    # toward their anchor prior at cell center (σ(txy)→0.5, twh→0) with
    # weight v2_prior_weight (darknet's seen<12800 burn-in). Active only
    # when the trainer threads the step count into the loss.
    v2_burnin_samples: int = 12800
    v2_prior_weight: float = 0.01
    # Scale the coord term per object by (2 − w·h) (w, h image fractions):
    # small boxes get up to 2× coordinate weight (darknet region loss).
    v2_coord_scale: bool = True

    @property
    def cell_channels(self) -> int:
        if self.per_slot_classes:
            return self.B * (5 + self.num_class)
        return self.num_class + 5 * self.B

    @property
    def offset(self) -> np.ndarray:
        return yolo_grid_offset(self.S, self.B)

    def at_scale(self, S: int) -> "YoloConfig":
        """This config re-gridded to an ``S``-cell grid (input = 32·S px).

        Anchor priors are stored in grid-cell units, so they rescale by
        the grid-size ratio — constant as image fractions, the YOLOv2
        multiscale property."""
        if S == self.S:
            return self
        factor = S / self.S
        # no rounding: yolo_v2_config(32*S) and yolo_v2_config().at_scale(S)
        # must produce bit-identical anchors (train/serve consistency)
        return dataclasses.replace(
            self, S=S, image_size=self.image_size * S // self.S,
            anchors=tuple((w * factor, h * factor)
                          for w, h in self.anchors))


# Classic YOLOv2 VOC anchor priors in 13-grid cell units (the YOLO9000
# k-means priors). The reference has no anchors at all (SURVEY caveat);
# these back the --v2 head in the pascal entries.
CLASSIC_VOC_ANCHORS = (
    (1.3221, 1.73145), (3.19275, 4.00944), (5.05587, 8.09892),
    (8.98282, 9.77052), (11.2364, 10.0071))


def yolo_v2_config(image_size: int = 224,
                   anchors: tuple[tuple[float, float], ...] | None = None
                   ) -> YoloConfig:
    """Anchor-head ``YoloConfig`` at ``image_size`` (multiple of 32).

    Default priors are the paper's published VOC clusters
    (``CLASSIC_VOC_ANCHORS``) rescaled from the 13-grid to this run's
    S = image_size/32 grid. Pass ``anchors`` — (w, h) pairs already in
    *this grid's* cell units, e.g. dataset-specific dimension clusters
    from ``data.anchors.iou_kmeans`` — to override them; B follows
    len(anchors)."""
    S = image_size // 32
    if anchors is None:
        scale = S / 13.0
        anchors = tuple((w * scale, h * scale)
                        for w, h in CLASSIC_VOC_ANCHORS)
    else:
        anchors = tuple((float(w), float(h)) for w, h in anchors)
    return YoloConfig(S=S, image_size=image_size, B=len(anchors),
                      per_slot_classes=True, anchors=anchors)


# ---------------------------------------------------------------------------
# Training knob surface = union of the hard-coded per-script hypers and the
# slim flag set (reference: train_image_classifier.py:57-370).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LRScheduleConfig:
    """Learning-rate schedule (reference: train_image_classifier.py:270-336)."""

    kind: str = "fixed"  # fixed | exponential | polynomial | cosine
    learning_rate: float = 1e-3
    decay_factor: float = 0.94
    decay_steps: int = 10_000
    end_learning_rate: float = 1e-4
    power: float = 1.0
    warmup_steps: int = 0
    # Subtract this from the optimizer's step count before evaluating the
    # schedule. Under snapshot-resume the optax count restores
    # cumulatively, so a stage-local schedule (decay_steps = this
    # invocation's --iters) must anchor at the resumed step or the whole
    # stage trains past decay_steps at the floor LR.
    offset_steps: int = 0


@dataclass(frozen=True)
class OptimizerConfig:
    """Optimizer family + hypers (reference: train_image_classifier.py:96-269)."""

    name: str = "adam"  # adadelta|adagrad|adam|ftrl|momentum|sgd|rmsprop|lamb|adamw
    momentum: float = 0.9
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    epsilon: float = 1e-8  # TF1 AdamOptimizer default (parity)
    rmsprop_decay: float = 0.9
    adadelta_rho: float = 0.95
    ftrl_learning_rate_power: float = -0.5
    ftrl_initial_accumulator_value: float = 0.1
    ftrl_l1: float = 0.0
    ftrl_l2: float = 0.0
    weight_decay: float = 0.0
    grad_clip_norm: float | None = None
    # Exponential moving average of params (slim --moving_average_decay).
    moving_average_decay: float | None = None
    # Train only variables under these name prefixes (slim --trainable_scopes).
    trainable_scopes: tuple[str, ...] = ()
    # Accumulate gradients over k micro-batches before applying one
    # update (effective batch = k × batch) — the HBM-friendly route to
    # reference-scale global batches on few chips.
    grad_accum_steps: int = 1
    schedule: LRScheduleConfig = field(default_factory=LRScheduleConfig)


@dataclass(frozen=True)
class TrainConfig:
    """One training run (union of reference entry-script hypers)."""

    network_name: str = "darknet19"
    imdb_name: str = "voc_2007"
    batch_size: int = 48  # reference src/config.py:32
    image_size: int = 224  # reference src/config.py:34
    rand_crop_upbound: int = 292  # reference src/config.py:35
    max_iters: int = 80_000
    save_every_iters: int = 40_000
    save_every_epochs: int = 2
    save_by_epoch: bool = False
    log_every: int = 10
    eval_every: int = 25
    keep_checkpoints: int = 5
    seed: int = 0
    # Compute precision: params fp32; activations/matmuls in this dtype.
    compute_dtype: str = "bfloat16"
    # Cross-replica BatchNorm statistics sync over the data axis.
    sync_batchnorm: bool = False
    # Mesh shape: data-parallel size resolved at runtime if None.
    data_parallel: int | None = None
    model_parallel: int = 1
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    # Warm-start: restore from this checkpoint, excluding these scopes
    # (slim --checkpoint_exclude_scopes; net_utils.py:177-199).
    warm_start_from: str | None = None
    warm_start_exclude: tuple[str, ...] = ()


def replace(cfg: Any, **kw: Any) -> Any:
    """Convenience: functional update for the frozen config dataclasses."""
    return dataclasses.replace(cfg, **kw)


# VOC2007 class list (reference: src/img_dataset/pascal_voc.py:23-27).
VOC_CLASSES: Sequence[str] = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)
