"""Fused Pallas decode kernel: raw grid → thresholded detections.

The north-star TPU design point: the YOLO decode (grid offsets, w/h
squaring, per-cell class argmax, confidence threshold) fused into one VMEM
pass per image instead of the ~10 separate XLA ops the jnp decode lowers
to. One grid step processes one image: the (S·S, 5B+C) prediction block is
read from VMEM once, and boxes/scores/classes are written once.

The tensors are small (S·S×30 for the VOC config), so this kernel's value
is latency: single-image p50 is dominated by kernel-launch and HBM-round-
trip overheads, which fusion removes. Equivalent in behavior to
ops.boxes.decode_grid (reference decode: net_utils.py:375-439).

On CPU (tests / no TPU) the kernel runs in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflow_yolo2_tpu.config import YoloConfig
from tensorflow_yolo2_tpu.ops.boxes import Detections


def _decode_kernel(net_ref, boxes_ref, scores_ref, classes_ref, *,
                   S: int, B: int, C: int, thresh: float):
    """One image: net (S·S, 5B+C) → boxes (S·S, 4B), scores/classes (S·S, B)."""
    net = net_ref[0].astype(jnp.float32)  # (S*S, 5B+C)
    n_cells = S * S

    # Per-cell grid coordinates from the flat cell index.
    cell = jax.lax.broadcasted_iota(jnp.int32, (n_cells, 1), 0)
    row = (cell // S).astype(jnp.float32)  # y index
    col = (cell % S).astype(jnp.float32)   # x index

    # Per-cell class argmax (reference: np.argmax(predict_classes[c, r])).
    cls = jnp.argmax(net[:, :C], axis=-1, keepdims=True).astype(jnp.int32)
    classes_ref[0] = jnp.broadcast_to(cls, (n_cells, B))

    conf = net[:, C:C + B]  # (n_cells, B)
    scores_ref[0] = jnp.where(conf > thresh, conf, 0.0)

    for b in range(B):  # static unroll over box slots
        raw = net[:, C + B + 4 * b: C + B + 4 * (b + 1)]
        x = (raw[:, 0:1] + col) / float(S)
        y = (raw[:, 1:2] + row) / float(S)
        w = jnp.square(raw[:, 2:3])
        h = jnp.square(raw[:, 3:4])
        corners = jnp.concatenate(
            [x - w / 2.0, y - h / 2.0, x + w / 2.0, y + h / 2.0], axis=-1)
        boxes_ref[0, :, 4 * b:4 * (b + 1)] = corners


@functools.partial(jax.jit, static_argnames=("cfg", "object_thresh", "interpret"))
def decode_grid_pallas(net: jnp.ndarray, cfg: YoloConfig,
                       object_thresh: float = 0.5,
                       interpret: bool | None = None) -> Detections:
    """Fused decode of a batched (batch, S, S, 5B+C) prediction tensor.

    Returns dense Detections with leading batch dim:
    boxes (batch, S·S·B, 4), scores/classes (batch, S·S·B).
    """
    if cfg.per_slot_classes:
        raise ValueError(
            "decode_grid_pallas implements the v1 [C | B conf | boxes] "
            "layout; per-slot (v2 anchor) heads decode via "
            "ops.boxes.decode_grid_v2")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    S, B, C = cfg.S, cfg.B, cfg.num_class
    batch = net.shape[0]
    n_cells, n = S * S, S * S * B
    flat = net.reshape(batch, n_cells, cfg.cell_channels)

    kernel = functools.partial(_decode_kernel, S=S, B=B, C=C,
                               thresh=float(object_thresh))
    boxes, scores, classes = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[pl.BlockSpec((1, n_cells, cfg.cell_channels),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, n_cells, 4 * B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_cells, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_cells, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, n_cells, 4 * B), jnp.float32),
            jax.ShapeDtypeStruct((batch, n_cells, B), jnp.float32),
            jax.ShapeDtypeStruct((batch, n_cells, B), jnp.int32),
        ),
        interpret=interpret,
    )(flat)

    return Detections(
        boxes.reshape(batch, n_cells, B, 4).reshape(batch, n, 4),
        scores.reshape(batch, n),
        classes.reshape(batch, n),
    )
