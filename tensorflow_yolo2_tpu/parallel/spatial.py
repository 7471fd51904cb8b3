"""Spatial (height) sharding of conv feature maps with halo exchange.

The stretch capability from SURVEY §5.7: the reference has no sequence
dimension — its "long context" analog is input resolution, fixed per
script. For resolutions whose activations outgrow one chip, this module
shards the H dimension of the NHWC activations across a mesh axis and
runs the whole Darknet19 trunk inside ``shard_map``:

- each stride-1 3×3 conv needs one boundary row from each neighbor:
  :func:`halo_exchange` fetches it with ``lax.ppermute`` over ICI. Edge
  shards receive zeros from the permute — exactly SAME-conv zero padding,
  so results are bitwise-equivalent in structure to the unsharded net;
- 2×2/2 max pools never cross shard boundaries while the local height
  stays even, so they need no exchange;
- 1×1 convs are purely local.

This is the CNN cousin of ring attention: per-layer neighbor exchanges
(O(W·C) bytes) ride the ICI while each chip holds 1/N of every
activation. Works on folded params (conv+bias only, models.fold) — for
inference (:func:`spatial_backbone_fn`) and for frozen-BN training:
:func:`spatial_yolo_loss_fn` runs trunk + detection head + the YOLO loss
sharded, psum-reduced, and differentiable end-to-end.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Mapping

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensorflow_yolo2_tpu.models.darknet import _DARKNET19_SCHEDULE
from tensorflow_yolo2_tpu.models.layers import leaky_relu


def halo_exchange(x: jnp.ndarray, axis_name: str, halo: int = 1) -> jnp.ndarray:
    """Concatenate ``halo`` boundary rows from the up/down neighbors.

    x: (B, H_local, W, C) inside shard_map. Devices at the ends receive
    zeros (ppermute semantics), matching SAME zero padding.
    """
    n = lax.axis_size(axis_name)
    # rows coming from the previous shard (they sit above our block)
    from_prev = lax.ppermute(x[:, -halo:], axis_name,
                             perm=[(i, i + 1) for i in range(n - 1)])
    # rows coming from the next shard (below our block)
    from_next = lax.ppermute(x[:, :halo], axis_name,
                             perm=[(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def _conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
          h_padding: str) -> jnp.ndarray:
    """NHWC stride-1 conv, SAME on W, VALID/SAME on H."""
    kh = kernel.shape[0]
    pad_w = (kernel.shape[1] - 1) // 2
    pad_h = (0, 0) if h_padding == "VALID" else ((kh - 1) // 2,) * 2
    y = lax.conv_general_dilated(
        x, kernel, (1, 1),
        padding=(tuple(pad_h), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


def _sharded_trunk(params: Mapping[str, Any], x: jnp.ndarray,
                   axis_name: str) -> jnp.ndarray:
    """Darknet19 trunk on one H-shard (runs inside shard_map)."""
    conv_i = 0
    for item in _DARKNET19_SCHEDULE:
        if item == "M":
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
            continue
        conv_i += 1
        p = params[f"conv{conv_i}"]["conv"]
        k, b = p["kernel"], p["bias"]
        if k.shape[0] == 3:
            x = _conv(halo_exchange(x, axis_name), k, b, h_padding="VALID")
        else:  # 1×1: purely local
            x = _conv(x, k, b, h_padding="SAME")
        x = leaky_relu(x)
    return x


def _sharded_detector(params: Mapping[str, Any], x: jnp.ndarray,
                      axis_name: str, bn_on_output: bool) -> jnp.ndarray:
    """Folded Darknet19 detector (trunk + head) on one H-shard.

    Head per reference darknet19_detection (darknet.py:182-201): 3×(3×3
    conv, halo-exchanged) + 1×1 output conv, leaky on the output when the
    BN-on-output quirk is active (models.darknet.DetectionHead)."""
    x = _sharded_trunk(params["backbone"], x, axis_name)
    head = params["detection"]
    for i in range(1, 4):
        p = head[f"conv{i}"]["conv"]
        x = leaky_relu(_conv(halo_exchange(x, axis_name),
                             p["kernel"], p["bias"], h_padding="VALID"))
    p = head["output"]["conv"]
    x = _conv(x, p["kernel"], p["bias"], h_padding="SAME")
    if bn_on_output:
        x = leaky_relu(x)
    return x.astype(jnp.float32)


def _put_h_sharded(mesh: Mesh, axis: str, x: jnp.ndarray) -> jnp.ndarray:
    """Validate H divisibility and lay ``x`` out H-sharded over ``axis``."""
    n = mesh.shape[axis]
    h = x.shape[1]
    if h % (32 * n) != 0:
        raise ValueError(
            f"H={h} must be divisible by 32·{n} for {n}-way spatial "
            "sharding (5 pools of stride 2)")
    return jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))


def spatial_detector_fn(mesh: Mesh, axis: str = "data",
                        bn_on_output: bool = True):
    """Build a jitted H-sharded detector forward: folded trunk + head →
    the (B, S, S, cc) detection grid, gathered. High-resolution serving
    twin of :func:`spatial_yolo_loss_fn`; decode the returned grid with
    ops.pallas_decode.decode_nms_pallas as usual."""
    fn = jax.jit(
        jax.shard_map(
            partial(_sharded_detector, axis_name=axis,
                    bn_on_output=bn_on_output),
            mesh=mesh,
            in_specs=(P(), P(None, axis, None, None)),
            out_specs=P(None, axis, None, None),
        )
    )

    def forward(folded_params, images):
        return fn(folded_params, _put_h_sharded(mesh, axis, images))

    return forward


def spatial_yolo_loss_fn(mesh: Mesh, cfg, axis: str = "data",
                         bn_on_output: bool = True):
    """Build a jitted H-sharded YOLO detection LOSS — spatial sharding
    for *training*, not just inference.

    The trunk + detection head run inside ``shard_map`` with halo
    exchange; each shard owns ``S/n`` grid rows and the matching label
    rows, computes its per-image λ-weighted loss-term sums with
    globally-correct row offsets (``losses.yolo.yolo_loss_term_sums``),
    and the total is the ``psum`` of the shard sums — numerically the
    unsharded :func:`losses.yolo.yolo_loss` (sums of per-cell squares
    commute with the row partition). Differentiable end-to-end
    (``ppermute`` transposes to the reverse permute), so
    ``jax.grad(loss_fn)`` trains at resolutions whose activations exceed
    one chip. Uses folded conv+bias params (frozen-BN fine-tuning).

    Returns ``loss_fn(folded_params, images, labels)`` with images
    (B, H, W, 3) H-sharded and labels (B, S, S, 5+C) row-sharded over
    ``axis``; requires H % (32·n) == 0 and S % n == 0.
    """
    import numpy as np

    from tensorflow_yolo2_tpu.losses.yolo import yolo_loss_term_sums

    n = mesh.shape[axis]
    if cfg.S % n:
        raise ValueError(f"S={cfg.S} must be divisible by the {n}-way "
                         "spatial axis")
    rows = cfg.S // n
    offset_np = np.asarray(cfg.offset, np.float32)          # [y,x,b] = x
    offset_t_np = offset_np.transpose(1, 0, 2).copy()       # [y,x,b] = y

    def _local(params, x, labels):
        grid = _sharded_detector(params, x, axis, bn_on_output)
        idx = lax.axis_index(axis)
        off = lax.dynamic_slice_in_dim(
            jnp.asarray(offset_np), idx * rows, rows, 0)
        off_t = lax.dynamic_slice_in_dim(
            jnp.asarray(offset_t_np), idx * rows, rows, 0)
        class_s, object_s, noobject_s, coord_s, _, _ = yolo_loss_term_sums(
            grid, labels, cfg, offsets=(off, off_t))
        local = jnp.mean(class_s + object_s + noobject_s + coord_s)
        return lax.psum(local, axis)

    fn = jax.jit(
        jax.shard_map(
            _local,
            mesh=mesh,
            in_specs=(P(), P(None, axis, None, None),
                      P(None, axis, None, None)),
            out_specs=P(),
        )
    )

    def loss_fn(folded_params, images, labels):
        # the detector grid must match cfg's label grid exactly — a
        # mismatch would silently broadcast label rows across grid rows
        # inside the shard and train on garbage
        if images.shape[1] != 32 * cfg.S or images.shape[2] != 32 * cfg.S:
            raise ValueError(
                f"images {images.shape[1]}×{images.shape[2]} do not map "
                f"to cfg's S={cfg.S} grid — expected "
                f"{32 * cfg.S}×{32 * cfg.S}")
        if labels.shape[1:3] != (cfg.S, cfg.S):
            raise ValueError(
                f"labels grid {labels.shape[1:3]} != (S, S) = "
                f"({cfg.S}, {cfg.S})")
        images = _put_h_sharded(mesh, axis, images)
        labels = jax.device_put(
            labels, NamedSharding(mesh, P(None, axis, None, None)))
        return fn(folded_params, images, labels)

    return loss_fn


def spatial_backbone_fn(mesh: Mesh, axis: str = "data"):
    """Build a jitted H-sharded Darknet19 trunk forward.

    Returns ``fn(folded_params, images)`` where images (B, H, W, 3) are
    sharded on H over ``axis``; H must satisfy H % (32·mesh[axis]) == 0 so
    every shard's height stays even through all five pools.
    """
    fn = jax.jit(
        jax.shard_map(
            partial(_sharded_trunk, axis_name=axis),
            mesh=mesh,
            in_specs=(P(), P(None, axis, None, None)),
            out_specs=P(None, axis, None, None),
        )
    )

    def forward(folded_params, images):
        return fn(folded_params, _put_h_sharded(mesh, axis, images))

    return forward
