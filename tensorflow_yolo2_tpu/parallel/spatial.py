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
activation. Works on folded inference params (conv+bias only,
models.fold).
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
        n = mesh.shape[axis]
        h = images.shape[1]
        if h % (32 * n) != 0:
            raise ValueError(
                f"H={h} must be divisible by 32·{n} for {n}-way spatial "
                "sharding (5 pools of stride 2)")
        images = jax.device_put(
            images, NamedSharding(mesh, P(None, axis, None, None)))
        return fn(folded_params, images)

    return forward
