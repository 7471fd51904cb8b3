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
  stays even, so they need no exchange; the stride-2 downsample variant
  (``downsample="stride"``) instead needs only the *next* neighbor's
  boundary row (XLA SAME padding for stride 2 pads low 0 / high 1);
- 1×1 convs are purely local.

The per-layer structure is driven by the model's own conv schedule
(``models.darknet._DARKNET19_SCHEDULE`` via :func:`backbone_plan`), so
every trunk variant (pool or stride downsample) and every head (v1 grid,
v2 linear-output anchor, v2 passthrough/reorg) runs spatially — the
round-4 verdict's decoupling item.

This is the CNN cousin of ring attention: per-layer neighbor exchanges
(O(W·C) bytes) ride the ICI while each chip holds 1/N of every
activation. :func:`spatial_detector_fn` serves folded params (conv+bias
only, models.fold) for any head/downsample; :func:`spatial_yolo_loss_fn`
trains frozen-BN; :func:`spatial_yolo_train_fn` trains with live
psum-synced BatchNorm (v1 grid loss); :func:`spatial_yolo_v2_train_fn`
trains the v2 ANCHOR loss live — its ignore-threshold term needs every
GT box in the image, which one ``all_gather`` of the (tiny) label boxes
over the spatial axis supplies — on the plain linear anchor head or the
full passthrough/reorg head (``head="v2p"``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Mapping

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensorflow_yolo2_tpu.models.darknet import _DARKNET19_SCHEDULE
from tensorflow_yolo2_tpu.models.layers import leaky_relu, space_to_depth


def backbone_plan(downsample: str = "pool") -> tuple:
    """The trunk as spatial ops, derived from the model's own schedule
    (models.darknet.Darknet19Backbone consumes the same
    ``_DARKNET19_SCHEDULE``): ``("conv", name, k, stride)``,
    ``("pool",)``, and ``("mid",)`` marking the (H/16, 512) passthrough
    source (the feature map feeding the last downsample)."""
    assert downsample in ("pool", "stride"), downsample
    ops = []
    conv_i = 0
    pool_i = 0
    n_pools = sum(1 for item in _DARKNET19_SCHEDULE if item == "M")
    pending_stride = False
    for item in _DARKNET19_SCHEDULE:
        if item == "M":
            pool_i += 1
            if pool_i == n_pools:
                ops.append(("mid",))
            if downsample == "pool":
                ops.append(("pool",))
            else:
                pending_stride = True  # every "M" precedes a 3×3 conv
        else:
            k, _ = item
            conv_i += 1
            ops.append(("conv", f"conv{conv_i}", k,
                        2 if pending_stride else 1))
            pending_stride = False
    return tuple(ops)


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
          h_padding: str, stride: int = 1) -> jnp.ndarray:
    """NHWC conv, SAME on W, VALID/SAME on H, stride 1 or 2.

    For stride 2 the W padding is (0, 1) — XLA/flax SAME semantics for
    even W (pad_total = k − stride = 1, low = pad_total // 2 = 0)."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    if stride == 1:
        pad_w = ((kw - 1) // 2,) * 2
    else:
        pad_w = (0, 1)
    pad_h = (0, 0) if h_padding == "VALID" else ((kh - 1) // 2,) * 2
    y = lax.conv_general_dilated(
        x, kernel, (stride, stride),
        padding=(tuple(pad_h), tuple(pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


def _spatial_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                  axis_name: str, stride: int = 1) -> jnp.ndarray:
    """One folded conv on an H-shard with whatever exchange it needs:
    3×3/1 → symmetric 1-row halo + VALID; 3×3/2 → next-neighbor row only
    (global SAME stride-2 pads low 0 / high 1, so out row t of this
    shard reads global rows 2t..2t+2 starting AT the shard boundary);
    1×1 → purely local."""
    if kernel.shape[0] == 1:
        return _conv(x, kernel, bias, h_padding="SAME")
    if stride == 1:
        return _conv(halo_exchange(x, axis_name), kernel, bias,
                     h_padding="VALID")
    # stride 2: drop the prev-neighbor halo row; VALID stride-2 over the
    # (H_local + 1) rows [own block + next neighbor's first row] yields
    # exactly H_local/2 rows with global SAME(0,1) semantics (the last
    # shard's next-halo is ppermute zeros = the global pad-high row)
    xh = halo_exchange(x, axis_name)[:, 1:]
    return _conv(xh, kernel, bias, h_padding="VALID", stride=2)


def _sharded_trunk(params: Mapping[str, Any], x: jnp.ndarray,
                   axis_name: str, downsample: str = "pool",
                   want_mid: bool = False):
    """Darknet19 trunk on one H-shard (runs inside shard_map); folded
    conv+bias params. ``want_mid`` also returns the (H/16, 512)
    passthrough feature map (models.darknet return_mid analog)."""
    mid = None
    for op in backbone_plan(downsample):
        if op[0] == "mid":
            mid = x
            continue
        if op[0] == "pool":
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
            continue
        _, name, _, stride = op
        p = params[name]["conv"]
        x = leaky_relu(_spatial_conv(x, p["kernel"], p["bias"],
                                     axis_name, stride))
    if want_mid:
        return x, mid
    return x


def _sharded_detector(params: Mapping[str, Any], x: jnp.ndarray,
                      axis_name: str, bn_on_output: bool,
                      downsample: str = "pool",
                      head: str = "v1") -> jnp.ndarray:
    """Folded detector (trunk + head) on one H-shard.

    ``head="v1"``: the reference head (darknet19_detection,
    darknet.py:182-201) — 3×(3×3 conv, halo-exchanged) + 1×1 output,
    leaky on the output when the BN-on-output quirk is active. With
    ``bn_on_output=False`` this is also the plain --v2 anchor head.
    ``head="v2p"``: the YOLOv2 passthrough head
    (models.darknet.DetectionHeadV2) — conv1+conv2, 1×1 on the H/16 mid
    map, 2×2 space-to-depth reorg (local: the mid shard height is even
    whenever S divides over the axis), channel concat, conv3, linear
    output."""
    head_p = params["detection"]
    if head == "v2p":
        x, mid = _sharded_trunk(params["backbone"], x, axis_name,
                                downsample, want_mid=True)
        for i in (1, 2):
            p = head_p[f"conv{i}"]["conv"]
            x = leaky_relu(_spatial_conv(x, p["kernel"], p["bias"],
                                         axis_name))
        p = head_p["passthrough"]["conv"]
        pt = leaky_relu(_spatial_conv(mid, p["kernel"], p["bias"],
                                      axis_name))
        pt = space_to_depth(pt)  # local: even shard height at H/16
        x = jnp.concatenate([x, pt.astype(x.dtype)], axis=-1)
        p = head_p["conv3"]["conv"]
        x = leaky_relu(_spatial_conv(x, p["kernel"], p["bias"], axis_name))
        p = head_p["output"]["conv"]
        x = _conv(x, p["kernel"], p["bias"], h_padding="SAME")
        return x.astype(jnp.float32)
    x = _sharded_trunk(params["backbone"], x, axis_name, downsample)
    for i in range(1, 4):
        p = head_p[f"conv{i}"]["conv"]
        x = leaky_relu(_spatial_conv(x, p["kernel"], p["bias"], axis_name))
    p = head_p["output"]["conv"]
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
                        bn_on_output: bool = True,
                        downsample: str = "pool", head: str = "v1"):
    """Build a jitted H-sharded detector forward: folded trunk + head →
    the (B, S, S, cc) detection grid, gathered. High-resolution serving
    twin of :func:`spatial_yolo_loss_fn`; decode the returned grid with
    ops.pallas_decode.decode_nms_pallas as usual.

    Covers every served architecture: ``head="v1"`` (bn_on_output=True →
    the reference quirk head; False → the plain --v2 anchor head) and
    ``head="v2p"`` (the passthrough/reorg head), each with "pool" or
    "stride" downsampling."""
    if head not in ("v1", "v2p"):
        raise ValueError(f"unknown spatial head {head!r}")
    fn = jax.jit(
        jax.shard_map(
            partial(_sharded_detector, axis_name=axis,
                    bn_on_output=bn_on_output, downsample=downsample,
                    head=head),
            mesh=mesh,
            in_specs=(P(), P(None, axis, None, None)),
            out_specs=P(None, axis, None, None),
        )
    )

    def forward(folded_params, images):
        return fn(folded_params, _put_h_sharded(mesh, axis, images))

    return forward


def spatial_yolo_loss_fn(mesh: Mesh, cfg, axis: str = "data",
                         bn_on_output: bool = True,
                         downsample: str = "pool"):
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
        grid = _sharded_detector(params, x, axis, bn_on_output,
                                 downsample)
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


def _row_mask(h_local: int, axis_name: str, valid_h: int,
              dtype) -> jnp.ndarray:
    """(1, h_local, 1, 1) mask of globally-valid rows on this shard.

    Row r of shard i is global row ``i·h_local + r``; rows ≥ ``valid_h``
    are padding introduced to relax the H % 32n divisibility."""
    idx = lax.axis_index(axis_name)
    rows = idx * h_local + jnp.arange(h_local)
    return (rows < valid_h).astype(dtype)[None, :, None, None]


def _bn_sync(x: jnp.ndarray, bn: Mapping[str, jnp.ndarray],
             axis_name: str, eps: float, count: float,
             mask: jnp.ndarray | None
             ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Train-mode BatchNorm with batch statistics psum-synced across the
    spatial axis — the GSPMD sync-BN: each shard contributes its local
    (masked) sums over (B, H_local, W) and every shard normalizes with
    the identical global mean/var, exactly the statistics the unsharded
    ``nn.BatchNorm`` computes over the full (B, H, W) batch. ``count`` is
    the static number of VALID elements per channel; padded rows are
    excluded from the sums by ``mask``."""
    xm = x if mask is None else x * mask
    s = lax.psum(jnp.sum(xm, axis=(0, 1, 2)), axis_name)
    ss = lax.psum(jnp.sum(xm * xm, axis=(0, 1, 2)), axis_name)
    mean = s / count
    var = ss / count - mean * mean
    y = (x - mean) * bn["scale"] * lax.rsqrt(var + eps) + bn["bias"]
    return y, mean, var


def _live_conv_bn(x, layer, axis_name, eps, valid_h, stats_out, key,
                  activate=True, stride=1):
    """One ConvBN (conv+bias → sync-BN → leaky → re-mask) on an H-shard.

    ``valid_h`` is the POST-conv valid height (callers halve it before a
    stride-2 conv). Records the layer's batch (mean, var) into
    ``stats_out[key]`` for the moving-average update. Masking after the
    activation keeps padded rows at exact zero so the next layer's halo
    exchange delivers zeros — the same values SAME zero padding gives
    the unsharded net at the image's bottom edge."""
    p = layer["conv"]
    x = _spatial_conv(x, p["kernel"], p["bias"], axis_name, stride)
    n = lax.axis_size(axis_name)
    h_local = x.shape[1]
    padded = valid_h != h_local * n
    mask = (_row_mask(h_local, axis_name, valid_h, x.dtype)
            if padded else None)
    count = float(x.shape[0] * valid_h * x.shape[2])
    x, mean, var = _bn_sync(x, layer["bn"], axis_name, eps, count, mask)
    stats_out[key] = {"mean": mean, "var": var}
    if activate:
        x = leaky_relu(x)
    if mask is not None:
        x = x * mask
    return x


def _sharded_detector_live(params, x, axis_name, valid_h, eps,
                           bn_on_output, stats_out,
                           downsample: str = "pool", head: str = "v1"):
    """UNFOLDED Darknet19 detector (trunk + head) with live sync-BN on
    one H-shard, driven by the model's own conv schedule
    (:func:`backbone_plan` — pool or stride downsampling). ``valid_h``
    is the static un-padded input height; ``stats_out`` collects every
    layer's batch stats (mirrors the Flax ``batch_stats`` tree
    structure). ``head="v1"`` is the 3-conv grid/anchor head
    (``bn_on_output`` selects the reference quirk vs the plain --v2
    linear output); ``head="v2p"`` is the passthrough/reorg head
    (models.darknet.DetectionHeadV2) with live sync-BN on all four of
    its ConvBNs — the H/16 mid map's shard height (2·Sp/n) is even, so
    the space-to-depth reorg stays shard-local exactly as in the folded
    serving path."""
    bstats: dict = {}
    vh = valid_h
    mid = vh_mid = None
    for op in backbone_plan(downsample):
        if op[0] == "mid":
            if head == "v2p":
                mid, vh_mid = x, vh
            continue
        if op[0] == "pool":
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
            vh = (vh + 1) // 2
            # padded rows re-zero: a pool window fully inside the pad
            # region maxes zeros to zero already, but keep it exact
            n = lax.axis_size(axis_name)
            if vh != x.shape[1] * n:
                x = x * _row_mask(x.shape[1], axis_name, vh, x.dtype)
            continue
        _, name, _, stride = op
        if stride == 2:
            vh = (vh + 1) // 2  # SAME stride-2 valid height (pad-low 0)
        x = _live_conv_bn(x, params["backbone"][name], axis_name, eps,
                          vh, bstats, name, stride=stride)
    stats_out["backbone"] = {k: {"bn": v} for k, v in bstats.items()}
    head_p = params["detection"]
    hstats: dict = {}
    if head == "v2p":
        for i in (1, 2):
            x = _live_conv_bn(x, head_p[f"conv{i}"], axis_name, eps, vh,
                              hstats, f"conv{i}")
        pt = _live_conv_bn(mid, head_p["passthrough"], axis_name, eps,
                           vh_mid, hstats, "passthrough")
        # local reorg: shard mid height 2·Sp/n is even and shard start
        # rows are even, so 2×2 blocks never straddle a boundary; padded
        # mid rows (re-masked to zero above) land on padded grid rows
        pt = space_to_depth(pt)
        x = jnp.concatenate([x, pt.astype(x.dtype)], axis=-1)
        x = _live_conv_bn(x, head_p["conv3"], axis_name, eps, vh,
                          hstats, "conv3")
        p = head_p["output"]["conv"]
        x = _conv(x, p["kernel"], p["bias"], h_padding="SAME")
        n = lax.axis_size(axis_name)
        if vh != x.shape[1] * n:
            x = x * _row_mask(x.shape[1], axis_name, vh, x.dtype)
        stats_out["detection"] = {k: {"bn": v} for k, v in hstats.items()}
        return x.astype(jnp.float32)
    for i in range(1, 4):
        x = _live_conv_bn(x, head_p[f"conv{i}"], axis_name, eps, vh,
                          hstats, f"conv{i}")
    if bn_on_output:
        x = _live_conv_bn(x, head_p["output"], axis_name, eps, vh,
                          hstats, "output")
    else:
        p = head_p["output"]["conv"]
        x = _conv(x, p["kernel"], p["bias"], h_padding="SAME")
        n = lax.axis_size(axis_name)
        if vh != x.shape[1] * n:
            x = x * _row_mask(x.shape[1], axis_name, vh, x.dtype)
    stats_out["detection"] = {k: {"bn": v} for k, v in hstats.items()}
    return x.astype(jnp.float32)


def spatial_yolo_train_fn(mesh: Mesh, cfg, axis: str = "data",
                          bn_on_output: bool = True,
                          bn_momentum: float = 0.99,
                          bn_epsilon: float = 1e-3,
                          downsample: str = "pool"):
    """H-sharded YOLO training with LIVE BatchNorm — the full training
    semantics of the unsharded ``Trainer`` (train-mode batch statistics +
    moving-average updates), spatially sharded.

    Lifts both round-2/3 restrictions of :func:`spatial_yolo_loss_fn`:

    - **live BN**, not folded/frozen: every ConvBN computes batch
      statistics per H-shard and ``psum``s them over the spatial axis
      (``_bn_sync`` — the GSPMD analog of sync-BN), so normalization and
      the moving-stat update are bitwise the *global* (B, H, W) batch
      statistics the unsharded ``nn.BatchNorm`` would compute;
    - **no H % 32n requirement**: any H = 32·S input is padded up to the
      next multiple of 32·n with zero rows and every layer re-masks the
      pad region (``_row_mask``), making the padded rows invisible to
      convs (they deliver the same zeros SAME-padding does), to BN sums,
      and to the loss (padded grid rows and label rows are both zero).
      S % n is likewise not required.

    ``downsample`` selects the trunk variant — "pool" (reference parity)
    or "stride" (the pool-free train-perf variant; same param tree).

    Returns ``step_fn(params, batch_stats, images, labels) ->
    (loss, new_batch_stats)`` on the UNFOLDED param tree of
    ``Darknet19Detector`` — differentiate wrt ``params`` for training;
    ``new_batch_stats`` is the momentum moving-average update, identical
    on every shard.
    """
    import numpy as np

    from tensorflow_yolo2_tpu.losses.yolo import yolo_loss_term_sums

    n = mesh.shape[axis]
    # padded grid rows / image rows (next multiple of n / 32n)
    Sp = -(-cfg.S // n) * n
    Hp = 32 * Sp
    rows = Sp // n
    offset_np = np.zeros((Sp, cfg.S, cfg.B), np.float32)
    offset_np[:cfg.S] = np.asarray(cfg.offset, np.float32)      # x-index
    offset_t_np = np.zeros((Sp, cfg.S, cfg.B), np.float32)
    offset_t_np[:cfg.S] = np.asarray(
        cfg.offset, np.float32).transpose(1, 0, 2)              # y-index

    def _local(params, stats, x, labels):
        new_stats: dict = {}
        grid = _sharded_detector_live(params, x, axis, 32 * cfg.S,
                                      bn_epsilon, bn_on_output, new_stats,
                                      downsample)
        idx = lax.axis_index(axis)
        off = lax.dynamic_slice_in_dim(
            jnp.asarray(offset_np), idx * rows, rows, 0)
        off_t = lax.dynamic_slice_in_dim(
            jnp.asarray(offset_t_np), idx * rows, rows, 0)
        class_s, object_s, noobject_s, coord_s, _, _ = yolo_loss_term_sums(
            grid, labels, cfg, offsets=(off, off_t))
        local = jnp.mean(class_s + object_s + noobject_s + coord_s)
        loss = lax.psum(local, axis)
        # moving-average update from the (already psum-synced) batch
        # stats — identical on all shards, replicated out_spec
        updated = jax.tree_util.tree_map(
            lambda old, new: bn_momentum * old + (1 - bn_momentum) * new,
            stats, new_stats)
        return loss, updated

    fn = jax.jit(
        jax.shard_map(
            _local,
            mesh=mesh,
            in_specs=(P(), P(), P(None, axis, None, None),
                      P(None, axis, None, None)),
            out_specs=(P(), P()),
        )
    )

    def step_fn(params, batch_stats, images, labels):
        if images.shape[1] != 32 * cfg.S or images.shape[2] != 32 * cfg.S:
            raise ValueError(
                f"images {images.shape[1]}×{images.shape[2]} do not map "
                f"to cfg's S={cfg.S} grid — expected "
                f"{32 * cfg.S}×{32 * cfg.S}")
        if labels.shape[1:3] != (cfg.S, cfg.S):
            raise ValueError(
                f"labels grid {labels.shape[1:3]} != (S, S) = "
                f"({cfg.S}, {cfg.S})")
        if Hp != 32 * cfg.S:  # pad rows to the shardable height
            pad = Hp - 32 * cfg.S
            images = jnp.pad(images, ((0, 0), (0, pad), (0, 0), (0, 0)))
            labels = jnp.pad(labels, ((0, 0), (0, Sp - cfg.S), (0, 0),
                                      (0, 0)))
        images = jax.device_put(
            images, NamedSharding(mesh, P(None, axis, None, None)))
        labels = jax.device_put(
            labels, NamedSharding(mesh, P(None, axis, None, None)))
        return fn(params, batch_stats, images, labels)

    return step_fn


def spatial_yolo_v2_train_fn(mesh: Mesh, cfg, axis: str = "data",
                             bn_momentum: float = 0.99,
                             bn_epsilon: float = 1e-3,
                             downsample: str = "pool",
                             head: str = "v2"):
    """H-sharded YOLOv2 ANCHOR-loss training with live sync-BN.

    The v2 loss (losses.yolo_v2) is per-cell-sum row-splittable in every
    term except the darknet ignore threshold, which exempts non-owner
    slots whose decoded box overlaps ANY ground-truth object — a global
    property of the image. This builder closes that gap with one
    ``lax.all_gather`` of the (tiny) per-shard GT boxes over the spatial
    axis (S·S·B boxes/image ≈ a few KB — negligible next to the per-layer
    activation halos), then evaluates the loss locally with global row
    offsets and the gathered GT pool (the ``offsets`` / ``ignore_gt`` /
    ``noobj_valid`` hooks of :func:`losses.yolo_v2.yolo_v2_loss`) and
    ``psum``s the per-shard value — numerically the unsharded
    ``yolo_v2_loss`` on the full grid.

    ``head`` selects the architecture: ``"v2"`` is the plain linear-
    output anchor head (``Darknet19Detector(bn_on_output=False)``);
    ``"v2p"`` is the full passthrough/reorg head
    (``Darknet19DetectorV2`` — live sync-BN on its four head ConvBNs,
    shard-local space-to-depth on the H/16 mid map); trunk "pool" or
    "stride" for either. Divisibility is lifted exactly as in
    :func:`spatial_yolo_train_fn` — inputs are zero-row-padded to
    H % 32n == 0 and every layer re-masks, with the no-object term
    masked off the padding rows (σ(0)² ≠ 0, unlike the v1 grid whose
    zeroed outputs make pad-row terms vanish analytically).

    Returns ``step_fn(params, batch_stats, images, labels, step) ->
    (loss, new_batch_stats)``; labels are the per-slot grid
    (B, S, S, B_anchors, 5+C) from ``data/voc.build_label_grid_v2``;
    ``step`` (int array, the optimizer step count) drives the burn-in
    prior schedule.
    """
    import numpy as np

    from tensorflow_yolo2_tpu.losses.yolo_v2 import yolo_v2_loss

    assert cfg.per_slot_classes and cfg.anchors, \
        "spatial v2 training needs the per-slot anchor config"
    if head not in ("v2", "v2p"):
        raise ValueError(f"unknown spatial v2 head {head!r}")
    n = mesh.shape[axis]
    Sp = -(-cfg.S // n) * n
    Hp = 32 * Sp
    rows = Sp // n
    offset_np = np.zeros((Sp, cfg.S, cfg.B), np.float32)
    offset_np[:cfg.S] = np.asarray(cfg.offset, np.float32)      # x-index
    offset_t_np = np.zeros((Sp, cfg.S, cfg.B), np.float32)
    offset_t_np[:cfg.S] = np.asarray(
        cfg.offset, np.float32).transpose(1, 0, 2)              # y-index

    def _local(params, stats, x, labels, step):
        new_stats: dict = {}
        grid = _sharded_detector_live(params, x, axis, 32 * cfg.S,
                                      bn_epsilon, False, new_stats,
                                      downsample, head=head)
        idx = lax.axis_index(axis)
        off = lax.dynamic_slice_in_dim(
            jnp.asarray(offset_np), idx * rows, rows, 0)
        off_t = lax.dynamic_slice_in_dim(
            jnp.asarray(offset_t_np), idx * rows, rows, 0)
        # global GT pool for the ignore term: gather every shard's label
        # boxes (padding rows carry owner=0 and are masked by validity)
        b = labels.shape[0]
        gt_local = labels[..., 1:5] / float(cfg.image_size)
        gather = lambda v: jnp.moveaxis(
            lax.all_gather(v, axis), 0, 1)          # (b, n, rows, S, B, …)
        gt_all = gather(gt_local).reshape(b, -1, 4)
        gt_valid = gather(labels[..., 0]).reshape(b, -1)
        # (1, rows, 1, 1) broadcasts against the (b, rows, S, B) mask
        noobj_valid = (None if Sp == cfg.S else
                       _row_mask(rows, axis, cfg.S, grid.dtype))
        loss, _ = yolo_v2_loss(grid, labels, cfg, step=step,
                               offsets=(off, off_t),
                               ignore_gt=(gt_all, gt_valid),
                               noobj_valid=noobj_valid)
        loss = lax.psum(loss, axis)
        updated = jax.tree_util.tree_map(
            lambda old, new: bn_momentum * old + (1 - bn_momentum) * new,
            stats, new_stats)
        return loss, updated

    fn = jax.jit(
        jax.shard_map(
            _local,
            mesh=mesh,
            in_specs=(P(), P(), P(None, axis, None, None),
                      P(None, axis, None, None, None), P()),
            out_specs=(P(), P()),
        )
    )

    def step_fn(params, batch_stats, images, labels, step):
        if images.shape[1] != 32 * cfg.S or images.shape[2] != 32 * cfg.S:
            raise ValueError(
                f"images {images.shape[1]}×{images.shape[2]} do not map "
                f"to cfg's S={cfg.S} grid — expected "
                f"{32 * cfg.S}×{32 * cfg.S}")
        if labels.ndim != 5 or labels.shape[1:4] != (cfg.S, cfg.S, cfg.B):
            raise ValueError(
                f"labels must be the per-slot (b, {cfg.S}, {cfg.S}, "
                f"{cfg.B}, 5+C) grid, got {labels.shape}")
        if Hp != 32 * cfg.S:  # pad rows to the shardable height
            pad = Hp - 32 * cfg.S
            images = jnp.pad(images, ((0, 0), (0, pad), (0, 0), (0, 0)))
            labels = jnp.pad(labels, ((0, 0), (0, Sp - cfg.S), (0, 0),
                                      (0, 0), (0, 0)))
        images = jax.device_put(
            images, NamedSharding(mesh, P(None, axis, None, None)))
        labels = jax.device_put(
            labels, NamedSharding(mesh, P(None, axis, None, None, None)))
        return fn(params, batch_stats, images, labels,
                  jnp.asarray(step, jnp.int32))

    return step_fn


def spatial_backbone_fn(mesh: Mesh, axis: str = "data",
                        downsample: str = "pool"):
    """Build a jitted H-sharded Darknet19 trunk forward.

    Returns ``fn(folded_params, images)`` where images (B, H, W, 3) are
    sharded on H over ``axis``; H must satisfy H % (32·mesh[axis]) == 0 so
    every shard's height stays even through all five downsamples.
    """
    fn = jax.jit(
        jax.shard_map(
            partial(_sharded_trunk, axis_name=axis, downsample=downsample),
            mesh=mesh,
            in_specs=(P(), P(None, axis, None, None)),
            out_specs=P(None, axis, None, None),
        )
    )

    def forward(folded_params, images):
        return fn(folded_params, _put_h_sharded(mesh, axis, images))

    return forward
