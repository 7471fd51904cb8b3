"""BatchNorm folding — the TPU inference fast path.

At inference BN uses frozen moving statistics, so conv→BN collapses to a
single conv with rescaled weights:

    scale  = gamma / sqrt(moving_var + eps)
    kernel' = kernel * scale          (per output channel)
    bias'   = (bias - moving_mean) * scale + beta

This removes every BN op from the inference graph (the reference leaves
them in — tf.layers.batch_normalization at darknet.py:42-44 — and pays
them per step). Use with modules constructed with ``fold_bn=True``.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp


def _fold_one(conv: Mapping[str, Any], bn: Mapping[str, Any],
              stats: Mapping[str, Any], epsilon: float):
    """Fold one conv→BN pair → (kernel', bias', scale).

    Handles bias-free convs (use_bias=False) and scale/center-free BN
    (the inception ConvBNReLU arg-scope) with 0/1 defaults. Missing
    moving statistics default to mean 0 / var 1 per output channel.
    """
    width = conv["kernel"].shape[-1]  # output channels
    dtype = conv["kernel"].dtype

    def default(value):
        return jnp.full((width,), value, dtype)

    mean = stats.get("mean", default(0.0))
    var = stats.get("var", default(1.0))
    gamma = bn.get("scale", default(1.0))
    beta = bn.get("bias", default(0.0))
    conv_bias = conv.get("bias", default(0.0))
    scale = gamma / jnp.sqrt(var + epsilon)
    kernel = conv["kernel"] * scale  # HWIO: broadcasts over O
    bias = (conv_bias - mean) * scale + beta
    return kernel, bias, scale


def fold_params(params: Mapping[str, Any], batch_stats: Mapping[str, Any],
                epsilon: float = 1e-3) -> dict:
    """Fold BN stats into conv weights across a whole variable tree.

    Walks the params tree; any subtree holding both a ``conv`` and a ``bn``
    child (the ConvBN layout, models.layers) is folded into a bare
    ``conv``. Returns a params tree valid for the same module constructed
    with ``fold_bn=True``. Bias-free convs / gamma-free BN (the inception
    ConvBNReLU arg-scope) fold with 0/1 defaults — consuming those needs a
    module that applies conv+bias (the folded conv always carries a bias).
    ``epsilon`` must match the module's BN epsilon (ConvBN default 1e-3).
    """

    def walk(p: Mapping[str, Any], bs: Mapping[str, Any]) -> dict:
        out: dict = {}
        for key, sub in p.items():
            if not isinstance(sub, Mapping):
                out[key] = sub
                continue
            if "conv" in sub and "bn" in sub:  # the conv→BN child pair
                stats = bs.get(key, {}).get("bn", {}) if bs else {}
                kernel, bias, _ = _fold_one(sub["conv"], sub["bn"], stats,
                                            epsilon)
                out[key] = {"conv": {"kernel": kernel, "bias": bias}}
            else:
                out[key] = walk(sub, bs.get(key, {}) if bs else {})
        return out

    return walk(params, batch_stats or {})


def _merge_stats(base: Mapping[str, Any], over: Mapping[str, Any]) -> dict:
    out: dict = dict(base)
    for k, v in over.items():
        if isinstance(v, Mapping) and isinstance(base.get(k), Mapping):
            out[k] = _merge_stats(base[k], v)
        else:
            out[k] = v
    return out


def fold_params_identity(params: Mapping[str, Any],
                         batch_stats: Mapping[str, Any],
                         epsilon: float = 1e-3) -> tuple[dict, dict]:
    """Fold BN statistics into conv weights WITHOUT changing the module.

    Returns ``(params', batch_stats')`` for the *same* model where every
    conv→BN pair's statistics have been absorbed into the conv kernel and
    the BN center: stats become the identity constants (mean 0,
    var 1-eps) and gamma becomes 1, so at inference BN reduces to
    ``x + beta'`` — a constant multiply-by-1/subtract-0 that XLA folds
    away, leaving conv+bias. This is the serving fast path for BN
    layouts that have no ``fold_bn`` construction (the inception
    ConvBNReLU arg-scope); ConvBN-based models can use either this or
    :func:`fold_params` + ``fold_bn=True``.

    BN layers that are NOT part of a conv→BN child pair (resnet-style
    sibling naming like conv1/bn1) pass through untouched — their
    params and statistics are preserved verbatim.

    ``epsilon`` MUST equal the module's own BN epsilon: the identity
    relies on ``sqrt((1-eps_fold) + eps_module) == 1`` exactly, so a
    mismatch introduces a silent per-layer scale error. ConvBN and
    ConvBNReLU both default to 1e-3.
    """

    def walk(p: Mapping[str, Any], bs: Mapping[str, Any]):
        new_p: dict = {}
        new_s: dict = {}
        for key, sub in p.items():
            if not isinstance(sub, Mapping):
                new_p[key] = sub
                continue
            sub_stats = bs.get(key, {}) if bs else {}
            if "conv" in sub and "bn" in sub:  # the conv→BN child pair
                conv = dict(sub["conv"])
                bn = dict(sub["bn"])
                stats = sub_stats.get("bn", {})
                kernel, folded_bias, _ = _fold_one(conv, bn, stats, epsilon)
                width = kernel.shape[-1]
                conv["kernel"] = kernel
                if "bias" in conv:
                    conv["bias"] = jnp.zeros_like(conv["bias"])
                if "scale" in bn:
                    bn["scale"] = jnp.ones_like(bn["scale"])
                if "bias" in bn:
                    bn["bias"] = folded_bias
                elif "bias" in conv:
                    conv["bias"] = folded_bias
                else:  # neither slot exists: nowhere to carry the bias
                    raise ValueError(
                        f"cannot fold {key!r}: conv has no bias and BN "
                        "has no center to carry the folded offset")
                new_p[key] = {**sub, "conv": conv, "bn": bn}
                new_s[key] = _merge_stats(sub_stats, {"bn": {
                    "mean": jnp.zeros((width,), kernel.dtype),
                    "var": jnp.full((width,), 1.0 - epsilon,
                                    kernel.dtype)}})
            else:
                wp, ws = walk(sub, sub_stats)
                new_p[key] = wp
                # un-folded statistics (standalone BNs, resnet-style
                # conv1/bn1 siblings) pass through verbatim
                merged = _merge_stats(sub_stats, ws) if sub_stats else ws
                if merged:
                    new_s[key] = merged
        return new_p, new_s

    return walk(params, batch_stats or {})
