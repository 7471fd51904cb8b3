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


def fold_params(params: Mapping[str, Any], batch_stats: Mapping[str, Any],
                epsilon: float = 1e-3) -> dict:
    """Fold BN stats into conv weights across a whole variable tree.

    Walks the params tree; any subtree holding both a ``conv`` and a ``bn``
    child (the ConvBN layout, models.layers) is folded into a bare
    ``conv``. Returns a params tree valid for the same module constructed
    with ``fold_bn=True``. Bias-free convs / gamma-free BN (the inception
    ConvBNReLU arg-scope) fold with 0/1 defaults — consuming those needs a
    module that applies conv+bias (the folded conv always carries a bias).
    """

    def walk(p: Mapping[str, Any], bs: Mapping[str, Any]) -> dict:
        out: dict = {}
        for key, sub in p.items():
            if not isinstance(sub, Mapping):
                out[key] = sub
                continue
            if "conv" in sub and "bn" in sub:  # the conv→BN child pair
                conv = sub["conv"]
                bn = sub["bn"]
                # bias-free convs (use_bias=False) and scale/center-free BN
                # (inception-family ConvBNReLU) fold with 0/1 defaults
                bn_bias = bn.get("bias")
                width = (bn_bias if bn_bias is not None
                         else conv["kernel"][..., 0, :])
                stats = bs.get(key, {}).get("bn", {}) if bs else {}
                mean = stats.get("mean", jnp.zeros_like(width))
                var = stats.get("var", jnp.ones_like(width))
                gamma = bn.get("scale", jnp.ones_like(mean))
                beta = (bn_bias if bn_bias is not None
                        else jnp.zeros_like(mean))
                conv_bias = conv.get("bias", jnp.zeros_like(mean))
                scale = gamma / jnp.sqrt(var + epsilon)
                kernel = conv["kernel"] * scale  # HWIO: broadcasts over O
                bias = (conv_bias - mean) * scale + beta
                out[key] = {"conv": {"kernel": kernel, "bias": bias}}
            else:
                out[key] = walk(sub, bs.get(key, {}) if bs else {})
        return out

    return walk(params, batch_stats or {})


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
                bn_bias = bn.get("bias")
                width = (bn_bias if bn_bias is not None
                         else conv["kernel"][..., 0, :])
                mean = stats.get("mean", jnp.zeros_like(width))
                var = stats.get("var", jnp.ones_like(width))
                gamma = bn.get("scale", jnp.ones_like(mean))
                beta = (bn_bias if bn_bias is not None
                        else jnp.zeros_like(mean))
                conv_bias = conv.get("bias")
                scale = gamma / jnp.sqrt(var + epsilon)
                conv["kernel"] = conv["kernel"] * scale
                folded_bias = ((conv_bias if conv_bias is not None
                                else jnp.zeros_like(mean)) - mean) * \
                    scale + beta
                if conv_bias is not None:
                    conv["bias"] = jnp.zeros_like(conv_bias)
                if "scale" in bn:
                    bn["scale"] = jnp.ones_like(gamma)
                if bn_bias is not None:
                    bn["bias"] = folded_bias
                elif conv_bias is not None:
                    conv["bias"] = folded_bias
                else:  # neither slot exists: nowhere to carry the bias
                    raise ValueError(
                        f"cannot fold {key!r}: conv has no bias and BN "
                        "has no center to carry the folded offset")
                new_p[key] = {**sub, "conv": conv, "bn": bn}
                new_s[key] = {**sub_stats, "bn": {
                    "mean": jnp.zeros_like(mean),
                    "var": jnp.full_like(var, 1.0 - epsilon)}}
            else:
                wp, ws = walk(sub, sub_stats)
                new_p[key] = wp
                if ws:
                    new_s[key] = ws
        return new_p, new_s

    return walk(params, batch_stats or {})
