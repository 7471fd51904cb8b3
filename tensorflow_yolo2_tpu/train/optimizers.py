"""Optimizer + LR-schedule factories on optax.

Capability of the slim flag surface (reference
train_image_classifier.py:96-370 ``_configure_optimizer`` /
``_configure_learning_rate``): the full optimizer family
{adadelta, adagrad, adam, ftrl, momentum, sgd, rmsprop} plus schedules
{fixed, exponential, polynomial} (cosine and warmup added), parameter EMA
(--moving_average_decay), gradient clipping, weight decay, and
scope-limited training (--trainable_scopes; also the capability behind
imagenet_train_resnet.py:54-59 which trains only the logits scope).

Hyperparameter defaults mirror the TF1 optimizers' defaults so training
dynamics are comparable (e.g. Adam epsilon 1e-8).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax

from tensorflow_yolo2_tpu.config import scope_matches, LRScheduleConfig, OptimizerConfig


def make_schedule(cfg: LRScheduleConfig) -> optax.Schedule:
    """LR schedule (reference train_image_classifier.py:270-336)."""
    base: optax.Schedule
    if cfg.kind == "fixed":
        base = optax.constant_schedule(cfg.learning_rate)
    elif cfg.kind == "exponential":
        base = optax.exponential_decay(
            cfg.learning_rate, cfg.decay_steps, cfg.decay_factor,
            staircase=True)
    elif cfg.kind == "polynomial":
        base = optax.polynomial_schedule(
            cfg.learning_rate, cfg.end_learning_rate, cfg.power,
            cfg.decay_steps)
    elif cfg.kind == "cosine":
        base = optax.cosine_decay_schedule(cfg.learning_rate, cfg.decay_steps,
                                           alpha=cfg.end_learning_rate /
                                           max(cfg.learning_rate, 1e-12))
    else:
        raise ValueError(f"unknown schedule {cfg.kind!r}")
    if cfg.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, cfg.learning_rate,
                                       cfg.warmup_steps)
        base = optax.join_schedules([warmup, base], [cfg.warmup_steps])
    if cfg.offset_steps:
        # Stage-local schedule under snapshot-resume: the optax count is
        # restored cumulatively, so shift it back to the stage boundary.
        # The clamp covers the optimizer-swap resume path (count re-init
        # to 0 while the snapshot step is ahead): there the schedule
        # simply restarts, which is the correct semantics for a freshly
        # initialized optimizer.
        inner = base
        offset = cfg.offset_steps

        def shifted(count):
            import jax.numpy as jnp
            return inner(jnp.maximum(count - offset, 0))

        return shifted
    return base


def _core(cfg: OptimizerConfig, lr: optax.Schedule) -> optax.GradientTransformation:
    """The optimizer family switch (reference
    train_image_classifier.py:225-269)."""
    name = cfg.name.lower()
    if name == "adadelta":
        return optax.adadelta(lr, rho=cfg.adadelta_rho, eps=cfg.epsilon)
    if name == "adagrad":
        return optax.adagrad(lr)
    if name == "adam":
        return optax.adam(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                          eps=cfg.epsilon)
    if name == "adamw":
        return optax.adamw(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                           eps=cfg.epsilon, weight_decay=cfg.weight_decay)
    if name == "ftrl":
        # optax has no ftrl; adagrad with L1/L2 via additive decay is the
        # closest composable equivalent of TF1 FtrlOptimizer.
        parts = [optax.adagrad(
            lr, initial_accumulator_value=cfg.ftrl_initial_accumulator_value)]
        if cfg.ftrl_l2:
            parts.insert(0, optax.add_decayed_weights(cfg.ftrl_l2))
        return optax.chain(*parts)
    if name == "momentum":
        return optax.sgd(lr, momentum=cfg.momentum)
    if name == "sgd":
        return optax.sgd(lr)
    if name == "rmsprop":
        return optax.rmsprop(lr, decay=cfg.rmsprop_decay,
                             momentum=cfg.momentum, eps=cfg.epsilon)
    if name == "lamb":
        return optax.lamb(lr, weight_decay=cfg.weight_decay)
    raise ValueError(f"Optimizer [{cfg.name}] was not recognized")


def trainable_mask(params: Any, scopes: tuple[str, ...]) -> Any:
    """Boolean pytree: True where the param path starts with a scope prefix.

    Path elements are joined with '/' (e.g. 'backbone/conv1/conv/kernel'),
    matching the spirit of slim scope names
    (train_image_classifier.py:375-391).
    """
    if not scopes:
        return jax.tree_util.tree_map(lambda _: True, params)

    def check(path, _):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return scope_matches(name, scopes)

    return jax.tree_util.tree_map_with_path(check, params)


def make_optimizer(cfg: OptimizerConfig,
                   params: Any | None = None) -> optax.GradientTransformation:
    """Build the full optax chain: clip → weight decay → optimizer →
    (optional) scope mask. EMA of params is handled by the Trainer (it is
    state alongside, not a transform of, the updates)."""
    lr = make_schedule(cfg.schedule)
    parts: list[optax.GradientTransformation] = []
    if cfg.grad_clip_norm:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay and cfg.name.lower() not in ("adamw", "lamb"):
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    parts.append(_core(cfg, lr))
    tx = optax.chain(*parts) if len(parts) > 1 else parts[0]
    if cfg.trainable_scopes:
        if params is None:
            raise ValueError("trainable_scopes requires params for masking")
        mask = trainable_mask(params, cfg.trainable_scopes)
        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    if cfg.grad_accum_steps and cfg.grad_accum_steps > 1:
        # k micro-batches per update (effective batch = k × batch)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def make_grouped_optimizer(
        groups: "list[tuple[tuple[str, ...], OptimizerConfig]]",
        params: Any,
        default: OptimizerConfig | None = None,
) -> optax.GradientTransformation:
    """Per-scope optimizer groups — the reference's grouped multi-optimizer
    train op (imagenet_train_inception_resnet.py:147-159: ``tf.group`` of
    several ``Optimizer.minimize(var_list=...)`` calls, e.g. Adam(1e-5) on
    the stem convs + Adam(1e-3) on the input-transform conv).

    Each param joins the FIRST group whose scope prefix matches its
    '/'-joined path; unmatched params use ``default`` when given, else
    they are frozen (the reference freezes everything outside the listed
    var_lists).
    """
    transforms: dict[str, optax.GradientTransformation] = {
        f"group{i}": make_optimizer(cfg) for i, (_, cfg) in enumerate(groups)
    }
    transforms["rest"] = (make_optimizer(default) if default is not None
                          else optax.set_to_zero())

    def label(path, _):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        for i, (scopes, _) in enumerate(groups):
            if scope_matches(name, scopes):
                return f"group{i}"
        return "rest"

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.multi_transform(transforms, labels)


def make_ema(decay: float) -> Callable[[Any, Any], Any]:
    """Parameter EMA update fn (slim --moving_average_decay,
    train_image_classifier.py:517-521)."""

    def update(ema_params: Any, params: Any) -> Any:
        return jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)

    return update
