"""Adversarial-training capability (NIPS-2017 adversarial defense).

Capability of the reference's adversarial experiment
(src/imagenet/imagenet_train_inception_resnet.py + the cleverhans FGSM
generator at :26-69 + the ±ε sign-noise aug,
ilsvrc_cls_multithread_scipy.py:364-369):

- :func:`fgsm` — the Fast Gradient Sign Method is one line in JAX:
  ``x + ε·sign(∇ₓ loss)`` via ``jax.grad`` w.r.t. the *input*. The
  reference needs a second TF graph + session and a whole library for
  this; here it is one compiled XLA program alongside the train step.
- :func:`random_sign_noise` — the ±ε uniform-sign noise augmentation.
- :func:`adversarial_train_step_pair` — the reference's per-iteration
  clean-step + adversarial-step recipe (:210-234) as a function the
  Trainer can drive.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def fgsm(loss_fn: Callable[[jnp.ndarray], jnp.ndarray], images: jnp.ndarray,
         epsilon: float, clip: tuple[float, float] = (-1.0, 1.0)
         ) -> jnp.ndarray:
    """One-step FGSM attack: perturb ``images`` to maximize ``loss_fn``."""
    grads = jax.grad(loss_fn)(images)
    adv = images + epsilon * jnp.sign(grads)
    return jnp.clip(adv, *clip)


def random_sign_noise(rng: jax.Array, images: jnp.ndarray,
                      epsilons=(4, 8, 12, 16),
                      clip: tuple[float, float] = (-1.0, 1.0)) -> jnp.ndarray:
    """±ε random-sign noise with ε drawn from {4,8,12,16}/255·2
    (the scipy loader's random_noise option)."""
    eps_rng, sign_rng = jax.random.split(rng)
    eps = jax.random.choice(
        eps_rng, jnp.asarray(epsilons, jnp.float32)) / 255.0 * 2.0
    signs = jnp.sign(jax.random.uniform(sign_rng, images.shape,
                                        minval=-1.0, maxval=1.0))
    return jnp.clip(images + eps * signs, *clip)


def make_attack_loss(model: Any, variables: Any,
                     labels: jnp.ndarray) -> Callable:
    """Classification loss as a function of the input image batch —
    the thing FGSM differentiates."""
    import optax

    def loss_of_images(images: jnp.ndarray) -> jnp.ndarray:
        logits = model.apply(variables, images, train=False)
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, labels))

    return loss_of_images


def make_jitted_attack(model: Any, epsilon: float) -> Callable:
    """One compiled FGSM program: (params, batch_stats, images, labels) →
    adversarial images. Build once, reuse every iteration — the whole
    forward+input-gradient fuses into a single XLA executable instead of
    re-tracing per step."""
    import optax

    def attack(params, batch_stats, images, labels):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        def loss_of_images(imgs):
            logits = model.apply(variables, imgs, train=False)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels))

        return fgsm(loss_of_images, images, epsilon)

    return jax.jit(attack)


def adversarial_train_step_pair(trainer, state, images, labels,
                                epsilon: float = 8 / 255 * 2,
                                attack_fn: Callable | None = None):
    """One clean step + one FGSM step (the reference's per-iter pair,
    imagenet_train_inception_resnet.py:210-234). Returns
    (state, clean_metrics, adv_metrics). Pass a cached
    ``make_jitted_attack`` result to avoid per-call retracing."""
    state, clean_metrics = trainer.train_step(state, images, labels)
    if attack_fn is None:
        attack_fn = make_jitted_attack(trainer.model, epsilon)
    adv_images = attack_fn(state.params, state.batch_stats, images, labels)
    state, adv_metrics = trainer.train_step(state, adv_images, labels)
    return state, clean_metrics, adv_metrics
