"""Pallas max-pool backward vs XLA's SelectAndScatter VJP.

The bwd kernel must be bit-identical to nn.max_pool's gradient —
including tie handling (first window element in row-major order), which
matters in bf16 where value collisions are common. CPU tests run the
kernel interpreted; the @tpu test compiles it (scripts/run_tpu_tests.sh).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_yolo2_tpu.ops.pallas_pool import max_pool2, supported


def _grad_ref(x, dout):
    def f(x):
        return jnp.sum(nn.max_pool(x, (2, 2), (2, 2), "SAME") * dout)
    return jax.grad(f)(x)


def _grad_pallas(x, dout):
    def f(x):
        return jnp.sum(max_pool2(x) * dout)
    return jax.grad(f)(x)


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 16, 4, 5),
                                   (3, 4, 12, 8)])
def test_pool_bwd_matches_xla(rng, shape):
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    dout_shape = (shape[0], shape[1] // 2, shape[2] // 2, shape[3])
    dout = jnp.asarray(rng.normal(0, 1, dout_shape), jnp.float32)
    np.testing.assert_array_equal(np.asarray(_grad_pallas(x, dout)),
                                  np.asarray(_grad_ref(x, dout)))


def test_pool_bwd_tie_semantics(rng):
    """Integer-valued inputs force exact ties in every window; both
    paths must route the gradient to the SAME (first) element."""
    x = jnp.asarray(rng.randint(0, 3, (2, 8, 8, 4)), jnp.float32)
    dout = jnp.asarray(rng.normal(1, 0.5, (2, 4, 4, 4)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(_grad_pallas(x, dout)),
                                  np.asarray(_grad_ref(x, dout)))


def test_pool_fwd_matches(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 8, 3)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(max_pool2(x)),
        np.asarray(nn.max_pool(x, (2, 2), (2, 2), "SAME")))


def test_supported_predicate():
    x = jnp.zeros((1, 8, 8, 3))
    assert supported(x, 2, 2)
    assert not supported(x, 3, 2)
    assert not supported(jnp.zeros((1, 7, 8, 3)), 2, 2)


def test_bf16_ties(rng):
    """bf16 quantization produces frequent real ties — bitwise parity."""
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 8)), jnp.bfloat16)
    dout = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 8)), jnp.bfloat16)
    got = _grad_pallas(x, dout)
    want = _grad_ref(x, dout)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs the real TPU backend")
def test_pool_bwd_compiled_on_tpu(rng):
    for shape, dt in (((4, 28, 28, 512), jnp.bfloat16),
                      ((2, 448, 448, 32), jnp.bfloat16),
                      ((2, 56, 56, 256), jnp.float32)):
        x = jnp.asarray(rng.normal(0, 1, shape), dt)
        dout_shape = (shape[0], shape[1] // 2, shape[2] // 2, shape[3])
        dout = jnp.asarray(rng.normal(0, 1, dout_shape), dt)
        got = np.asarray(_grad_pallas(x, dout), np.float32)
        want = np.asarray(_grad_ref(x, dout), np.float32)
        np.testing.assert_array_equal(got, want)
