"""Hand-computed golden-value tests (the reference slim pattern of exact
small-convolution outputs, resnet_v1_test.py:72-91): fixed tiny weights →
outputs checked against arithmetic done by hand."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.models.fold import fold_params
from tensorflow_yolo2_tpu.models.layers import ConvBN, leaky_relu, max_pool


def test_conv_bn_leaky_exact_values():
    """1×1 conv with unit kernel + known BN stats on a constant input."""
    model = ConvBN(features=1, kernel_size=1)
    x = jnp.full((1, 2, 2, 1), 3.0)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = {
        "conv": {"kernel": jnp.ones((1, 1, 1, 1)),
                 "bias": jnp.full((1,), 0.5)},
        "bn": {"scale": jnp.full((1,), 2.0), "bias": jnp.full((1,), 1.0)},
    }
    stats = {"bn": {"mean": jnp.full((1,), 1.5),
                    "var": jnp.full((1,), 4.0 - 1e-3)}}  # sqrt(var+eps)=2
    y = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    # conv: 3·1 + 0.5 = 3.5; BN: (3.5 − 1.5)/2 · 2 + 1 = 3.0; leaky: 3.0
    np.testing.assert_allclose(y, 3.0, rtol=1e-5)

    # negative branch: input −3 → conv −2.5 → BN (−2.5−1.5)/2·2+1 = −3
    # → leaky 0.1·(−3) = −0.3
    y2 = model.apply({"params": params, "batch_stats": stats},
                     jnp.full((1, 2, 2, 1), -3.0), train=False)
    np.testing.assert_allclose(y2, -0.3, rtol=1e-5)

    # folded weights reproduce the same outputs with a bare conv
    folded = fold_params({"m": params}, {"m": stats})["m"]
    # kernel' = 1·2/2 = 1; bias' = (0.5−1.5)·1 + 1 = 0
    np.testing.assert_allclose(folded["conv"]["kernel"], 1.0, rtol=1e-5)
    np.testing.assert_allclose(folded["conv"]["bias"], 0.0, atol=1e-6)


def test_leaky_and_pool_exact():
    np.testing.assert_allclose(leaky_relu(jnp.asarray([-2.0, 0.0, 5.0])),
                               [-0.2, 0.0, 5.0])
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    y = max_pool(x, 2, 2)
    np.testing.assert_array_equal(
        np.asarray(y)[0, :, :, 0], [[5, 7], [13, 15]])


def test_conv3x3_same_exact_corner():
    """3×3 SAME conv of a delta input with an indexing kernel recovers the
    kernel (flipped correlation convention check: Flax/TF do correlation,
    not convolution)."""
    import flax.linen as nn

    x = np.zeros((1, 3, 3, 1), np.float32)
    x[0, 1, 1, 0] = 1.0  # delta at center
    kernel = np.arange(9, dtype=np.float32).reshape(3, 3, 1, 1)
    conv = nn.Conv(1, (3, 3), padding="SAME", use_bias=False)
    variables = conv.init(jax.random.PRNGKey(0), x)
    y = conv.apply({"params": {"kernel": jnp.asarray(kernel)}}, x)
    # correlation: output[i,j] = Σ k[u,v]·x[i+u−1, j+v−1]; with a center
    # delta the kernel appears flipped at the output
    np.testing.assert_array_equal(
        np.asarray(y)[0, :, :, 0],
        np.flip(kernel[:, :, 0, 0]))
    del variables
