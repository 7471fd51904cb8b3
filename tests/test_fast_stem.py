"""s2d fast-stem equivalence: the space-to-depth detect forward must match
the folded Darknet19Detector to fp tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector
from tensorflow_yolo2_tpu.models.fast_stem import (
    conv_pool_s2d,
    fast_detect_forward,
    space_to_depth,
)
from tensorflow_yolo2_tpu.models.fold import fold_params
from tensorflow_yolo2_tpu.models.layers import leaky_relu, max_pool


def test_space_to_depth_layout():
    x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    y = np.asarray(space_to_depth(jnp.asarray(x)))
    assert y.shape == (2, 2, 2, 12)
    # channel block (2·r_row + r_col)·C + c
    np.testing.assert_array_equal(y[0, 0, 0, 0:3], x[0, 0, 0])    # (0,0)
    np.testing.assert_array_equal(y[0, 0, 0, 3:6], x[0, 0, 1])    # (0,1)
    np.testing.assert_array_equal(y[0, 0, 0, 6:9], x[0, 1, 0])    # (1,0)
    np.testing.assert_array_equal(y[0, 0, 0, 9:12], x[0, 1, 1])   # (1,1)


def test_conv_pool_s2d_matches_reference_composition(rng):
    x = rng.normal(0, 1, (2, 16, 16, 3)).astype(np.float32)
    w = rng.normal(0, 0.2, (3, 3, 3, 8)).astype(np.float32)
    b = rng.normal(0, 0.1, (8,)).astype(np.float32)

    # reference composition: conv3x3 SAME + bias → leaky → 2×2/2 max pool
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    want = np.asarray(max_pool(leaky_relu(y), 2, 2))

    got = np.asarray(conv_pool_s2d(space_to_depth(jnp.asarray(x)),
                                   jnp.asarray(w), jnp.asarray(b),
                                   dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fast_detect_forward_matches_folded_model(rng):
    model = Darknet19Detector(output_channels=30)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    folded = fold_params(variables["params"], variables["batch_stats"])

    ref_model = Darknet19Detector(output_channels=30, fold_bn=True)
    want = np.asarray(ref_model.apply({"params": folded}, x, train=False))
    got = np.asarray(jax.jit(
        lambda p, v: fast_detect_forward(p, v, dtype=jnp.float32))(folded, x))
    assert got.shape == want.shape == (1, 2, 2, 30)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
