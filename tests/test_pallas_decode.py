"""Pallas fused decode vs the pure-jnp decode (SURVEY §4: Pallas kernels
tested against a jnp reference; interpreter mode on CPU)."""

import jax
import numpy as np

from tensorflow_yolo2_tpu.config import YoloConfig
from tensorflow_yolo2_tpu.ops import decode_grid
from tensorflow_yolo2_tpu.ops.pallas_decode import decode_grid_pallas

CFG = YoloConfig()


def test_pallas_decode_matches_jnp(rng):
    batch = 3
    net = rng.normal(0, 0.6, (batch, CFG.S, CFG.S, CFG.cell_channels)).astype(
        np.float32)
    net[:, 1, 2, CFG.num_class] = 0.95  # some confident slots
    got = decode_grid_pallas(net, CFG, 0.5)
    for i in range(batch):
        want = jax.jit(lambda n: decode_grid(n, CFG, 0.5))(net[i])
        np.testing.assert_allclose(got.boxes[i], want.boxes,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got.scores[i], want.scores,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got.classes[i], want.classes)
