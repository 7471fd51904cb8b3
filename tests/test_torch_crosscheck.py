"""Independent numerical cross-check against torch (CPU).

tests/reference_numpy.py is a hand-written port of the reference math;
torch is a second, independently-implemented library. Agreement of the
core ops with both gives confidence the math is right, not just
self-consistent (SURVEY §4 golden-value strategy).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tensorflow_yolo2_tpu.models.layers import ConvBN  # noqa: E402
from tensorflow_yolo2_tpu.ops.iou import box_iou  # noqa: E402


def test_conv_bn_leaky_matches_torch(rng):
    """ConvBN(train=False) == torch Conv2d + BatchNorm2d(eval) + LeakyReLU
    with identical weights/stats (3×3 SAME, α=0.1, ε=1e-3)."""
    N, H, W, Cin, Cout, K = 2, 8, 8, 3, 5, 3
    x = rng.normal(0, 1, (N, H, W, Cin)).astype(np.float32)
    kernel = rng.normal(0, 0.1, (K, K, Cin, Cout)).astype(np.float32)
    bias = rng.normal(0, 0.1, Cout).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, Cout).astype(np.float32)
    beta = rng.normal(0, 0.1, Cout).astype(np.float32)
    mean = rng.normal(0, 0.5, Cout).astype(np.float32)
    var = rng.uniform(0.5, 2.0, Cout).astype(np.float32)

    model = ConvBN(Cout, kernel_size=K)
    variables = {
        "params": {"conv": {"kernel": jnp.asarray(kernel),
                            "bias": jnp.asarray(bias)},
                   "bn": {"scale": jnp.asarray(gamma),
                          "bias": jnp.asarray(beta)}},
        "batch_stats": {"bn": {"mean": jnp.asarray(mean),
                               "var": jnp.asarray(var)}},
    }
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    conv = torch.nn.Conv2d(Cin, Cout, K, padding="same")
    with torch.no_grad():
        # HWIO -> OIHW
        conv.weight.copy_(torch.from_numpy(kernel).permute(3, 2, 0, 1))
        conv.bias.copy_(torch.from_numpy(bias))
    bn = torch.nn.BatchNorm2d(Cout, eps=1e-3)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(gamma))
        bn.bias.copy_(torch.from_numpy(beta))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
    bn.eval()
    with torch.no_grad():
        t = torch.from_numpy(x).permute(0, 3, 1, 2)  # NHWC -> NCHW
        theirs = torch.nn.functional.leaky_relu(bn(conv(t)), 0.1)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_box_iou_matches_torchvision_formula(rng):
    """cxcywh IoU == torch's corner-IoU (torchvision box_iou formula
    re-derived in torch ops) on random boxes."""
    n = 64
    boxes1 = rng.uniform(0.1, 0.9, (n, 4)).astype(np.float32)
    boxes2 = rng.uniform(0.1, 0.9, (n, 4)).astype(np.float32)
    boxes1[:, 2:] *= 0.3  # plausible w/h
    boxes2[:, 2:] *= 0.3

    ours = np.asarray(box_iou(jnp.asarray(boxes1), jnp.asarray(boxes2)))

    def to_corners(b):
        t = torch.from_numpy(b)
        return torch.stack([t[:, 0] - t[:, 2] / 2, t[:, 1] - t[:, 3] / 2,
                            t[:, 0] + t[:, 2] / 2, t[:, 1] + t[:, 3] / 2],
                           dim=1)

    a, b = to_corners(boxes1), to_corners(boxes2)
    lt = torch.maximum(a[:, :2], b[:, :2])
    rb = torch.minimum(a[:, 2:], b[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, 0] * wh[:, 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    theirs = (inter / (area_a + area_b - inter)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
