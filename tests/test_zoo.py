"""Zoo shape tests (the reference's per-net *_test.py endpoint-shape
pattern, nets_factory_test.py)."""

import jax
import numpy as np
import pytest

from tensorflow_yolo2_tpu.models.registry import (
    default_image_size,
    get_network,
    list_networks,
)

# small inputs keep 1-core CPU compiles tolerable; inception nets need
# VALID-conv headroom so they get their own sizes below.
SIMPLE = [("lenet", 28), ("cifarnet", 32)]
# vgg needs >=224 (7×7 VALID fc6 after 5 pools)
HEAVY = [("vgg_a", 224), ("vgg_16", 224), ("resnet_v2_50", 64),
         ("alexnet_v2", 224), ("overfeat", 231), ("inception_v1", 64),
         ("inception_v3", 160), ("inception_v4", 160),
         ("inception_resnet_v2", 160), ("resnet_v1_101", 64),
         ("yolo1", 448), ("yolo1_pretrain", 448)]


def test_registry_lists_the_slim_zoo():
    names = set(list_networks())
    expected = {"darknet19", "darknet19_detection", "resnet_v1_50",
                "resnet_v1_50_detection", "resnet_v1_101", "resnet_v1_152",
                "resnet_v1_200", "lenet", "cifarnet", "alexnet_v2",
                "overfeat", "vgg_a", "vgg_16", "vgg_19", "inception_v1",
                "inception_v2", "inception_v3", "inception_v4",
                "inception_resnet_v2", "yolo1", "yolo1_pretrain",
                "resnet_v2_50", "resnet_v2_101", "resnet_v2_152",
                "resnet_v2_200"}
    assert expected <= names
    assert default_image_size("inception_v3") == 299
    assert default_image_size("lenet") == 28


@pytest.mark.parametrize("name,size", SIMPLE)
def test_simple_zoo_forward_shapes(name, size):
    model = get_network(name, num_classes=6)
    x = np.random.RandomState(0).normal(0, 1, (2, size, size, 3)).astype(
        np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 6)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
@pytest.mark.parametrize("name,size", HEAVY)
def test_heavy_zoo_forward_shapes(name, size):
    kwargs = {"num_classes": 6} if name != "yolo1" else {}
    model = get_network(name, **kwargs)
    x = np.random.RandomState(0).normal(0, 1, (1, size, size, 3)).astype(
        np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    if name == "yolo1":
        assert y.shape == (1, 7, 7, 30)
    else:
        assert y.shape == (1, 6)
    assert np.isfinite(np.asarray(y)).all()
