"""InceptionV2 (real, separable-stem) + inception aux-logit towers.

VERDICT r1 items 3: inception_v2 must be a distinct topology from v1
(depthwise-separable 7×7 stem + double-3×3 towers, reference slim
inception_v2.py:88-96,30-544), and the v1/v3 aux heads must train.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_yolo2_tpu.models.inception import (
    InceptionV1,
    InceptionV2,
    InceptionV3,
    InceptionV4,
)
from tensorflow_yolo2_tpu.models.registry import get_network


def _param_count(tree):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(tree))


def test_inception_v2_is_not_v1():
    assert InceptionV2 is not InceptionV1
    x = np.random.RandomState(0).normal(0, 1, (1, 64, 64, 3)).astype(
        np.float32)
    v1 = InceptionV1(num_classes=5)
    v2 = InceptionV2(num_classes=5)
    p1 = v1.init(jax.random.PRNGKey(0), x, train=False)["params"]
    p2 = v2.init(jax.random.PRNGKey(0), x, train=False)["params"]
    assert set(p1.keys()) != set(p2.keys())
    assert _param_count(p1) != _param_count(p2)


def test_inception_v2_separable_stem_and_shapes():
    x = np.random.RandomState(1).normal(0, 1, (2, 64, 64, 3)).astype(
        np.float32)
    model = InceptionV2(num_classes=7)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]
    # depthwise-separable stem: 7×7 depthwise (3ch × multiplier 8) + 1×1
    # pointwise to 64 (reference separable_conv2d, inception_v2.py:92-96)
    dw = params["conv1"]["depthwise"]["kernel"]
    pw = params["conv1"]["pointwise"]["kernel"]
    assert dw.shape == (7, 7, 1, 24)  # grouped: in/groups=1, out=3*8
    assert pw.shape == (1, 1, 24, 64)
    # slim block names all present
    for blk in ("mixed_3b", "mixed_3c", "mixed_4a", "mixed_4b", "mixed_4c",
                "mixed_4d", "mixed_4e", "mixed_5a", "mixed_5b", "mixed_5c"):
        assert blk in params, blk
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 7)
    assert np.isfinite(np.asarray(y)).all()
    # trunk output width is the canonical 1024 of Mixed_5c:
    # 352 + 320 + 224 + 128
    assert params["mixed_5c"]["b0"]["conv"]["kernel"].shape[-1] == 352


@pytest.mark.parametrize("cls,size", [(InceptionV1, 64), (InceptionV3, 160),
                                      (InceptionV4, 128)])
def test_aux_logits_forward_and_grad(cls, size):
    """Aux towers return a second logits tensor and receive gradient
    through the 0.4-weighted aux loss (softmax_task)."""
    from tensorflow_yolo2_tpu.train.trainer import softmax_task

    x = np.random.RandomState(2).normal(0, 1, (2, size, size, 3)).astype(
        np.float32)
    labels = jnp.array([0, 2])
    model = cls(num_classes=4, aux_logits=True)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert isinstance(out, tuple) and len(out) == 2
    logits, aux = out
    assert logits.shape == (2, 4) and aux.shape == (2, 4)

    task = softmax_task()

    def loss_fn(params):
        variables2 = {"params": params,
                      "batch_stats": variables["batch_stats"]}
        outs, _ = model.apply(variables2, x, train=True,
                              mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(1)})
        loss, metrics = task(outs, labels)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    assert "aux_loss" in metrics
    # the aux tower's own weights get gradient
    aux_scope = [k for k in grads if k.startswith("aux")]
    assert aux_scope
    g = jax.tree_util.tree_leaves(
        {k: grads[k] for k in aux_scope})
    assert any(float(jnp.abs(t).max()) > 0 for t in g)


def test_registry_passes_aux_kwarg():
    m = get_network("inception_v3", num_classes=3, aux_logits=True)
    assert m.aux_logits
    with pytest.raises(TypeError):
        get_network("darknet19", num_classes=3, aux_logits=True)
