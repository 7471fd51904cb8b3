"""Model shape/param tests (pattern of reference slim *_test.py: endpoint
shapes + deterministic inputs, resnet_v1_test.py:30-91)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_yolo2_tpu.models import (
    Darknet19Backbone,
    Darknet19Classifier,
    Darknet19Detector,
    get_network,
    list_networks,
)
from tensorflow_yolo2_tpu.models.fold import fold_params


def mesh_input(batch, size, channels=3):
    """Deterministic mesh-grid input (reference resnet_v1_test.py:30-53)."""
    x = np.linspace(-1, 1, batch * size * size * channels, dtype=np.float32)
    return x.reshape(batch, size, size, channels)


def test_backbone_output_shape():
    model = Darknet19Backbone()
    x = mesh_input(2, 64)
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(params, x, train=False)
    assert y.shape == (2, 2, 2, 1024)


def test_backbone_has_18_convs():
    model = Darknet19Backbone()
    params = model.init(jax.random.PRNGKey(0), mesh_input(1, 32), train=False)
    convs = [k for k in params["params"] if k.startswith("conv")]
    assert len(convs) == 18


def test_classifier_logits_shape_224_and_448():
    model = Darknet19Classifier(num_classes=1000)
    for size, in_batch in ((224, 1), (448, 1)):
        x = mesh_input(in_batch, size)
        params = model.init(jax.random.PRNGKey(0), x, train=False)
        y = model.apply(params, x, train=False)
        assert y.shape == (in_batch, 1000)


def test_detector_grid_shape():
    model = Darknet19Detector(output_channels=30)
    x = mesh_input(2, 224)
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(params, x, train=False)
    assert y.shape == (2, 7, 7, 30)
    # 448 input → S=14 grid, same params (fully convolutional)
    y2 = model.apply(params, mesh_input(1, 448), train=False)
    assert y2.shape == (1, 14, 14, 30)


def test_batchnorm_stats_update_in_train_mode():
    model = Darknet19Backbone()
    x = np.random.RandomState(0).normal(
        2.0, 1.0, (4, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    old = variables["batch_stats"]["conv1"]["bn"]["mean"]
    new = mutated["batch_stats"]["conv1"]["bn"]["mean"]
    assert not np.allclose(old, new)
    assert np.isfinite(np.asarray(y)).all()


def test_bn_fold_matches_unfolded_inference():
    model = Darknet19Detector(output_channels=30)
    x = mesh_input(1, 64)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    # run a train step so moving stats are non-trivial
    _, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}
    want = model.apply(variables, x, train=False)

    folded = fold_params(variables["params"], variables["batch_stats"])
    folded_model = Darknet19Detector(output_channels=30, fold_bn=True)
    got = folded_model.apply({"params": folded}, x, train=False)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_registry_builds_known_networks():
    names = list_networks()
    assert "darknet19" in names
    assert "darknet19_detection" in names
    net = get_network("darknet19", num_classes=5)
    assert net.num_classes == 5
    with pytest.raises(ValueError):
        get_network("nope_net")


def test_detector_output_is_float32_under_bf16_compute():
    model = Darknet19Detector(output_channels=30, dtype=jnp.bfloat16)
    x = mesh_input(1, 32)
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(params, x, train=False)
    assert y.dtype == jnp.float32
    leaves = jax.tree_util.tree_leaves(params["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_fold_params_handles_biasfree_scalefree_bn(rng):
    """Folding the inception ConvBNReLU layout (use_bias=False,
    use_scale=False) must not crash, and the folded conv+bias must
    reproduce the eval-mode conv→BN output."""
    import jax
    import jax.numpy as jnp

    from tensorflow_yolo2_tpu.models.fold import fold_params
    from tensorflow_yolo2_tpu.models.inception import ConvBNReLU

    x = rng.normal(0, 1, (1, 8, 8, 3)).astype(np.float32)
    m = ConvBNReLU(4)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    # give the BN stats non-trivial values
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    stats = {"bn": {"mean": jnp.asarray(rng.normal(0, 0.3, 4), jnp.float32),
                    "var": jnp.asarray(rng.uniform(0.5, 2, 4), jnp.float32)}}
    wrapped_p = {"layer": variables["params"]}
    wrapped_s = {"layer": stats}
    folded = fold_params(wrapped_p, wrapped_s)["layer"]["conv"]
    ref = m.apply({"params": variables["params"], "batch_stats": stats},
                  x, train=False)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), folded["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + folded["bias"]
    np.testing.assert_allclose(np.asarray(jax.nn.relu(out)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_params_identity_equivalence(rng):
    """Identity-BN folding: the SAME module with folded params+stats must
    reproduce the original eval-mode output — the serving fast path for
    BN layouts without a fold_bn construction (inception ConvBNReLU),
    and for ConvBN too."""
    import jax
    import jax.numpy as jnp

    from tensorflow_yolo2_tpu.models.fold import fold_params_identity
    from tensorflow_yolo2_tpu.models.inception import ConvBNReLU
    from tensorflow_yolo2_tpu.models.layers import ConvBN

    x = rng.normal(0, 1, (2, 8, 8, 3)).astype(np.float32)
    for module in (ConvBNReLU(4), ConvBN(4)):
        variables = module.init(jax.random.PRNGKey(0), x, train=False)
        n = 4
        stats = {"bn": {
            "mean": jnp.asarray(rng.normal(0, 0.3, n), jnp.float32),
            "var": jnp.asarray(rng.uniform(0.5, 2, n), jnp.float32)}}
        params = {"layer": variables["params"]}
        ref = module.apply(
            {"params": variables["params"], "batch_stats": stats},
            x, train=False)
        fp, fs = fold_params_identity(params, {"layer": stats})
        out = module.apply(
            {"params": fp["layer"], "batch_stats": fs["layer"]},
            x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        # the folded stats are the identity constants
        np.testing.assert_allclose(
            np.asarray(fs["layer"]["bn"]["mean"]), 0.0)


def test_fold_params_identity_passes_through_nonpair_bn(rng):
    """BN layers that are NOT a conv/bn child pair (resnet-style conv1 +
    bn1 siblings) keep their params AND statistics untouched, and the
    folded model still applies cleanly."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from tensorflow_yolo2_tpu.models.fold import fold_params_identity

    class SiblingNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(4, (3, 3), name="conv1")(x)
            x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
            return nn.relu(x)

    x = rng.normal(0, 1, (1, 8, 8, 3)).astype(np.float32)
    m = SiblingNet()
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    stats = jax.tree_util.tree_map(
        lambda v: v + 0.1, dict(variables["batch_stats"]))
    ref = m.apply({"params": variables["params"], "batch_stats": stats},
                  x, train=False)
    fp, fs = fold_params_identity(variables["params"], stats)
    out = m.apply({"params": fp, "batch_stats": fs}, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # statistics passed through verbatim (nothing was folded)
    np.testing.assert_array_equal(
        np.asarray(fs["bn1"]["mean"]), np.asarray(stats["bn1"]["mean"]))
