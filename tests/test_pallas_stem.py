"""Fused Pallas stem (ops/pallas_stem): equivalence vs the XLA
composition conv1+pool1+conv2+pool2 of the folded Darknet19 backbone.

Interpret mode on CPU (the Mosaic layout constraints only bind when
compiled — the @pytest.mark.tpu twin compiles on the chip via
scripts/run_tpu_tests.sh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_yolo2_tpu.ops.pallas_stem import (
    fused_stem,
    stem_reference,
)


def _weights(rng, cin=3):
    w1 = jnp.asarray(rng.normal(0, 0.3, (3, 3, cin, 32)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.2, (32,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 32, 64)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.2, (64,)), jnp.float32)
    return w1, b1, w2, b2


@pytest.mark.parametrize("h,w,batch", [(32, 32, 2), (64, 32, 1),
                                       (56, 64, 1)])
def test_fused_stem_matches_reference(h, w, batch):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (batch, h, w, 3)), jnp.float32)
    w1, b1, w2, b2 = _weights(rng)
    # float32 compute isolates the pipeline from bf16 rounding noise
    got = np.asarray(fused_stem(x, w1, b1, w2, b2, interpret=True,
                                dtype=jnp.float32))
    want = np.asarray(stem_reference(x, w1, b1, w2, b2,
                                     dtype=jnp.float32))
    assert got.shape == want.shape == (batch, h // 4, w // 4, 64)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_stem_matches_backbone_prefix():
    """Against the real folded Darknet19Backbone's first two stages —
    the weights/activation chain the serving graph actually runs."""
    from tensorflow_yolo2_tpu.models.darknet import Darknet19Backbone
    from tensorflow_yolo2_tpu.models.fold import fold_params

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    model = Darknet19Backbone()
    variables = model.init(jax.random.PRNGKey(0), x[:1, :32, :32],
                           train=False)
    folded = fold_params(variables["params"], variables["batch_stats"])
    c1, c2 = folded["conv1"]["conv"], folded["conv2"]["conv"]
    got = np.asarray(fused_stem(x, c1["kernel"], c1["bias"],
                                c2["kernel"], c2["bias"],
                                interpret=True, dtype=jnp.float32))
    want = np.asarray(stem_reference(x, c1["kernel"], c1["bias"],
                                     c2["kernel"], c2["bias"],
                                     dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_stem_bf16_close():
    """bf16 kernel vs bf16 XLA reference — same dtype chain, only
    accumulation order differs (kernel accumulates in f32 via
    preferred_element_type, as does XLA's conv)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    w1, b1, w2, b2 = _weights(rng)
    got = np.asarray(fused_stem(x, w1, b1, w2, b2, interpret=True,
                                dtype=jnp.bfloat16).astype(jnp.float32))
    want = np.asarray(stem_reference(x, w1, b1, w2, b2,
                                     dtype=jnp.bfloat16)
                      .astype(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_pallas_detect_forward_matches_standard():
    """Composed serving forward (fused stem + detect_tail) vs the
    standard folded Darknet19Detector — the integration the serving
    path switches on (pascal_detect_darknet --pallas-stem)."""
    from tensorflow_yolo2_tpu.config import YoloConfig
    from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector
    from tensorflow_yolo2_tpu.models.fold import fold_params
    from tensorflow_yolo2_tpu.ops.pallas_stem import pallas_detect_forward

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    yolo = YoloConfig(S=2)
    model = Darknet19Detector(output_channels=yolo.cell_channels,
                              dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1, :32, :32],
                           train=False)
    folded = fold_params(variables["params"], variables["batch_stats"])
    fmodel = Darknet19Detector(output_channels=yolo.cell_channels,
                               fold_bn=True, dtype=jnp.float32)
    want = np.asarray(fmodel.apply({"params": folded}, x, train=False))
    got = np.asarray(pallas_detect_forward(folded, x, dtype=jnp.float32,
                                           interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_detect_forward_linear_output_v2():
    """linear_output=True matches the bn_on_output=False (anchor-head)
    model: no leaky on the final 1×1 conv."""
    from tensorflow_yolo2_tpu.config import yolo_v2_config
    from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector
    from tensorflow_yolo2_tpu.models.fold import fold_params
    from tensorflow_yolo2_tpu.ops.pallas_stem import pallas_detect_forward

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    yolo = yolo_v2_config(64)
    model = Darknet19Detector(output_channels=yolo.cell_channels,
                              bn_on_output=False, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:, :32, :32],
                           train=False)
    folded = fold_params(variables["params"], variables["batch_stats"])
    fmodel = Darknet19Detector(output_channels=yolo.cell_channels,
                               bn_on_output=False, fold_bn=True,
                               dtype=jnp.float32)
    want = np.asarray(fmodel.apply({"params": folded}, x, train=False))
    got = np.asarray(pallas_detect_forward(folded, x, dtype=jnp.float32,
                                           interpret=True,
                                           linear_output=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_make_detect_fn_pallas_stem_wiring():
    """The --pallas-stem serving path produces the same detections as
    the standard path (CPU interpret), and the guards fire."""
    from tensorflow_yolo2_tpu.config import YoloConfig
    from tensorflow_yolo2_tpu.entries.pascal_detect_darknet import (
        make_detect_fn,
    )
    from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    yolo = YoloConfig(S=2, image_size=64)
    model = Darknet19Detector(output_channels=yolo.cell_channels,
                              dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:, :32, :32],
                           train=False)
    params, stats = variables["params"], variables["batch_stats"]
    kwargs = dict(object_thresh=0.0, use_nms=True, dtype=jnp.float32)
    std = make_detect_fn(yolo, params, stats, **kwargs)(x)
    pls = make_detect_fn(yolo, params, stats, pallas_stem=True,
                         **kwargs)(x)
    np.testing.assert_allclose(np.asarray(pls.scores),
                               np.asarray(std.scores), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(pls.boxes),
                               np.asarray(std.boxes), rtol=1e-3,
                               atol=1e-3)
    with pytest.raises(ValueError, match="stride"):
        make_detect_fn(yolo, params, stats, pallas_stem=True,
                       downsample="stride", **kwargs)
    with pytest.raises(ValueError, match="fold"):
        make_detect_fn(yolo, params, stats, pallas_stem=True,
                       fold_bn=False, **kwargs)


def test_fused_stem_chunked_dispatch():
    """batch > _MAX_GRID with a ragged tail (6 = 4 + 2) routes through
    the lax.map chunking + zero-pad + reslice — the exact path
    production serving batches (32/256) take on TPU. Equality with the
    reference proves the pad rows never leak into real outputs."""
    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.uniform(-1, 1, (6, 32, 32, 3)), jnp.float32)
    w1, b1, w2, b2 = _weights(rng)
    got = np.asarray(fused_stem(x, w1, b1, w2, b2, interpret=True,
                                dtype=jnp.float32))
    want = np.asarray(stem_reference(x, w1, b1, w2, b2,
                                     dtype=jnp.float32))
    assert got.shape == want.shape == (6, 8, 8, 64)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_make_detect_fn_pallas_stem_int8_guard():
    """pallas_stem + int8 must error (not silently serve int8 with the
    stem flag ignored) — the guard runs before the int8 early-return."""
    from tensorflow_yolo2_tpu.config import YoloConfig
    from tensorflow_yolo2_tpu.entries.pascal_detect_darknet import (
        make_detect_fn,
    )
    from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    yolo = YoloConfig(S=1, image_size=32)
    model = Darknet19Detector(output_channels=yolo.cell_channels,
                              dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    with pytest.raises(ValueError, match="no int8"):
        make_detect_fn(yolo, variables["params"],
                       variables["batch_stats"], pallas_stem=True,
                       int8=True, calib_images=x)


@pytest.mark.tpu
def test_fused_stem_chunked_on_tpu():
    """Compiled chunked dispatch at a ragged batch (6 > _MAX_GRID=4,
    not a multiple of 4): covers both the lax.map chunking and the
    tail pad/slice on the real Mosaic kernel (ADVICE r4)."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs the TPU backend")
    rng = np.random.RandomState(22)
    x = jnp.asarray(rng.uniform(-1, 1, (6, 64, 64, 3)), jnp.float32)
    w1, b1, w2, b2 = _weights(rng)
    got = np.asarray(fused_stem(x, w1, b1, w2, b2, dtype=jnp.float32))
    want = np.asarray(stem_reference(x, w1, b1, w2, b2,
                                     dtype=jnp.float32))
    assert got.shape == (6, 16, 16, 64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.tpu
def test_fused_stem_compiled_on_tpu():
    """Compiled Mosaic kernel vs XLA on the chip (run via
    scripts/run_tpu_tests.sh; skipped on CPU)."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs the TPU backend")
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    w1, b1, w2, b2 = _weights(rng)
    got = np.asarray(fused_stem(x, w1, b1, w2, b2,
                                dtype=jnp.float32))
    want = np.asarray(stem_reference(x, w1, b1, w2, b2,
                                     dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
