"""Int8 post-training-quantized serving chain (ops.quant).

The quantized forward must track the f32 folded forward closely enough
that the decoded detections are unchanged in practice; these tests pin
the numerics on CPU (the throughput claim is measured on TPU by
bench.py BENCH_INT8=1 and the accuracy claim by
benchmarks/int8_quality.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_yolo2_tpu.config import YoloConfig, yolo_v2_config
from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector
from tensorflow_yolo2_tpu.models.fold import fold_params
from tensorflow_yolo2_tpu.ops.quant import (
    calibrate,
    forward_int8,
    layer_plan,
    quantize_folded,
)

_IMG = 32  # S=1 grid — smallest multiple of 32; full 22-conv chain


def _folded(yolo: YoloConfig, v2: bool):
    model = Darknet19Detector(output_channels=yolo.cell_channels,
                              bn_on_output=not v2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, _IMG, _IMG, 3)), train=False)
    folded = fold_params(variables["params"], variables["batch_stats"])
    fmodel = Darknet19Detector(output_channels=yolo.cell_channels,
                               bn_on_output=not v2, fold_bn=True)
    return fmodel, folded


@pytest.fixture(scope="module")
def v1_setup():
    yolo = YoloConfig(S=_IMG // 32, image_size=_IMG)
    fmodel, folded = _folded(yolo, v2=False)
    images = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (2, _IMG, _IMG, 3)), jnp.float32)
    return yolo, fmodel, folded, images


def test_layer_plan_shape():
    plan, convs = layer_plan(v2=False)
    assert plan.count("conv") == 22 and plan.count("pool") == 5
    assert len(convs) == 22
    assert convs[-1] == (("detection", "output"), True)
    _, convs_v2 = layer_plan(v2=True)
    assert convs_v2[-1] == (("detection", "output"), False)


def test_weight_quant_roundtrip(v1_setup):
    _, _, folded, images = v1_setup
    scales = calibrate(folded, images)
    layers = quantize_folded(folded, scales)
    kernel = jnp.asarray(folded["backbone"]["conv1"]["conv"]["kernel"],
                         jnp.float32)
    layer = layers[0]
    assert layer["kernel"].dtype == jnp.int8
    assert int(jnp.max(jnp.abs(layer["kernel"]))) == 127  # scale is tight
    w_scale = layer["scale"] * layer["inv_in"]  # undo the act scale
    recon = layer["kernel"].astype(jnp.float32) * w_scale
    # symmetric round-to-nearest: elementwise error ≤ half a step
    err = np.asarray(jnp.abs(recon - kernel))
    step = np.asarray(w_scale) * (0.5 + 1e-3)
    assert np.all(err <= step)


def test_forward_int8_matches_f32(v1_setup):
    yolo, fmodel, folded, images = v1_setup
    ref = fmodel.apply({"params": folded}, images, train=False)
    scales = calibrate(folded, images)
    layers = quantize_folded(folded, scales)
    out = jax.jit(forward_int8)(layers, images)
    assert out.shape == ref.shape == (2, yolo.S, yolo.S,
                                      yolo.cell_channels)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05, f"int8 grid diverges from f32: rel RMS {rel:.4f}"


def test_forward_int8_v2_linear_output():
    yolo = yolo_v2_config(_IMG)
    fmodel, folded = _folded(yolo, v2=True)
    images = jnp.asarray(np.random.RandomState(1).uniform(
        -1, 1, (1, _IMG, _IMG, 3)), jnp.float32)
    ref = fmodel.apply({"params": folded}, images, train=False)
    scales = calibrate(folded, images, v2=True)
    layers = quantize_folded(folded, scales, v2=True)
    out = forward_int8(layers, images, v2=True)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert out.shape == ref.shape
    assert rel < 0.05, f"v2 int8 grid diverges: rel RMS {rel:.4f}"


def test_layer_plan_v2p():
    plan, convs = layer_plan(head="detector_v2p")
    assert plan.count("conv") == 22 and plan.count("pool") == 5
    assert plan.count("mid") == 1 and plan.count("pt") == 1
    # mid is captured immediately before the LAST pool
    assert plan[plan.index("mid") + 1] == "pool"
    assert plan.index("mid") > plan.index("pool")
    assert len(convs) == 23
    assert convs[-3] == (("detection", "passthrough"), True)
    assert convs[-1] == (("detection", "output"), False)


def test_forward_int8_v2p_passthrough_matches_f32():
    """int8 quantization of the FULL YOLOv2 reorg architecture
    (head="detector_v2p"): the passthrough conv runs int8 on the
    pre-pool mid tensor (whose quantization scale calibrate records on
    the same tensor twice — once for the post-pool conv, once for the
    passthrough slot), the space-to-depth reorg stays int8, and both
    concat halves requantize to conv3's shared input scale."""
    from tensorflow_yolo2_tpu.models.darknet import Darknet19DetectorV2

    yolo = yolo_v2_config(_IMG)
    model = Darknet19DetectorV2(output_channels=yolo.cell_channels)
    variables = model.init(jax.random.PRNGKey(7),
                           jnp.zeros((1, _IMG, _IMG, 3)), train=False)
    folded = fold_params(variables["params"], variables["batch_stats"])
    fmodel = Darknet19DetectorV2(output_channels=yolo.cell_channels,
                                 fold_bn=True)
    images = jnp.asarray(np.random.RandomState(3).uniform(
        -1, 1, (2, _IMG, _IMG, 3)), jnp.float32)
    ref = fmodel.apply({"params": folded}, images, train=False)
    scales = calibrate(folded, images, head="detector_v2p")
    assert scales.shape == (23,)
    layers = quantize_folded(folded, scales, head="detector_v2p")
    assert len(layers) == 23
    out = jax.jit(partial(forward_int8, head="detector_v2p"))(
        layers, images)
    assert out.shape == ref.shape == (2, yolo.S, yolo.S,
                                      yolo.cell_channels)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05, f"v2p int8 grid diverges: rel RMS {rel:.4f}"


def test_detect_fn_int8_v2p_smoke():
    """make_detect_fn(int8=True, passthrough=True) serves the quantized
    reorg head end-to-end through the fused decode+NMS."""
    from tensorflow_yolo2_tpu.entries.pascal_detect_darknet import (
        make_detect_fn,
    )
    from tensorflow_yolo2_tpu.models.darknet import Darknet19DetectorV2

    yolo = yolo_v2_config(_IMG)
    model = Darknet19DetectorV2(output_channels=yolo.cell_channels)
    variables = model.init(jax.random.PRNGKey(8),
                           jnp.zeros((1, _IMG, _IMG, 3)), train=False)
    images = jnp.asarray(np.random.RandomState(9).uniform(
        -1, 1, (2, _IMG, _IMG, 3)), jnp.float32)
    detect = make_detect_fn(yolo, variables["params"],
                            variables["batch_stats"], object_thresh=0.0,
                            use_nms=True, v2=True, passthrough=True,
                            int8=True, calib_images=images)
    dets = detect(images)
    assert dets.boxes.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(dets.scores)))


def test_forward_int8_classifier_matches_f32():
    from tensorflow_yolo2_tpu.models.darknet import Darknet19Classifier
    from tensorflow_yolo2_tpu.ops.quant import forward_int8_classifier

    model = Darknet19Classifier(num_classes=10)
    variables = model.init(jax.random.PRNGKey(4),
                           jnp.zeros((1, _IMG, _IMG, 3)), train=False)
    folded = fold_params(variables["params"], variables["batch_stats"])
    fmodel = Darknet19Classifier(num_classes=10, fold_bn=True)
    images = jnp.asarray(np.random.RandomState(5).uniform(
        -1, 1, (2, _IMG, _IMG, 3)), jnp.float32)
    ref = fmodel.apply({"params": folded}, images, train=False)
    scales = calibrate(folded, images, head="classifier")
    layers = quantize_folded(folded, scales, head="classifier")
    logits = forward_int8_classifier(layers, images)
    assert logits.shape == ref.shape == (2, 10)
    rel = float(jnp.linalg.norm(logits - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05, f"classifier int8 logits diverge: rel {rel:.4f}"


def test_percentile_calibration_tightens_scales(v1_setup):
    _, _, folded, images = v1_setup
    full = np.asarray(calibrate(folded, images))
    clipped = np.asarray(calibrate(folded, images, percentile=99.0))
    assert clipped.shape == full.shape
    assert np.all(clipped <= full + 1e-12)
    assert np.any(clipped < full)  # some tensor has a clipped tail


def test_int8_pool_commutes_with_quantization():
    from tensorflow_yolo2_tpu.ops.quant import (
        _max_pool_int8,
        _quantize_act,
    )

    x = jnp.asarray(np.random.RandomState(2).uniform(
        -3, 3, (1, 8, 8, 16)), jnp.float32)
    inv = jnp.float32(127.0 / 3.0)
    pooled_then_quant = _quantize_act(
        jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 2, 2, 1), (1, 2, 2, 1), "SAME"), inv)
    quant_then_pooled = _max_pool_int8(_quantize_act(x, inv))
    np.testing.assert_array_equal(np.asarray(pooled_then_quant),
                                  np.asarray(quant_then_pooled))


def test_forward_int8_uint8_input_matches_normalized(v1_setup):
    """uint8 batches (the uint8-transfer serving path, image_read_u8)
    decode identically to host-normalized f32: the chip applies
    (x/255)·2−1 before the calibrated requantize."""
    yolo, fmodel, folded, _ = v1_setup
    u8 = np.random.RandomState(1).randint(
        0, 256, (2, _IMG, _IMG, 3)).astype(np.uint8)
    normed = (u8.astype(np.float32) / 255.0) * 2.0 - 1.0
    scales = calibrate(folded, jnp.asarray(normed))
    layers = quantize_folded(folded, scales)
    out_u8 = np.asarray(jax.jit(forward_int8)(layers, jnp.asarray(u8)))
    out_f32 = np.asarray(jax.jit(forward_int8)(layers, jnp.asarray(normed)))
    np.testing.assert_array_equal(out_u8, out_f32)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs the real TPU backend")
def test_forward_int8_on_tpu(v1_setup):
    """The int8 chain compiled for the chip (int8×int8→int32 convs on
    the MXU) tracks the f32 folded forward — the numerics behind the
    BENCH_INT8=1 throughput claim."""
    yolo, fmodel, folded, images = v1_setup
    ref = np.asarray(fmodel.apply({"params": folded}, images,
                                  train=False))
    scales = calibrate(folded, images)
    layers = quantize_folded(folded, scales)
    out = np.asarray(jax.jit(forward_int8)(layers, images))
    rel = float(np.linalg.norm(out - ref) / np.linalg.norm(ref))
    assert rel < 0.05, f"TPU int8 grid diverges: rel RMS {rel:.4f}"


def test_save_load_quantized_roundtrip(v1_setup, tmp_path):
    from tensorflow_yolo2_tpu.ops.quant import (
        load_quantized,
        save_quantized,
    )

    _, _, folded, images = v1_setup
    layers = quantize_folded(folded, calibrate(folded, images))
    path = str(tmp_path / "det.npz")
    save_quantized(path, layers, {"v2": False, "image_size": _IMG})
    loaded, meta = load_quantized(path)
    assert meta == {"v2": False, "image_size": _IMG}
    assert len(loaded) == len(layers) == 22
    for orig, back in zip(layers, loaded):
        assert set(back) == set(orig)
        for key in orig:
            np.testing.assert_array_equal(np.asarray(orig[key]),
                                          np.asarray(back[key]))
            assert back[key].dtype == orig[key].dtype
    out_a = forward_int8(layers, images)
    out_b = forward_int8(loaded, images)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=0, atol=0)


def test_detect_fn_int8_smoke(v1_setup):
    from tensorflow_yolo2_tpu.entries.pascal_detect_darknet import (
        make_detect_fn,
    )

    yolo, _, _, images = v1_setup
    model = Darknet19Detector(output_channels=yolo.cell_channels)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, _IMG, _IMG, 3)), train=False)
    detect = make_detect_fn(yolo, variables["params"],
                            variables["batch_stats"], object_thresh=0.0,
                            use_nms=True, int8=True, calib_images=images)
    dets = detect(images)
    assert dets.boxes.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(dets.scores)))
    with pytest.raises(ValueError, match="calib_images"):
        make_detect_fn(yolo, variables["params"],
                       variables["batch_stats"], int8=True)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs the real TPU backend")
def test_forward_int8_uint8_matches_normalized_on_tpu(v1_setup):
    """TPU twin of the uint8-transfer equality test (advisor r2): the
    device-side (x/255)·2−1 must match host normalization bit-exactly on
    the compiled XLA:TPU graph too, not just on CPU — this is where the
    forward_int8 docstring's 'identical to normalizing on the host'
    claim actually matters."""
    yolo, fmodel, folded, _ = v1_setup
    u8 = np.random.RandomState(1).randint(
        0, 256, (2, _IMG, _IMG, 3)).astype(np.uint8)
    normed = (u8.astype(np.float32) / 255.0) * 2.0 - 1.0
    scales = calibrate(folded, jnp.asarray(normed))
    layers = quantize_folded(folded, scales)
    out_u8 = np.asarray(jax.jit(forward_int8)(layers, jnp.asarray(u8)))
    out_f32 = np.asarray(jax.jit(forward_int8)(layers, jnp.asarray(normed)))
    np.testing.assert_array_equal(out_u8, out_f32)
