"""Post-training int8 quantization for the folded Darknet19 serving path.

Beyond-reference production feature (the reference serves fp32 TF1
graphs only — src/pascal/pascal_detect_darknet.py:41-62): after BatchNorm
folding (models.fold), every conv in the detector is quantized to
symmetric int8 — per-output-channel weight scales, per-tensor activation
scales from a one-shot calibration pass — and the whole 22-conv chain
runs as int8×int8→int32 convolutions on the MXU (2× the bf16 peak on
v5e) with int8 tensors between layers (4× less HBM traffic than fp32).

The numerical recipe (standard TensorRT-style PTQ):

- weights:      w_q[..,o] = round(w[..,o] / s_w[o]),  s_w[o] = max|w[..,o]|/127
- activations:  x_q = clip(round(x / s_x), -127, 127), s_x = calib amax/127
- conv:         acc_int32 = conv(x_q, w_q);  y = acc·(s_x·s_w) + bias
- leaky-ReLU in f32 on the dequantized epilogue (XLA fuses it into the
  conv), then requantize with the next layer's calibrated scale;
- 2×2/2 max-pool runs directly on the int8 tensors — max commutes with
  the (positive, per-tensor) scale, so pooling never leaves int8.

Only the Darknet19 detector layer schedule is wired (the serving
flagship); the plan is derived statically from
models.darknet._DARKNET19_SCHEDULE so the jitted forward has no
data-dependent control flow.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from tensorflow_yolo2_tpu.models.darknet import _DARKNET19_SCHEDULE
from tensorflow_yolo2_tpu.models.layers import leaky_relu, space_to_depth

_DIMS = ("NHWC", "HWIO", "NHWC")


def layer_plan(v2: bool = False, head: str = "detector"):
    """Static op plan for the folded Darknet19 detector or classifier.

    Returns ``(plan, convs)``: ``plan`` is a sequence of ``"conv"`` /
    ``"pool"`` steps mirroring Darknet19Backbone + the head, and
    ``convs`` the ordered ``((scope, name), activated)`` conv entries.
    For ``head="detector"`` the output conv is leaky-activated for the
    v1 head (the reference's BN-on-output quirk, darknet.py:198-200)
    and linear for the v2 anchor head (bn_on_output=False in
    pascal_train_darknet --v2). ``head="classifier"`` appends the 1×1
    conv19 logits conv (activated — darknet.py:115); the global average
    pool runs in f32 after the chain (forward_int8_classifier).

    ``head="detector_v2p"`` is the full YOLOv2 passthrough/reorg
    architecture (models.darknet.Darknet19DetectorV2): the plan gains a
    ``"mid"`` marker capturing the (H/16, 512) map before the last pool
    and a ``"pt"`` step that runs the passthrough 1×1 conv on it,
    space-to-depth-reorgs, and concatenates onto the main path. The
    concat halves are requantized to ONE shared per-tensor scale (the
    calibrated conv3-input scale) so conv3 keeps the standard
    s_in·s_w[o] dequant factorization; output conv is linear.
    """
    plan: list = []
    convs: list = []
    i = 0
    pool_i = 0
    n_pools = sum(1 for item in _DARKNET19_SCHEDULE if item == "M")
    for item in _DARKNET19_SCHEDULE:
        if item == "M":
            pool_i += 1
            if pool_i == n_pools and head == "detector_v2p":
                plan.append("mid")
            plan.append("pool")
        else:
            i += 1
            plan.append("conv")
            convs.append((("backbone", f"conv{i}"), True))
    if head == "classifier":
        plan.append("conv")
        convs.append((("conv19",), not v2))
        return tuple(plan), tuple(convs)
    if head == "detector_v2p":
        for j in (1, 2):
            plan.append("conv")
            convs.append((("detection", f"conv{j}"), True))
        plan.append("pt")
        convs.append((("detection", "passthrough"), True))
        plan.append("conv")
        convs.append((("detection", "conv3"), True))
        plan.append("conv")
        convs.append((("detection", "output"), False))
        return tuple(plan), tuple(convs)
    for j in range(1, 4):
        plan.append("conv")
        convs.append((("detection", f"conv{j}"), True))
    plan.append("conv")
    convs.append((("detection", "output"), not v2))
    return tuple(plan), tuple(convs)


def _conv_params(params: Mapping[str, Any], path) -> tuple:
    node = params
    for key in path:
        node = node[key]
    conv = node["conv"]
    return (jnp.asarray(conv["kernel"], jnp.float32),
            jnp.asarray(conv["bias"], jnp.float32))


def _quantize_act(x: jnp.ndarray, inv_scale: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x * inv_scale), -127, 127).astype(jnp.int8)


def _max_pool_int8(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(
        x, jnp.array(jnp.iinfo(jnp.int8).min, jnp.int8), lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "SAME")


@partial(jax.jit, static_argnames=("v2", "head", "percentile"))
def calibrate(params: Mapping[str, Any], images: jnp.ndarray,
              v2: bool = False, head: str = "detector",
              percentile: float = 100.0) -> jnp.ndarray:
    """One-shot activation calibration on a representative batch.

    Runs the folded f32 forward and records the per-tensor abs-max at
    every conv *input* (the image, then each post-activation map; the
    2×2 pools preserve the scale). Returns ``[n_convs]`` f32 scales
    (amax/127) consumed by :func:`quantize_folded`.

    ``percentile < 100`` clips the range to that percentile of |x|
    instead of the max — the standard outlier-robust calibration when a
    few activations dominate the tensor (saturating <(100-p)% of values
    buys resolution for the rest).
    """
    plan, convs = layer_plan(v2, head)

    def amax(t: jnp.ndarray) -> jnp.ndarray:
        if percentile >= 100.0:
            return jnp.max(jnp.abs(t))
        return jnp.percentile(jnp.abs(t).reshape(-1), percentile)

    x = jnp.asarray(images, jnp.float32)
    amaxes = [amax(x)]
    mid = None
    ci = 0
    for si, step in enumerate(plan):
        if step == "pool":
            x = lax.reduce_window(x, -jnp.inf, lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
            continue
        if step == "mid":
            mid = x
            continue
        if step == "pt":
            # passthrough conv input = the captured mid map; its scale
            # slot sits between conv2's and conv3's in the conv order
            amaxes.append(amax(mid))
            (path, _) = convs[ci]
            ci += 1
            kernel, bias = _conv_params(params, path)
            p = lax.conv_general_dilated(
                mid, kernel, (1, 1), "SAME",
                dimension_numbers=_DIMS) + bias
            x = jnp.concatenate([x, space_to_depth(leaky_relu(p))],
                                axis=-1)
            amaxes.append(amax(x))  # conv3's input = the concat tensor
            continue
        (path, activated) = convs[ci]
        ci += 1
        kernel, bias = _conv_params(params, path)
        x = lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME", dimension_numbers=_DIMS) + bias
        if activated:
            x = leaky_relu(x)
        if ci < len(convs) and plan[si + 1] != "pt":
            # (after the conv feeding a "pt" step the next two scale
            # slots — passthrough input, concat — are recorded there)
            amaxes.append(amax(x))
    scales = jnp.stack(amaxes) / 127.0
    return jnp.maximum(scales, 1e-8)


def quantize_folded(params: Mapping[str, Any], act_scales: jnp.ndarray,
                    v2: bool = False, head: str = "detector") -> tuple:
    """Quantize a folded (models.fold.fold_params) detector tree to int8.

    Returns a tuple of per-conv dicts — a valid jit-argument pytree:
    ``kernel`` int8 HWIO, ``scale`` f32[O] (= input scale × per-channel
    weight scale: the dequant multiplier for the int32 accumulator),
    ``bias`` f32[O], ``inv_in`` f32 scalar (1/input-scale, used to
    requantize the previous layer's f32 epilogue).
    """
    _, convs = layer_plan(v2, head)
    act_scales = jnp.asarray(act_scales, jnp.float32)
    layers = []
    for idx, (path, _) in enumerate(convs):
        kernel, bias = _conv_params(params, path)
        w_scale = jnp.maximum(
            jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8) / 127.0
        k_q = jnp.clip(jnp.round(kernel / w_scale), -127, 127)
        layers.append({
            "kernel": k_q.astype(jnp.int8),
            "scale": (w_scale * act_scales[idx]).astype(jnp.float32),
            "bias": bias,
            "inv_in": (1.0 / act_scales[idx]).astype(jnp.float32),
        })
    return tuple(layers)


def forward_int8(layers: Sequence[Mapping[str, jnp.ndarray]],
                 images: jnp.ndarray, v2: bool = False,
                 head: str = "detector") -> jnp.ndarray:
    """Quantized forward: f32 (or raw uint8) images → f32 output map.

    Each conv runs int8×int8→int32 on the MXU; dequant + bias + leaky +
    requant form the (XLA-fused) epilogue; pools stay int8. The final
    map is returned in f32 — the detection grid for the fused Pallas
    decode+NMS kernel, or the pre-pool class map for the classifier.

    uint8 input selects the device-normalize serving path (the host
    ships raw bytes from image_read_u8, 4× fewer transfer bytes): the
    chip applies (x/255)·2−1 before requantizing with the calibrated
    input scale — identical to normalizing on the host, and the same
    convention make_detect_fn's bf16 path uses.
    """
    plan, convs = layer_plan(v2, head)
    x = jnp.asarray(images)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    x = _quantize_act(x.astype(jnp.float32), layers[0]["inv_in"])
    mid = None
    ci = 0
    for si, step in enumerate(plan):
        if step == "pool":
            x = _max_pool_int8(x)
            continue
        if step == "mid":
            # the int8 tensor right before the last pool — already
            # quantized at the next conv's input scale, which calibrate
            # records on the SAME tensor it stores in the passthrough
            # slot, so the pt conv dequantizes it consistently
            mid = x
            continue
        if step == "pt":
            layer = layers[ci]
            ci += 1
            acc = lax.conv_general_dilated(
                mid, layer["kernel"], (1, 1), "SAME",
                dimension_numbers=_DIMS,
                preferred_element_type=jnp.int32)
            p = acc.astype(jnp.float32) * layer["scale"] + layer["bias"]
            # both concat halves requantize to conv3's shared input
            # scale; space-to-depth is a pure layout op and stays int8
            p = _quantize_act(leaky_relu(p), layers[ci]["inv_in"])
            x = jnp.concatenate([x, space_to_depth(p)], axis=-1)
            continue
        layer = layers[ci]
        (_, activated) = convs[ci]
        ci += 1
        acc = lax.conv_general_dilated(
            x, layer["kernel"], (1, 1), "SAME", dimension_numbers=_DIMS,
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * layer["scale"] + layer["bias"]
        if activated:
            y = leaky_relu(y)
        if ci < len(layers):
            # main-path requant target: the next conv that consumes x —
            # when a "pt" step intervenes (after the head's conv2) that
            # is the conv AFTER the passthrough entry (conv3)
            nxt = ci + 1 if plan[si + 1] == "pt" else ci
            x = _quantize_act(y, layers[nxt]["inv_in"])
        else:
            return y
    raise AssertionError("plan ended without the output conv")


def forward_int8_classifier(layers: Sequence[Mapping[str, jnp.ndarray]],
                            images: jnp.ndarray) -> jnp.ndarray:
    """Quantized Darknet19 classifier forward → f32 logits.

    The int8 chain produces the (H/32, W/32, num_classes) class map
    (conv19 epilogue in f32); the global average pool — the reference's
    7×7 avgpool, darknet.py:117 — then runs in f32.
    """
    class_map = forward_int8(layers, images, head="classifier")
    return jnp.mean(class_map, axis=(1, 2))


def save_quantized(path: str, layers: Sequence[Mapping[str, jnp.ndarray]],
                   meta: Mapping[str, Any] | None = None) -> None:
    """Write a quantized chain as a standalone serving artifact (npz).

    The artifact carries everything the int8 forward needs — int8
    kernels, dequant scales, biases, requant factors — so deployment
    ships ~¼ the fp32 snapshot bytes and needs neither the training
    checkpoint nor a calibration pass at serving time (the TensorRT
    engine-file role; the reference has no serving-artifact concept).
    """
    import json

    import numpy as np

    arrays = {f"{i}/{k}": np.asarray(v)
              for i, layer in enumerate(layers) for k, v in layer.items()}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(dict(meta or {}), sort_keys=True).encode(), np.uint8)
    # write through a file object so np.savez never appends ".npz"
    # behind the caller's back (the path printed/loaded must match)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_quantized(path: str) -> tuple:
    """Load a :func:`save_quantized` artifact → ``(layers, meta)``."""
    import json

    import numpy as np

    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        n = 1 + max(int(key.split("/")[0]) for key in data.files
                    if key != "__meta__")
        layers = tuple(
            {key.split("/", 1)[1]: jnp.asarray(data[key])
             for key in data.files if key.startswith(f"{i}/")}
            for i in range(n))
    return layers, meta
