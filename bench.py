"""Benchmark: Darknet19-448 detection throughput (images/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The pipeline benchmarked is the full serving path of
entries/pascal_detect_darknet (the reference's pascal_detect_darknet.py):
Darknet19 backbone + YOLO head at 448² + the fused Pallas decode+NMS
kernel (ops.pallas_decode.decode_nms_pallas — the north-star serving
kernel), bf16 compute, BatchNorm folded into the convs, batched, jitted
once. The host fetch is the kernel's K kept slots, not the dense grid.

vs_baseline compares against the TF1-era reference path. The reference
publishes no numbers (BASELINE.md), so the baseline is a *measured*
equivalent: the same 22-conv TF graph (conv+bias → batch-norm → leaky, at
448², NHWC fp32) executed by TensorFlow on this host's CPU — the
reference's own runtime on the hardware available to it here. Measured
once and cached in BASELINE_MEASURED.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "BASELINE_MEASURED.json")
_IMAGE = 448
# batch sweep on v5e (benchmarks/compare_fast_stem.py): 32→2063 img/s,
# 128→3764, 256→3856; re-measured same-session 128→3565 vs 256→3695
_BATCH = int(os.environ.get("BENCH_BATCH", "256"))
_STEPS = int(os.environ.get("BENCH_STEPS", "20"))
# repeated measurements: the tunnel drifts run-to-run, so the headline is
# a median over BENCH_REPEATS interleaved samples with min/max reported
_REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
# BENCH_INT8=1 serves the post-training-quantized chain (ops.quant):
# int8×int8→int32 convs on the MXU (2× bf16 peak on v5e), int8 tensors
# between layers. Accuracy parity evidence: benchmarks/int8_quality.py.
_INT8 = os.environ.get("BENCH_INT8", "0") == "1"
# BENCH_PALLAS_STEM=1 serves the first two conv+pool stages through the
# fused Pallas VMEM stem (ops.pallas_stem) — A/B'd in
# benchmarks/pallas_stem_bench.py
_PALLAS_STEM = os.environ.get("BENCH_PALLAS_STEM", "0") == "1"


def measure_tpu() -> dict:
    import jax
    import jax.numpy as jnp

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()

    from tensorflow_yolo2_tpu.config import YoloConfig
    from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector
    from tensorflow_yolo2_tpu.models.fold import fold_params
    from tensorflow_yolo2_tpu.ops.pallas_decode import decode_nms_pallas

    yolo = YoloConfig(S=_IMAGE // 32)
    model = Darknet19Detector(output_channels=yolo.cell_channels,
                              dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    folded = fold_params(variables["params"], variables["batch_stats"])
    fmodel = Darknet19Detector(output_channels=yolo.cell_channels,
                               fold_bn=True, dtype=jnp.bfloat16)

    images = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (_BATCH, _IMAGE, _IMAGE, 3)), jnp.float32)
    images = jax.device_put(images)

    from tensorflow_yolo2_tpu.ops.pallas_decode import decode_grid_pallas

    if _INT8:
        from tensorflow_yolo2_tpu.ops.quant import (
            calibrate,
            forward_int8,
            quantize_folded,
        )

        scales = calibrate(folded, images[:8])
        folded = jax.device_put(quantize_folded(folded, scales))

        def _grid(params, images):
            return forward_int8(params, images)
    elif _PALLAS_STEM:
        from tensorflow_yolo2_tpu.ops.pallas_stem import (
            pallas_detect_forward,
        )

        def _grid(params, images):
            return pallas_detect_forward(params, images)
    else:
        def _grid(params, images):
            return fmodel.apply({"params": params}, images, train=False)

    @jax.jit
    def forward(params, images):
        # fused Pallas decode + class-aware NMS (the flagship kernel)
        return decode_nms_pallas(_grid(params, images), yolo, 0.5, 0.5,
                                 max_outputs=32)

    @jax.jit
    def forward_decode_only(params, images):
        # same pipeline minus the in-kernel NMS sweep — reported
        # separately so NMS cost and tunnel drift are attributable
        return decode_grid_pallas(_grid(params, images), yolo, 0.5)

    def run(batch):
        # Force real completion with a host fetch of the (tiny) scores
        # tensor — under the axon tunnel block_until_ready alone can
        # return before the computation has actually executed.
        out = forward(folded, batch)
        return np.asarray(out.scores)

    def _throughput(fn):
        # Steady-state: dispatch the whole chain (device executes
        # serially), fetch once at the end so the tunnel round-trip
        # amortizes across steps — serving overlaps fetches the same way.
        t0 = time.perf_counter()
        outs = [fn(folded, images) for _ in range(_STEPS)]
        np.asarray(outs[-1].scores)
        dt = (time.perf_counter() - t0) / _STEPS
        del outs
        return _BATCH / dt

    run(images)  # compile + warm
    np.asarray(forward_decode_only(folded, images).scores)
    run(images)

    # interleave the repeats so drift shows up in both paths alike
    nms_ips, dec_ips = [], []
    for _ in range(max(1, _REPEATS)):
        nms_ips.append(_throughput(forward))
        dec_ips.append(_throughput(forward_decode_only))
    ips = float(np.median(nms_ips))

    # p50 single-image latency, two views: the full host round trip
    # (includes the axon tunnel RTT) and the device-side step amortized
    # over a dispatch chain (what an on-device serving loop would see).
    one = images[:1]
    run(one)
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        run(one)
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(lats, 50) * 1000)
    chain = 50
    t0 = time.perf_counter()
    outs = [forward(folded, one) for _ in range(chain)]
    np.asarray(outs[-1].scores)
    device_ms = (time.perf_counter() - t0) / chain * 1000
    # MFU: analytic conv FLOPs of the served graph ÷ chip peak — an
    # efficiency view of the same measurement (VERDICT r3 item 8)
    from tensorflow_yolo2_tpu.utils.profiling import (
        V5E_PEAK_FLOPS,
        conv_flops_per_image,
    )
    flops_per_image = conv_flops_per_image(_IMAGE)
    peak = V5E_PEAK_FLOPS["int8" if _INT8 else "bf16"]
    mfu = ips * flops_per_image / peak

    return {"images_per_sec": ips,
            "mfu": mfu,
            "flops_per_image": flops_per_image,
            "images_per_sec_min": float(np.min(nms_ips)),
            "images_per_sec_max": float(np.max(nms_ips)),
            "decode_only_images_per_sec": float(np.median(dec_ips)),
            "decode_only_min": float(np.min(dec_ips)),
            "decode_only_max": float(np.max(dec_ips)),
            "repeats": max(1, _REPEATS),
            "p50_ms": p50_ms,
            "device_latency_ms": device_ms, "int8": _INT8,
            "pallas_stem": _PALLAS_STEM,
            "batch": _BATCH, "backend": jax.default_backend()}


def measure_tf_cpu_baseline() -> float:
    """Equivalent TF graph of the reference detection net, on host CPU."""
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    schedule = [(3, 32), "M", (3, 64), "M", (3, 128), (3, 64), (3, 128),
                "M", (3, 256), (1, 128), (3, 256), "M", (3, 512), (1, 256),
                (3, 512), (1, 256), (3, 512), "M", (3, 1024), (1, 512),
                (3, 1024), (1, 512), (3, 1024),
                (3, 1024), (3, 1024), (3, 1024), (1, 30)]

    batch = 4  # small batch; per-image rate is what matters

    @tf.function
    def net(x):
        rng = np.random.RandomState(0)
        for item in schedule:
            if item == "M":
                x = tf.nn.max_pool2d(x, 2, 2, "SAME")
                continue
            k, f = item
            w = tf.constant(rng.normal(0, 0.05,
                                       (k, k, x.shape[-1], f)), tf.float32)
            b = tf.constant(np.full(f, 0.1, np.float32))
            x = tf.nn.conv2d(x, w, 1, "SAME") + b
            # inference-mode BN: frozen moving statistics (an elementwise
            # rescale), exactly what the reference's is_training=False
            # graph executes — computing live moments here would deflate
            # the baseline with work the reference never does at serving
            mean = tf.constant(rng.normal(0, 0.1, f), tf.float32)
            var = tf.constant(rng.uniform(0.8, 1.2, f), tf.float32)
            x = tf.nn.batch_normalization(x, mean, var, None, None, 1e-3)
            x = tf.maximum(0.1 * x, x)
        return x

    x = tf.constant(np.random.RandomState(0).uniform(
        -1, 1, (batch, _IMAGE, _IMAGE, 3)), tf.float32)
    net(x)  # trace + warm
    t0 = time.perf_counter()
    steps = 3
    for _ in range(steps):
        y = net(x)
    _ = y.numpy()
    dt = (time.perf_counter() - t0) / steps
    return batch / dt


def get_baseline() -> float:
    if os.path.exists(_CACHE):
        with open(_CACHE) as f:
            return json.load(f)["tf_cpu_images_per_sec"]
    ips = measure_tf_cpu_baseline()
    with open(_CACHE, "w") as f:
        json.dump({"tf_cpu_images_per_sec": ips,
                   "note": "reference-equivalent TF graph, darknet19-448 "
                           "detection fwd, host CPU fp32"}, f, indent=1)
    return ips


def _require_backend(timeout_s: float = 600) -> None:
    """Fail fast (exit 3) if the JAX backend cannot be reached.

    Device discovery through the axon tunnel blocks forever when the
    tunnel is down; a bench run must report an error, not hang the
    driver. The probe runs in a daemon thread — jax backends are global,
    so the main thread reuses the initialized backend afterwards."""
    import threading

    ok: dict = {}

    def probe():
        try:
            import jax

            ok["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # crashed ≠ hung: report the real cause
            ok["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in ok:
        if "error" in ok:
            print(f"bench: JAX backend init failed: {ok['error']} — "
                  "aborting", file=sys.stderr)
        else:
            print(f"bench: JAX backend init did not complete within "
                  f"{timeout_s:.0f}s (axon tunnel down?) — aborting",
                  file=sys.stderr)
        os._exit(3)


def main() -> int:
    _require_backend()
    result = measure_tpu()
    try:
        baseline = get_baseline()
    except Exception as e:  # TF unavailable → report absolute only
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        baseline = None
    vs = (result["images_per_sec"] / baseline) if baseline else None
    print(json.dumps({
        "metric": "darknet19-448 detection throughput",
        "value": round(result["images_per_sec"], 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        "mfu": round(result["mfu"], 4),
        "value_min": round(result["images_per_sec_min"], 2),
        "value_max": round(result["images_per_sec_max"], 2),
        "repeats": result["repeats"],
        "decode_only_median": round(
            result["decode_only_images_per_sec"], 2),
        "decode_only_min": round(result["decode_only_min"], 2),
        "decode_only_max": round(result["decode_only_max"], 2),
        "p50_single_image_ms": round(result["p50_ms"], 3),
        "device_single_image_ms": round(result["device_latency_ms"], 3),
        "batch": result["batch"],
        "backend": result["backend"],
        "int8": result["int8"],
        "pallas_stem": result["pallas_stem"],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
