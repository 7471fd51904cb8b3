"""Single-image Darknet19 YOLO detection (driver config #1).

Capability of reference src/pascal/pascal_detect_darknet.py: read an
image (BGR, warp-resize, [-1, 1] — exactly pascal_voc.py:60-67), run the
Darknet19 detection graph at inference, decode the S×S grid at threshold
0.5 and draw boxes. TPU-native differences:

- the whole forward + fused Pallas decode (+ optional NMS — the reference
  has none, net_utils.py:398) runs as ONE jitted program on the chip;
- BatchNorm is folded into the conv weights (models.fold) so inference
  does 22 convs and nothing else;
- weights come from an Orbax snapshot or an imported TF1 checkpoint
  (``--tf-checkpoint``), falling back to the newest training snapshot
  like the reference (:54-60).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import VOC_CLASSES, Paths, YoloConfig
from tensorflow_yolo2_tpu.data.augment import image_read
from tensorflow_yolo2_tpu.models.darknet import (
    Darknet19Detector,
    Darknet19DetectorV2,
)
from tensorflow_yolo2_tpu.models.fold import fold_params
from tensorflow_yolo2_tpu.ops.boxes import Detections
from tensorflow_yolo2_tpu.ops.pallas_decode import (
    decode_grid_pallas,
    decode_nms_pallas,
)
from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager
from tensorflow_yolo2_tpu.utils.visualize import draw_detections


def load_detector_params(yolo: YoloConfig, tf_checkpoint: str | None = None,
                         paths: Paths | None = None,
                         network_name: str = "darknet19",
                         imdb_name: str = "voc_2007"):
    """Resolve weights: explicit TF ckpt → weights/darknet19_pascal.ckpt →
    newest Orbax snapshot (the reference's fallback order, :50-60).

    The implicit weights/darknet19_pascal.ckpt default only applies to
    the plain v1 network it was trained for — a v2 (per-slot) network
    must not silently shadow its own snapshot with shape-incompatible v1
    weights, and a stride-downsample ("_sd") network must not adopt
    pool-trained weights (same shapes, different semantics).
    """
    paths = paths or Paths()
    tf_path = tf_checkpoint
    if tf_path is None and not yolo.per_slot_classes \
            and network_name == "darknet19":
        tf_path = os.path.join(paths.weights, "darknet19_pascal.ckpt")
    if tf_path is not None and (
            os.path.exists(tf_path + ".index") or os.path.exists(tf_path)):
        from tensorflow_yolo2_tpu.compat.tf_import import (
            import_darknet19_checkpoint,
        )
        params, stats = import_darknet19_checkpoint(tf_path, detection=True)
        print(f"Imported TF checkpoint {tf_path}")
        return params, stats
    mgr = CheckpointManager(network_name, imdb_name, save_by_epoch=False,
                            paths=paths)
    state = mgr.restore_raw()
    print(f"Restored snapshot from {mgr.latest_path()}")
    return state["params"], state.get("batch_stats", {})


def make_detect_fn(yolo: YoloConfig, params, batch_stats,
                   object_thresh: float = 0.5, use_nms: bool = False,
                   nms_iou: float = 0.5, fold_bn: bool = True,
                   dtype=jnp.bfloat16, v2: bool = False,
                   int8: bool = False, calib_images=None,
                   passthrough: bool = False, downsample: str = "pool",
                   pallas_stem: bool = False):
    """Build the jitted image→detections function (batched).

    ``v2`` selects the anchor head layout + decode (sigmoid-xy/exp-wh,
    per-slot class softmax) matching pascal_train_darknet --v2;
    ``passthrough`` additionally selects the full YOLOv2 architecture
    (reorg-route head, models.darknet.Darknet19DetectorV2) matching
    pascal_train_darknet --v2 --passthrough.

    ``int8`` serves the post-training-quantized chain (ops.quant):
    BN-folded weights per-channel int8, activations per-tensor int8
    calibrated on ``calib_images`` (a representative f32 batch —
    required when int8 is set), int8×int8→int32 convs on the MXU.
    """
    if v2 != yolo.per_slot_classes:
        raise ValueError(
            f"v2={v2} disagrees with yolo.per_slot_classes="
            f"{yolo.per_slot_classes}: the anchor head needs a "
            "per-slot config (config.yolo_v2_config), the v1 head a "
            "plain YoloConfig — a mismatch would silently decode with "
            "the wrong kernel")
    if passthrough and not v2:
        raise ValueError("passthrough is the YOLOv2 reorg head — it "
                         "requires v2=True (the anchor layout)")
    if pallas_stem:
        # the fused VMEM stem (ops.pallas_stem) replaces the first two
        # conv+pool stages; it covers the sequential folded bf16 chain.
        # Validated BEFORE the int8 early-return below so
        # pallas_stem=True + int8=True errors instead of silently
        # serving the int8 path with --pallas-stem ignored.
        if passthrough or int8:
            raise ValueError("--pallas-stem covers the sequential "
                             "Darknet19 chain (no passthrough route, "
                             "no int8)")
        if downsample != "pool":
            raise ValueError("--pallas-stem fuses the pool-based stem; "
                             "the stride variant has no pools to fuse")
        if not (fold_bn and batch_stats):
            raise ValueError("--pallas-stem serves the BN-folded chain; "
                             "fold_bn=True with batch_stats is required")
    if int8:
        if calib_images is None:
            raise ValueError("int8 serving needs calib_images (a "
                             "representative batch) for activation "
                             "calibration")
        if not (fold_bn and batch_stats):
            raise ValueError("int8 serving quantizes the BN-folded "
                             "weights: fold_bn=True with batch_stats "
                             "is required")
        return _make_detect_fn_int8(yolo, params, batch_stats,
                                    object_thresh, use_nms, nms_iou, v2,
                                    calib_images, passthrough=passthrough)
    bn_on_output = not v2

    def build_model(folded: bool):
        if passthrough:
            return Darknet19DetectorV2(output_channels=yolo.cell_channels,
                                       fold_bn=folded, dtype=dtype,
                                       downsample=downsample)
        return Darknet19Detector(output_channels=yolo.cell_channels,
                                 bn_on_output=bn_on_output,
                                 fold_bn=folded, dtype=dtype,
                                 downsample=downsample)

    if fold_bn and batch_stats:
        variables = {"params": fold_params(params, batch_stats)}
        model = build_model(True)
    else:
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        model = build_model(False)

    # params must be jit ARGUMENTS, not closure constants: closed-over
    # arrays are baked into the HLO as literals, which bloats the program
    # (and overflows the axon tunnel's compile-request size limit for
    # large models)
    variables = jax.device_put(variables)

    @jax.jit
    def _detect(variables, images: jnp.ndarray) -> Detections:
        if images.dtype == jnp.uint8:
            # device-normalize serving path: the host ships raw uint8
            # (image_read_u8, 4x fewer transfer bytes) and the chip does
            # (x/255)*2-1 here — XLA fuses it into the first conv, and
            # the value is bit-identical to host-side normalize
            images = images.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        if pallas_stem:
            from tensorflow_yolo2_tpu.ops.pallas_stem import (
                pallas_detect_forward,
            )

            grid = pallas_detect_forward(
                variables["params"], images, dtype=dtype,
                interpret=jax.default_backend() != "tpu",
                linear_output=not bn_on_output)
        else:
            grid = model.apply(variables, images, train=False)
        if use_nms:
            # the fused Pallas decode+NMS serving kernel (same survivor
            # set as decode_grid[_v2] + nms_fixed; dispatches on the
            # head layout — per_slot_classes selects the anchor kernel)
            return decode_nms_pallas(grid, yolo, object_thresh, nms_iou,
                                     max_outputs=32)
        if v2:
            from tensorflow_yolo2_tpu.ops.boxes import decode_grid_v2

            return jax.vmap(
                lambda g: decode_grid_v2(g, yolo, object_thresh))(grid)
        return decode_grid_pallas(grid, yolo, object_thresh)

    def detect(images: jnp.ndarray) -> Detections:
        return _detect(variables, images)

    return detect


def make_spatial_detect_fn(yolo: YoloConfig, params, batch_stats,
                           object_thresh: float = 0.5,
                           use_nms: bool = False, nms_iou: float = 0.5,
                           v2: bool = False, passthrough: bool = False,
                           downsample: str = "pool", n_shards: int = 2,
                           axis: str = "spatial"):
    """Spatially-sharded serving twin of :func:`make_detect_fn`
    (``--spatial N``): the folded trunk + head run H-sharded over an
    ``n_shards``-device mesh with per-layer halo exchange
    (parallel.spatial.spatial_detector_fn — SURVEY §5.7, the CNN analog
    of context parallelism), then the gathered grid feeds the same
    decode(+NMS) tail. Requires ``n_shards`` local devices and
    image_size % (32·n_shards) == 0; covers every served head/trunk
    (v1 quirk head, --v2 linear head, --passthrough reorg head,
    --downsample stride)."""
    import numpy as _np

    from jax.sharding import Mesh

    from tensorflow_yolo2_tpu.parallel.spatial import spatial_detector_fn

    if v2 != yolo.per_slot_classes:
        raise ValueError(
            f"v2={v2} disagrees with yolo.per_slot_classes="
            f"{yolo.per_slot_classes} (see make_detect_fn)")
    if passthrough and not v2:
        raise ValueError("passthrough is the YOLOv2 reorg head — it "
                         "requires v2=True")
    if yolo.image_size % (32 * n_shards):
        raise ValueError(
            f"--spatial {n_shards} needs --image-size divisible by "
            f"{32 * n_shards} (5 stride-2 downsamples per shard); got "
            f"{yolo.image_size}")
    devices = jax.devices()
    if len(devices) < n_shards:
        raise ValueError(
            f"--spatial {n_shards} needs {n_shards} local devices, have "
            f"{len(devices)} (on CPU: "
            f"XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    mesh = Mesh(_np.asarray(devices[:n_shards]), (axis,))
    if not batch_stats:
        raise ValueError("spatial serving folds BN into the convs; the "
                         "restored snapshot has no batch statistics")
    folded = jax.device_put(fold_params(params, batch_stats))
    forward = spatial_detector_fn(mesh, axis=axis, bn_on_output=not v2,
                                  downsample=downsample,
                                  head="v2p" if passthrough else "v1")

    def detect(images: jnp.ndarray) -> Detections:
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        grid = forward(folded, images)
        if use_nms:
            return decode_nms_pallas(grid, yolo, object_thresh, nms_iou,
                                     max_outputs=32)
        if v2:
            from tensorflow_yolo2_tpu.ops.boxes import decode_grid_v2

            return jax.vmap(
                lambda g: decode_grid_v2(g, yolo, object_thresh))(grid)
        return decode_grid_pallas(grid, yolo, object_thresh)

    return detect


def quantize_detector(params, batch_stats, calib_images, v2: bool = False,
                      passthrough: bool = False):
    """Fold BN and post-training-quantize a detector → int8 layer chain.

    ``passthrough`` quantizes the full YOLOv2 reorg architecture
    (ops.quant head="detector_v2p": passthrough conv + int8
    space-to-depth/concat at the shared conv3 input scale)."""
    from tensorflow_yolo2_tpu.ops.quant import calibrate, quantize_folded

    head = "detector_v2p" if passthrough else "detector"
    folded = fold_params(params, batch_stats)
    scales = calibrate(folded, jnp.asarray(calib_images, jnp.float32),
                       v2=v2, head=head)
    return quantize_folded(folded, scales, v2=v2, head=head)


def make_detect_fn_int8(yolo: YoloConfig, qlayers,
                        object_thresh: float = 0.5, use_nms: bool = False,
                        nms_iou: float = 0.5, v2: bool = False,
                        passthrough: bool = False):
    """Jitted detect fn over a prebuilt int8 chain (quantize_detector or
    a loaded ops.quant.save_quantized artifact)."""
    from tensorflow_yolo2_tpu.ops.quant import forward_int8

    head = "detector_v2p" if passthrough else "detector"
    qlayers = jax.device_put(tuple(qlayers))

    @jax.jit
    def _detect(qlayers, images: jnp.ndarray) -> Detections:
        grid = forward_int8(qlayers, images, v2=v2, head=head)
        if use_nms:
            return decode_nms_pallas(grid, yolo, object_thresh, nms_iou,
                                     max_outputs=32)
        if v2:
            from tensorflow_yolo2_tpu.ops.boxes import decode_grid_v2

            return jax.vmap(
                lambda g: decode_grid_v2(g, yolo, object_thresh))(grid)
        return decode_grid_pallas(grid, yolo, object_thresh)

    def detect(images: jnp.ndarray) -> Detections:
        return _detect(qlayers, images)

    return detect


def _make_detect_fn_int8(yolo: YoloConfig, params, batch_stats,
                         object_thresh: float, use_nms: bool,
                         nms_iou: float, v2: bool, calib_images,
                         passthrough: bool = False):
    """int8 variant of make_detect_fn: quantized forward + same decode."""
    qlayers = quantize_detector(params, batch_stats, calib_images, v2=v2,
                                passthrough=passthrough)
    return make_detect_fn_int8(yolo, qlayers, object_thresh, use_nms,
                               nms_iou, v2, passthrough=passthrough)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image", nargs="?", default="assets/demo.jpg")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--nms", action="store_true",
                   help="apply class-aware NMS (the reference has none)")
    p.add_argument("--host-nms", action="store_true",
                   help="run the NMS post-process on host in the native "
                        "C++ kernel (utils/native.py) instead of inside "
                        "the jitted graph — same survivor set")
    p.add_argument("--tf-checkpoint", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--no-fold-bn", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="serve the post-training-quantized int8 chain "
                        "(ops.quant; calibrated on the input image)")
    p.add_argument("--int8-export", default=None, metavar="NPZ",
                   help="with --int8: also write the quantized chain as "
                        "a standalone serving artifact (ops.quant."
                        "save_quantized — ~¼ the fp32 snapshot bytes)")
    p.add_argument("--int8-weights", default=None, metavar="NPZ",
                   help="serve from a saved int8 artifact directly — no "
                        "snapshot, no calibration pass")
    p.add_argument("--v2", action="store_true",
                   help="anchor-head checkpoint (pascal_train_darknet --v2)")
    p.add_argument("--passthrough", action="store_true",
                   help="full YOLOv2 architecture: reorg/passthrough head "
                        "(pascal_train_darknet --v2 --passthrough)")
    p.add_argument("--downsample", default="pool",
                   choices=["pool", "stride"],
                   help="'stride' serves snapshots trained with "
                        "pascal_train_darknet --downsample stride (the "
                        "pool-free train-perf variant; separate "
                        "<net>_sd snapshot dirs)")
    p.add_argument("--image-size", type=int, default=224,
                   help="multiscale input (multiple of 32); the net is "
                        "fully convolutional, the grid scales to S=size/32 "
                        "(448 is the headline Darknet19-448 config)")
    p.add_argument("--pallas-stem", action="store_true",
                   help="serve the first two conv+pool stages through "
                        "the fused Pallas VMEM stem (ops.pallas_stem) "
                        "instead of the XLA composition — the conv1 "
                        "activation never touches HBM (bf16 folded "
                        "chain, pool downsample only)")
    p.add_argument("--spatial", type=int, default=0, metavar="N",
                   help="shard the H dimension over N devices with "
                        "per-layer halo exchange (parallel.spatial) — "
                        "high-resolution serving when one chip cannot "
                        "hold the activations. Needs N local devices "
                        "(CPU: XLA_FLAGS=--xla_force_host_platform_"
                        "device_count=N) and --image-size divisible by "
                        "32*N")
    args = p.parse_args(argv)

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    if args.image_size % 32:
        p.error("--image-size must be a multiple of 32")
    if args.int8_export and not args.int8:
        p.error("--int8-export requires --int8 (it writes the chain "
                "quantized in this run)")
    if args.int8_weights and (args.int8 or args.int8_export):
        p.error("--int8-weights already serves a quantized artifact; "
                "drop --int8/--int8-export")
    if args.int8_weights and args.tf_checkpoint:
        p.error("--int8-weights serves the artifact's own weights; "
                "--tf-checkpoint would be ignored")
    if args.no_fold_bn and (args.int8 or args.int8_weights):
        p.error("int8 serving quantizes the BN-folded chain; "
                "drop --no-fold-bn")
    if args.passthrough and not args.v2:
        p.error("--passthrough is the YOLOv2 reorg head; it requires --v2")
    if args.downsample == "stride" and (args.int8 or args.int8_weights):
        p.error("int8 serving covers the pool-based parity chain "
                "(ops.quant layer plan); the stride variant is bf16-only")
    if args.spatial and args.spatial < 2:
        p.error("--spatial N needs N >= 2 (1 shard is the normal path)")
    if args.spatial and (args.int8 or args.int8_weights
                         or args.pallas_stem or args.no_fold_bn):
        p.error("--spatial serves the folded f32/bf16 chain sharded "
                "over devices; it composes with --nms/--v2/"
                "--passthrough/--downsample but not with int8, "
                "--pallas-stem or --no-fold-bn")
    sd = "_sd" if args.downsample == "stride" else ""
    if args.v2:
        # anchors come from the snapshot dir's anchors.json when present
        # (k-means dimension clusters persisted by pascal_train_darknet
        # --anchors kmeans), else the classic VOC priors
        from tensorflow_yolo2_tpu.data.anchors import v2_config_for_snapshot
        net_name = ("darknet19_v2p" if args.passthrough
                    else "darknet19_v2") + sd
        yolo = v2_config_for_snapshot(
            net_name, "voc_2007", args.image_size,
            external_weights=args.tf_checkpoint is not None)
        params, stats = (None, None) if args.int8_weights else \
            load_detector_params(
                yolo, args.tf_checkpoint, network_name=net_name)
    else:
        yolo = YoloConfig(S=args.image_size // 32,
                          image_size=args.image_size)
        params, stats = (None, None) if args.int8_weights else \
            load_detector_params(yolo, args.tf_checkpoint,
                                 network_name="darknet19" + sd)
    image = image_read(args.image, yolo.image_size)  # BGR, [-1, 1]
    use_nms = args.nms and not args.host_nms
    if args.int8_weights:
        from tensorflow_yolo2_tpu.ops.quant import load_quantized

        qlayers, meta = load_quantized(args.int8_weights)
        for key, want in (("v2", args.v2),
                          ("passthrough", args.passthrough),
                          ("image_size", yolo.image_size)):
            if key in meta and meta[key] != want:
                p.error(f"--int8-weights artifact was quantized with "
                        f"{key}={meta[key]}, run requests {want}")
        detect = make_detect_fn_int8(yolo, qlayers, args.threshold,
                                     use_nms=use_nms, v2=args.v2,
                                     passthrough=args.passthrough)
    elif args.int8:
        if not stats:
            p.error("--int8 needs BatchNorm statistics to fold before "
                    "quantizing — the restored snapshot has none")
        qlayers = quantize_detector(params, stats, image[None], v2=args.v2,
                                    passthrough=args.passthrough)
        if args.int8_export:
            from tensorflow_yolo2_tpu.ops.quant import save_quantized

            save_quantized(args.int8_export, qlayers,
                           {"v2": args.v2,
                            "passthrough": args.passthrough,
                            "image_size": yolo.image_size})
            print(f"Exported int8 artifact to {args.int8_export}")
        detect = make_detect_fn_int8(yolo, qlayers, args.threshold,
                                     use_nms=use_nms, v2=args.v2,
                                     passthrough=args.passthrough)
    elif args.spatial:
        detect = make_spatial_detect_fn(
            yolo, params, stats, args.threshold, use_nms=use_nms,
            v2=args.v2, passthrough=args.passthrough,
            downsample=args.downsample, n_shards=args.spatial)
    else:
        detect = make_detect_fn(yolo, params, stats, args.threshold,
                                use_nms=use_nms,
                                fold_bn=not args.no_fold_bn, v2=args.v2,
                                passthrough=args.passthrough,
                                downsample=args.downsample,
                                pallas_stem=args.pallas_stem)
    dets = detect(image[None])
    boxes = np.asarray(dets.boxes[0])
    scores = np.asarray(dets.scores[0])
    classes = np.asarray(dets.classes[0])
    if args.host_nms:
        from tensorflow_yolo2_tpu.utils import native

        keep = native.nms(boxes, scores, classes, iou_thresh=0.5,
                          class_aware=True, score_thresh=0.0)
        if keep is None:
            p.error("native library unavailable (no toolchain?); "
                    "use --nms for the on-device NMS")
        boxes, scores, classes = boxes[keep], scores[keep], classes[keep]
    out = draw_detections(args.image, boxes, scores, classes, VOC_CLASSES,
                          out_path=args.out)
    print(f"Wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
