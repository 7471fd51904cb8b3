"""VOC mAP@0.5 evaluation over a Pascal image set.

The north-star quality metric (BASELINE.md): the reference ships no
evaluator at all — its only validation is eyeballing drawn boxes. This
entry runs the jitted detect path (forward + fused decode + NMS) over a
VOC split in batches and reports per-class AP + mAP via eval.voc_map.
"""

from __future__ import annotations

import numpy as np

from tensorflow_yolo2_tpu.config import YoloConfig
from tensorflow_yolo2_tpu.entries import common
from tensorflow_yolo2_tpu.entries.pascal_detect_darknet import (
    load_detector_params,
    make_detect_fn,
)
from tensorflow_yolo2_tpu.eval import VocMapEvaluator


def main(argv: list[str] | None = None) -> int:
    p = common.base_parser(__doc__)
    p.add_argument("--image-set", default="test")
    p.add_argument("--threshold", type=float, default=0.005,
                   help="low decode threshold: mAP wants deep recall")
    p.add_argument("--nms-iou", type=float, default=0.5)
    p.add_argument("--iou", type=float, default=0.5, help="match IoU")
    p.add_argument("--use-07-metric", action="store_true")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--v2", action="store_true",
                   help="evaluate an anchor-head snapshot "
                        "(pascal_train_darknet --v2)")
    p.add_argument("--passthrough", action="store_true",
                   help="evaluate a full-YOLOv2 reorg-head snapshot "
                        "(pascal_train_darknet --v2 --passthrough)")
    p.add_argument("--int8", action="store_true",
                   help="evaluate the post-training-quantized int8 "
                        "serving chain (ops.quant)")
    p.add_argument("--int8-calib-set", default="trainval",
                   help="image set supplying the one-batch activation "
                        "calibration (kept distinct from --image-set so "
                        "eval data never calibrates the quantizer)")
    args = p.parse_args(argv)

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    from tensorflow_yolo2_tpu.data.voc import PascalVOC

    batch_size = args.batch_size or 32
    if args.passthrough and not args.v2:
        p.error("--passthrough is the YOLOv2 reorg head; it requires --v2")
    if args.passthrough and args.int8:
        p.error("int8 serving does not cover the passthrough head's "
                "concat route yet")
    if args.v2:
        # decode with the priors the snapshot was trained against
        # (anchors.json — k-means dimension clusters — when present)
        from tensorflow_yolo2_tpu.data.anchors import v2_config_for_snapshot
        net_name = "darknet19_v2p" if args.passthrough else "darknet19_v2"
        yolo = v2_config_for_snapshot(
            net_name, "voc_2007",
            external_weights=args.tf_checkpoint is not None)
        params, stats = load_detector_params(
            yolo, args.tf_checkpoint, network_name=net_name)
    else:
        yolo = YoloConfig()
        params, stats = load_detector_params(yolo, args.tf_checkpoint)
    imdb = PascalVOC(args.image_set, batch_size=batch_size,
                     yolo=yolo, data_path=args.data_path)
    calib = None
    if args.int8:
        calib_imdb = PascalVOC(args.int8_calib_set, batch_size=batch_size,
                               yolo=yolo, data_path=args.data_path)
        calib, _ = calib_imdb.get()
    detect = make_detect_fn(yolo, params, stats, args.threshold,
                            use_nms=True, nms_iou=args.nms_iou, v2=args.v2,
                            int8=args.int8, calib_images=calib,
                            passthrough=args.passthrough)
    mAP, aps = run_eval(detect, imdb, yolo, iou=args.iou,
                        use_07_metric=args.use_07_metric,
                        max_images=args.max_images)
    for cls, ap in sorted(aps.items()):
        print(f"AP[{imdb.classes[cls]}] = {ap:.4f}")
    print(f"mAP@{args.iou} = {mAP:.4f} "
          f"({'VOC07 11-point' if args.use_07_metric else 'all-points'})")
    return 0


def run_eval(detect, imdb, yolo: YoloConfig, iou: float = 0.5,
             use_07_metric: bool = False,
             max_images: int | None = None) -> tuple[float, dict]:
    """mAP of a jitted detect fn over one VOC split; returns (mAP, APs).
    Factored out so experiment harnesses (benchmarks/quality_curve.py)
    can evaluate snapshots mid-training."""
    evaluator = VocMapEvaluator(imdb.num_class, iou_thresh=iou,
                                use_07_metric=use_07_metric)
    n_images = min(max_images or len(imdb.gt_labels), len(imdb.gt_labels))
    image_id = 0
    while image_id < n_images:
        images, labels = imdb.get()
        dets = detect(images)
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        classes = np.asarray(dets.classes)
        for b in range(imdb.batch_size):
            if image_id >= n_images:
                break
            evaluator.add_label_grid(image_id, boxes[b], scores[b],
                                     classes[b], labels[b], yolo.image_size)
            image_id += 1
        if image_id % (imdb.batch_size * 4) == 0:
            print(f"evaluated {image_id}/{n_images} images")
    return evaluator.mean_ap()


if __name__ == "__main__":
    raise SystemExit(main())
