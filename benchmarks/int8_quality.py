"""int8-vs-bf16 serving accuracy: mAP@0.5 deltas on a held-out split.

The honesty half of the int8 serving claim (ops.quant, bench.py
BENCH_INT8=1 is the throughput half): load a trained detector snapshot,
serve the SAME weights through the bf16 folded path and the
post-training-quantized int8 path (activation calibration on one
*trainval* batch — never the eval split), and report both mAPs on the
held-out ``test`` split plus the train split.

Usage (expects a trained snapshot under TFY2_ROOT, e.g. a
benchmarks/quality_curve.py run dir):

    TFY2_ROOT=/root/qexp_pre python benchmarks/int8_quality.py [--v2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--v2", action="store_true",
                    help="evaluate the anchor-head snapshot")
    ap.add_argument("--passthrough", action="store_true",
                    help="with --v2: the full reorg-head snapshot "
                         "(darknet19_v2p; int8 head='detector_v2p')")
    ap.add_argument("--threshold", type=float, default=0.005)
    ap.add_argument("--max-images", type=int, default=None)
    args = ap.parse_args()

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    from tensorflow_yolo2_tpu.config import YoloConfig
    from tensorflow_yolo2_tpu.data.voc import PascalVOC
    from tensorflow_yolo2_tpu.entries.pascal_detect_darknet import (
        load_detector_params,
        make_detect_fn,
    )
    from tensorflow_yolo2_tpu.entries.pascal_eval_map import run_eval

    if args.passthrough and not args.v2:
        ap.error("--passthrough requires --v2")
    if args.v2:
        # decode with the snapshot's persisted priors (anchors.json —
        # k-means dimension clusters — when present)
        from tensorflow_yolo2_tpu.data.anchors import v2_config_for_snapshot
        net = "darknet19_v2p" if args.passthrough else "darknet19_v2"
        yolo = v2_config_for_snapshot(net, "voc_2007")
        params, stats = load_detector_params(yolo, network_name=net)
    else:
        yolo = YoloConfig()
        params, stats = load_detector_params(yolo)

    calib_imdb = PascalVOC("trainval", batch_size=8, yolo=yolo)
    calib, _ = calib_imdb.get()

    detectors = {
        "bf16": make_detect_fn(yolo, params, stats, args.threshold,
                               use_nms=True, v2=args.v2,
                               passthrough=args.passthrough),
        "int8": make_detect_fn(yolo, params, stats, args.threshold,
                               use_nms=True, v2=args.v2, int8=True,
                               passthrough=args.passthrough,
                               calib_images=calib),
    }
    result: dict = {"head": ("v2p" if args.passthrough else "v2")
                    if args.v2 else "v1"}
    for split, set_name in (("train", "trainval"), ("val", "test")):
        imdb = PascalVOC(set_name, batch_size=8, yolo=yolo)
        for mode, detect in detectors.items():
            mAP, _ = run_eval(detect, imdb, yolo,
                              max_images=args.max_images)
            result[f"map_{split}_{mode}"] = round(float(mAP), 4)
        result[f"delta_{split}"] = round(
            result[f"map_{split}_int8"] - result[f"map_{split}_bf16"], 4)
    print("INT8_QUALITY " + json.dumps(result))


if __name__ == "__main__":
    main()
