"""Detection-quality curve: train mAP AND held-out val mAP over training.

The honest quality-evidence harness (VERDICT r1 item 6): a *hard*
synthetic VOC (2-5 objects/image, deliberate overlaps, imbalanced
classes — tests/synthetic.make_voc_hard) with a held-out val split;
trains pascal_train_darknet in stages and evaluates mAP@0.5 on BOTH
splits after each stage. Prints one JSON line per stage plus a final
table for README.

Usage (TPU or CPU; set TFY2_ROOT to a scratch dir first):

    python benchmarks/quality_curve.py [--stages 400,800,1600]
        [--batch 24] [--n-train 64] [--n-val 32] [--bn-momentum 0.9]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "tests"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stages", default="400,800,1600",
                    help="cumulative iteration checkpoints")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--n-val", type=int, default=32)
    ap.add_argument("--bn-momentum", type=float, default=0.9,
                    help="lower than the 0.99 reference default so the "
                         "folded eval stats keep up in a short run")
    ap.add_argument("--eval-max-images", type=int, default=None)
    ap.add_argument("--easy", action="store_true",
                    help="moderate fixture (no overlaps, 1-2 objects) — "
                         "the generalization sanity point")
    ap.add_argument("--v2", action="store_true",
                    help="train/eval the anchor head (pascal_train_darknet"
                         " --v2) — B=5 anchor priors + the per-slot "
                         "multi-object label grid (data/voc."
                         "build_label_grid_v2: one cell can own up to B "
                         "objects) + the YOLO9000 stabilizers (noobj "
                         "ignore threshold, burn-in prior loss, "
                         "(2-w*h) coord scale)")
    ap.add_argument("--passthrough", action="store_true",
                    help="with --v2: the full YOLOv2 reorg/passthrough "
                         "head (pascal_train_darknet --passthrough)")
    ap.add_argument("--anchors", default="classic",
                    choices=["classic", "kmeans"],
                    help="with --v2: anchor priors — 'kmeans' computes "
                         "dimension clusters on the fixture's own boxes "
                         "(pascal_train_darknet --anchors kmeans)")
    ap.add_argument("--multiscale", default=None,
                    help="comma-separated input sizes for YOLO9000 "
                         "multiscale training (requires --v2; passed "
                         "through to pascal_train_darknet --multiscale)")
    ap.add_argument("--eval-sizes", default=None,
                    help="comma-separated input sizes to ALSO evaluate "
                         "val mAP at after the final stage (the "
                         "train-once/serve-at-any-resolution claim of "
                         "multiscale training — the fully-convolutional "
                         "detector re-grids at S=size/32)")
    ap.add_argument("--grad-clip", type=float, default=None,
                    help="forwarded to pascal_train_darknet --grad-clip")
    ap.add_argument("--lr-decay", default=None,
                    choices=["fixed", "cosine", "exponential"],
                    help="forwarded to pascal_train_darknet --lr-decay "
                         "(the schedule re-anchors at each resumed "
                         "stage boundary, so it spans each stage's "
                         "delta, not the cumulative curve)")
    ap.add_argument("--pretrain-iters", type=int, default=0,
                    help="first pretrain the darknet19 classifier for N "
                         "iterations on a synthetic CLS-LOC tree of the "
                         "same object vocabulary (synthetic."
                         "make_cls_pretrain), so the detection stages "
                         "warm-start from it — the reference's "
                         "ImageNet→VOC workflow "
                         "(pascal_train_darknet.py:83)")
    args = ap.parse_args()
    if args.passthrough and not args.v2:
        ap.error("--passthrough requires --v2 (the reorg head is the "
                 "anchor layout)")
    stages = [int(s) for s in args.stages.split(",")]

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    import synthetic

    from tensorflow_yolo2_tpu.config import Paths, YoloConfig
    from tensorflow_yolo2_tpu.data.voc import PascalVOC
    from tensorflow_yolo2_tpu.entries import pascal_train_darknet
    from tensorflow_yolo2_tpu.entries.pascal_detect_darknet import (
        load_detector_params,
        make_detect_fn,
    )
    from tensorflow_yolo2_tpu.entries.pascal_eval_map import run_eval

    paths = Paths()
    voc_root = os.path.join(paths.root, "data", "VOCdevkit")
    if not os.path.exists(os.path.join(voc_root, "VOC2007", "ImageSets",
                                       "Main", "test.txt")):
        kind = "easy" if args.easy else "hard"
        print(f"generating {kind} synthetic VOC at {voc_root} "
              f"({args.n_train} train / {args.n_val} val)")
        synthetic.make_voc_hard(voc_root, n_train=args.n_train,
                                n_val=args.n_val, easy=args.easy)

    from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager
    if args.pretrain_iters and CheckpointManager(
            "darknet19", "ilsvrc_2017_cls",
            save_by_epoch=True).latest_step() is not None:
        # resume-aware: the classifier snapshot already exists — a
        # re-invoked stage program must not train the pretrain again
        print("pretrain snapshot present; skipping --pretrain-iters")
        args.pretrain_iters = 0
    if args.pretrain_iters:
        ilsvrc_root = os.path.join(paths.root, "data", "ILSVRC")
        if not os.path.exists(os.path.join(ilsvrc_root, "ImageSets",
                                           "CLS-LOC", "train_cls.txt")):
            print(f"generating classification pretrain set at {ilsvrc_root}")
            synthetic.make_cls_pretrain(ilsvrc_root)
        from tensorflow_yolo2_tpu.entries import imagenet_train_darknet
        rc = imagenet_train_darknet.main(
            ["--iters", str(args.pretrain_iters), "--batch-size", "48",
             "--num-workers", "2", "--log-every", "50",
             "--eval-every", "100", "--uint8-transfer",
             "--save-every", str(args.pretrain_iters)])
        assert rc == 0
        # pascal_train_darknet discovers the snapshot automatically
        # (warm-start by variable intersection, the net_utils.py:81-101
        # path); nothing else to wire

    from tensorflow_yolo2_tpu.config import yolo_v2_config
    yolo = yolo_v2_config() if args.v2 else YoloConfig()
    rows = []
    # Stages are CUMULATIVE iteration counts, resume-aware: a fresh
    # invocation reads the newest snapshot's step and trains only the
    # remaining delta — so chunking a long program into one process per
    # stage (the tunnel-degradation mitigation, CLAUDE.md) keeps the
    # stage labels and the training budget exact across restarts.
    from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager
    curve_net = ("darknet19_v2p" if args.passthrough
                 else "darknet19_v2" if args.v2 else "darknet19")
    done = CheckpointManager(curve_net, "voc_2007",
                             save_by_epoch=False).latest_step() or 0
    if done:
        print(f"resuming stage program at iter {done} "
              f"(newest {curve_net} snapshot)")
    for stage in stages:
        iters = stage - done
        if iters <= 0:
            print(f"stage {stage} already trained (at {done}); skipping")
            continue
        # uint8-transfer: same pixel values, 4x fewer bytes over the
        # host↔device link (the tunnel is the wall for this harness)
        rc = pascal_train_darknet.main(
            ["--iters", str(iters), "--batch-size", str(args.batch),
             "--num-workers", "2", "--save-every", str(iters),
             "--log-every", "50", "--uint8-transfer",
             "--bn-momentum", str(args.bn_momentum)]
            + (["--v2", "--anchors", args.anchors] if args.v2 else [])
            + (["--passthrough"] if args.passthrough else [])
            + (["--multiscale", args.multiscale] if args.multiscale
               else [])
            + (["--grad-clip", str(args.grad_clip)]
               if args.grad_clip is not None else [])
            + (["--lr-decay", args.lr_decay] if args.lr_decay else []))
        assert rc == 0
        done = stage
        net_name = "darknet19_v2p" if args.passthrough else "darknet19_v2"
        if args.v2:
            # resolve the priors the run trained with (anchors.json in
            # the snapshot dir — identical to classic unless --anchors
            # kmeans computed dimension clusters on the fixture)
            from tensorflow_yolo2_tpu.data.anchors import (
                v2_config_for_snapshot,
            )
            yolo = v2_config_for_snapshot(net_name, "voc_2007")
        # Evaluation ground truth is pulled from the eval imdb's label
        # grid. Use the per-slot (multi-object) grid for GT in BOTH modes
        # so the mAP denominator counts every annotated object — the v1
        # one-object-per-cell grid would silently drop cell-overflow
        # objects from GT and flatter the score.
        eval_gt_yolo = yolo if args.v2 else yolo_v2_config(yolo.image_size)

        if args.v2:
            params, stats = load_detector_params(
                yolo, network_name=net_name)
        else:
            params, stats = load_detector_params(yolo)
        detect = make_detect_fn(yolo, params, stats, 0.005, use_nms=True,
                                v2=args.v2, passthrough=args.passthrough)
        row = {"iters": stage}
        for split, set_name in (("train", "trainval"), ("val", "test")):
            imdb = PascalVOC(set_name, batch_size=32, yolo=eval_gt_yolo)
            mAP, _ = run_eval(detect, imdb, eval_gt_yolo,
                              max_images=args.eval_max_images)
            row[f"map_{split}"] = round(float(mAP), 4)
        rows.append(row)
        print("STAGE " + json.dumps(row))

    print("\n| iters | train mAP@0.5 | val mAP@0.5 |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['iters']} | {r['map_train']:.3f} | "
              f"{r['map_val']:.3f} |")

    if args.eval_sizes:
        # the fully-convolutional detector re-grids at S=size/32 with the
        # SAME weights (anchors are stored in cell units and rescale as
        # image fractions, YoloConfig.at_scale) — multiscale-trained
        # snapshots should hold val mAP across serving resolutions
        sizes = sorted({int(s) for s in args.eval_sizes.split(",")})
        assert all(s % 32 == 0 for s in sizes), "eval sizes must be k*32"
        multi = []
        for size in sizes:
            syolo = yolo.at_scale(size // 32)
            if args.v2:
                params, stats = load_detector_params(
                    syolo, network_name=net_name)
            else:
                params, stats = load_detector_params(syolo)
            detect = make_detect_fn(syolo, params, stats, 0.005,
                                    use_nms=True, v2=args.v2,
                                    passthrough=args.passthrough)
            imdb = PascalVOC("test", batch_size=32, yolo=syolo)
            mAP, _ = run_eval(detect, imdb, syolo,
                              max_images=args.eval_max_images)
            multi.append({"size": size, "map_val": round(float(mAP), 4)})
            print("EVAL_SIZE " + json.dumps(multi[-1]))
        print("\n| serve size | val mAP@0.5 |")
        print("|---|---|")
        for m in multi:
            print(f"| {m['size']} | {m['map_val']:.3f} |")


if __name__ == "__main__":
    main()
