"""Released-checkpoint parity harness — ONE command for the day the
reference's published weights are mountable.

The reference ships three trained checkpoint bundles
(/root/reference/README.md:8,22-26):

- **darknet19-Pascal** — the YOLO detector trained 80k iters on VOC2007
  (restored from ``weights/darknet19_pascal.ckpt``, reference
  config.py:23 / pascal_detect_darknet.py:54-60);
- **darknet19-ImageNet** — the classifier trained 88 epochs (~60% val
  top-1; ``weights/darkent19_imagenet.ckpt`` — the reference's literal
  filename, typo included, config.py:24);
- **resnet50-Pascal** — the slim-ResNet50 + FC-YOLO-head detector
  (a ckpts-dir TF checkpoint, pascal_detect_resnet.py:65).

For each bundle that exists this runs: TF-ckpt import (compat.tf_import)
→ the real serving path (BN fold, fused Pallas decode+NMS) → detection
boxes / top-5 predictions on the given images, and — when a real
VOCdevkit or ILSVRC tree is mounted — mAP@0.5 / top-1 over the val
split. Bundles that are absent SKIP cleanly and the command exits 0, so
the same invocation is a no-op today and the full parity gate the moment
the Dropbox weights land in ``$TFY2_ROOT/weights/``.

Golden-box regression: ``--golden-out golden.json`` records every
detection; a later run with ``--golden-check golden.json`` re-runs the
pipeline and fails (exit 1) if any box moved more than ``--tol-box``
pixels or any score more than ``--tol-score`` — serving-path stability
on the real weights across code changes.

Usage::

    scripts/verify_released_ckpts.sh            # defaults, skips absent
    python -m tensorflow_yolo2_tpu.entries.verify_released_ckpts \
        --images assets/demo.jpg --voc-root $TFY2_ROOT/data/VOCdevkit \
        --golden-out golden.json
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any

import numpy as np

RESULT: dict[str, Any] = {}


def _ckpt_present(path: str | None) -> bool:
    """TF checkpoint presence: V2 pair (``path.index``) or V1 file."""
    if not path:
        return False
    return os.path.exists(path + ".index") or os.path.exists(path)


def _first_present(*paths: str) -> str | None:
    for p in paths:
        if _ckpt_present(p):
            return p
    return paths[0] if paths else None


def _detections_record(name: str, image_path: str, dets, i: int = 0):
    scores = np.asarray(dets.scores[i])
    kept = scores > 0
    return {
        "artifact": name,
        "image": os.path.basename(image_path),
        "boxes": np.asarray(dets.boxes[i])[kept].round(2).tolist(),
        "scores": scores[kept].round(5).tolist(),
        "classes": np.asarray(dets.classes[i])[kept].astype(int).tolist(),
    }


def _check_golden(records, golden_path: str, tol_box: float,
                  tol_score: float) -> list[str]:
    """Compare fresh records against a saved golden file; returns a list
    of human-readable mismatch strings (empty = pass)."""
    with open(golden_path) as f:
        golden = json.load(f)["records"]
    fresh = {(r["artifact"], r["image"]): r for r in records}
    errors = []
    for g in golden:
        key = (g["artifact"], g["image"])
        r = fresh.get(key)
        if r is None:
            errors.append(f"{key}: golden entry has no fresh counterpart "
                          "(artifact skipped or image list changed)")
            continue
        if len(g["boxes"]) != len(r["boxes"]):
            errors.append(f"{key}: {len(g['boxes'])} golden boxes vs "
                          f"{len(r['boxes'])} fresh")
            continue
        if g.get("classes") != r.get("classes"):
            errors.append(f"{key}: class ids changed "
                          f"{g['classes']} -> {r['classes']}")
        db = np.abs(np.asarray(g["boxes"], np.float64).reshape(-1, 4)
                    - np.asarray(r["boxes"], np.float64).reshape(-1, 4))
        ds = np.abs(np.asarray(g["scores"], np.float64)
                    - np.asarray(r["scores"], np.float64))
        if db.size and db.max() > tol_box:
            errors.append(f"{key}: max box delta {db.max():.3f}px "
                          f"> {tol_box}")
        if ds.size and ds.max() > tol_score:
            errors.append(f"{key}: max score delta {ds.max():.5f} "
                          f"> {tol_score}")
    return errors


def _verify_darknet_pascal(ckpt: str, images: list[str], voc_root,
                           threshold: float, max_images, records) -> dict:
    """Import → fused serving path → boxes (→ mAP when VOC is mounted)."""
    import jax.numpy as jnp

    from tensorflow_yolo2_tpu.config import VOC_CLASSES, YoloConfig
    from tensorflow_yolo2_tpu.data.augment import image_read
    from tensorflow_yolo2_tpu.entries.pascal_detect_darknet import (
        load_detector_params,
        make_detect_fn,
    )

    yolo = YoloConfig()
    params, stats = load_detector_params(yolo, tf_checkpoint=ckpt)
    detect = make_detect_fn(yolo, params, stats, object_thresh=threshold,
                            use_nms=True, dtype=jnp.bfloat16)
    info: dict[str, Any] = {"ckpt": ckpt, "images": {}}
    for path in images:
        dets = detect(image_read(path, yolo.image_size)[None])
        rec = _detections_record("darknet19_pascal", path, dets)
        records.append(rec)
        info["images"][os.path.basename(path)] = [
            f"{VOC_CLASSES[c]}:{s:.3f}"
            for c, s in zip(rec["classes"], rec["scores"])]
    if voc_root:
        info["map_voc2007_test"] = _voc_map(detect, yolo, voc_root,
                                            max_images)
    return info


def _verify_resnet_pascal(ckpt: str, images: list[str], voc_root,
                          threshold: float, max_images, records) -> dict:
    """resnet50-Pascal detector: named-mapping import → forward (train-mode
    BN frozen stats) → same fused decode+NMS kernel."""
    import jax
    import jax.numpy as jnp

    from tensorflow_yolo2_tpu.compat.tf_import import (
        import_resnet_detector_checkpoint,
    )
    from tensorflow_yolo2_tpu.config import VOC_CLASSES, YoloConfig
    from tensorflow_yolo2_tpu.data.augment import image_read
    from tensorflow_yolo2_tpu.models.resnet import ResNet50Detector
    from tensorflow_yolo2_tpu.ops.pallas_decode import decode_nms_pallas

    yolo = YoloConfig()
    params, stats = import_resnet_detector_checkpoint(ckpt)
    if "yolo_fc1" not in params:
        raise ValueError(
            f"{ckpt}: resnet trunk imported but no yolo_fc1/yolo_fc2 "
            "head variables — this looks like the *classification* "
            "resnet_v1_50 release, not the Pascal detector bundle")
    model = ResNet50Detector(output_channels=yolo.cell_channels, S=yolo.S,
                             dtype=jnp.bfloat16)
    variables = jax.device_put({"params": params, "batch_stats": stats})

    @jax.jit
    def _detect(variables, imgs):
        grid = model.apply(variables, imgs, train=False)
        return decode_nms_pallas(grid, yolo, threshold, 0.5,
                                 max_outputs=32)

    def detect(imgs):
        return _detect(variables, imgs)

    info: dict[str, Any] = {"ckpt": ckpt, "images": {}}
    for path in images:
        dets = detect(image_read(path, yolo.image_size)[None])
        rec = _detections_record("resnet50_pascal", path, dets)
        records.append(rec)
        info["images"][os.path.basename(path)] = [
            f"{VOC_CLASSES[c]}:{s:.3f}"
            for c, s in zip(rec["classes"], rec["scores"])]
    if voc_root:
        info["map_voc2007_test"] = _voc_map(detect, yolo, voc_root,
                                            max_images)
    return info


def _voc_map(detect, yolo, voc_root: str, max_images) -> float:
    from tensorflow_yolo2_tpu.data.voc import PascalVOC
    from tensorflow_yolo2_tpu.entries.pascal_eval_map import run_eval

    imdb = PascalVOC("test", batch_size=8, yolo=yolo,
                     data_path=os.path.join(voc_root, "VOC2007"))
    mAP, _ = run_eval(detect, imdb, yolo, max_images=max_images)
    return round(float(mAP), 4)


def _verify_darknet_imagenet(ckpt: str, images: list[str], ilsvrc_root,
                             max_images, records) -> dict:
    """ImageNet classifier: import → BN fold → top-5 per image (→ val
    top-1/top-5 when an ILSVRC tree is mounted). The class count is
    inferred from the checkpoint's logits conv, so both the 1000-way
    release and locally-trained subsets verify with the same command."""
    import jax
    import jax.numpy as jnp

    from tensorflow_yolo2_tpu.compat.tf_import import (
        import_darknet19_checkpoint,
    )
    from tensorflow_yolo2_tpu.data.augment import image_read
    from tensorflow_yolo2_tpu.models.darknet import Darknet19Classifier
    from tensorflow_yolo2_tpu.models.fold import fold_params

    params, stats = import_darknet19_checkpoint(ckpt, detection=False)
    num_classes = int(params["conv19"]["conv"]["kernel"].shape[-1]) \
        if "conv" in params["conv19"] \
        else int(params["conv19"]["kernel"].shape[-1])
    folded = jax.device_put(fold_params(params, stats))
    model = Darknet19Classifier(num_classes=num_classes, fold_bn=True,
                                dtype=jnp.bfloat16)

    @jax.jit
    def _predict(p, imgs):
        return jax.nn.softmax(model.apply({"params": p}, imgs,
                                          train=False))

    info: dict[str, Any] = {"ckpt": ckpt, "num_classes": num_classes,
                            "images": {}}
    for path in images:
        probs = np.asarray(_predict(folded,
                                    image_read(path, 224)[None])[0])
        top5 = np.argsort(-probs)[:5]
        rec = {"artifact": "darknet19_imagenet",
               "image": os.path.basename(path),
               "boxes": [], "classes": top5.astype(int).tolist(),
               "scores": probs[top5].round(5).tolist()}
        records.append(rec)
        info["images"][os.path.basename(path)] = [
            f"{c}:{s:.4f}" for c, s in zip(rec["classes"], rec["scores"])]
    if ilsvrc_root:
        from tensorflow_yolo2_tpu.data.ilsvrc import IlsvrcCls

        imdb = IlsvrcCls("val", batch_size=25, data_path=ilsvrc_root)
        n = min(max_images or 500, len(imdb.gt_labels))
        top1 = top5c = seen = 0
        while seen < n:
            imgs, labels = imdb.get()
            p = np.asarray(_predict(folded, imgs))
            rank = np.argsort(-p, axis=1)
            top1 += int((rank[:, 0] == labels).sum())
            top5c += int((rank[:, :5] == labels[:, None]).any(1).sum())
            seen += len(labels)
        info["val_top1"] = round(top1 / seen, 4)
        info["val_top5"] = round(top5c / seen, 4)
        info["val_images"] = seen
    return info


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--weights-dir", default=None,
                   help="where the released ckpts live (default "
                        "$TFY2_ROOT/weights — the reference's weights/ "
                        "convention, config.py:16)")
    p.add_argument("--darknet-pascal", default=None,
                   help="override the darknet19-Pascal ckpt path")
    p.add_argument("--darknet-imagenet", default=None,
                   help="override the darknet19-ImageNet ckpt path")
    p.add_argument("--resnet-pascal", default=None,
                   help="override the resnet50-Pascal ckpt path")
    p.add_argument("--images", nargs="*", default=None,
                   help="test images for golden boxes / top-5 "
                        "(default assets/demo.jpg if present)")
    p.add_argument("--voc-root", default=None,
                   help="a real VOCdevkit/ — adds mAP@0.5 on VOC2007 test")
    p.add_argument("--ilsvrc-root", default=None,
                   help="a real ILSVRC tree — adds val top-1/top-5")
    p.add_argument("--threshold", type=float, default=0.2)
    p.add_argument("--max-images", type=int, default=None,
                   help="cap the mAP / accuracy sweeps")
    p.add_argument("--golden-out", default=None,
                   help="write all detections/predictions to this JSON")
    p.add_argument("--golden-check", default=None,
                   help="compare against a saved --golden-out file")
    p.add_argument("--tol-box", type=float, default=1.0,
                   help="golden-check box tolerance, pixels")
    p.add_argument("--tol-score", type=float, default=1e-3)
    args = p.parse_args(argv)

    from tensorflow_yolo2_tpu.config import Paths

    weights = args.weights_dir or Paths().weights
    try:
        import tensorflow  # noqa: F401  (only the ckpt reader is used)
        have_tf = True
    except ImportError:
        have_tf = False

    images = args.images
    if images is None:
        images = ["assets/demo.jpg"] if os.path.exists(
            "assets/demo.jpg") else []
    for path in images:
        if not os.path.exists(path):
            p.error(f"test image not found: {path}")

    artifacts = [
        ("darknet19_pascal",
         _first_present(args.darknet_pascal
                        or os.path.join(weights, "darknet19_pascal.ckpt")),
         _verify_darknet_pascal,
         dict(images=images, voc_root=args.voc_root,
              threshold=args.threshold, max_images=args.max_images)),
        ("darknet19_imagenet",
         _first_present(*([args.darknet_imagenet] if args.darknet_imagenet
                          else [os.path.join(weights,
                                             "darknet19_imagenet.ckpt"),
                                # the reference's literal filename
                                # (config.py:24, typo preserved)
                                os.path.join(weights,
                                             "darkent19_imagenet.ckpt")])),
         _verify_darknet_imagenet,
         dict(images=images, ilsvrc_root=args.ilsvrc_root,
              max_images=args.max_images)),
        ("resnet50_pascal",
         _first_present(args.resnet_pascal
                        or os.path.join(weights, "resnet50_pascal.ckpt")),
         _verify_resnet_pascal,
         dict(images=images, voc_root=args.voc_root,
              threshold=args.threshold, max_images=args.max_images)),
    ]

    if any(_ckpt_present(path) for _, path, _, _ in artifacts):
        from tensorflow_yolo2_tpu.utils.jaxsetup import (
            enable_compilation_cache,
        )
        enable_compilation_cache()

    records: list[dict] = []
    ran, skipped = [], []
    for name, path, fn, kwargs in artifacts:
        if not _ckpt_present(path):
            skipped.append(name)
            print(f"SKIP {name}: no checkpoint at {path}")
            continue
        if not have_tf:
            skipped.append(name)
            print(f"SKIP {name}: checkpoint present at {path} but "
                  "tensorflow (the ckpt reader) is not importable")
            continue
        info = fn(path, records=records, **kwargs)
        ran.append(name)
        print(f"ARTIFACT {json.dumps({'name': name, **info})}")

    failures: list[str] = []
    if args.golden_check:
        failures = _check_golden(records, args.golden_check,
                                 args.tol_box, args.tol_score)
        for e in failures:
            print(f"GOLDEN MISMATCH {e}")
    if args.golden_out and records:
        with open(args.golden_out, "w") as f:
            json.dump({"records": records}, f, indent=1)
        print(f"Wrote golden file {args.golden_out} "
              f"({len(records)} records)")

    summary = {"ran": ran, "skipped": skipped,
               "golden_ok": not failures if args.golden_check else None,
               "ok": not failures}
    RESULT.clear()
    RESULT.update(summary, records=records)
    print("VERIFY " + json.dumps(summary))
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
