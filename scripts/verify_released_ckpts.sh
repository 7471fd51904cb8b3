#!/usr/bin/env bash
# Released-checkpoint parity gate (VERDICT r2 item 5) — ONE command.
#
# Drop the reference's published weight bundles
# (/root/reference/README.md:8,22-26) into $TFY2_ROOT/weights/ as
#   darknet19_pascal.ckpt[.index/.data]   (VOC detector, 80k iters)
#   darknet19_imagenet.ckpt               (classifier, 88 epochs)
#   resnet50_pascal.ckpt                  (resnet50+FC-YOLO detector)
# and run this. Absent bundles are skipped cleanly (exit 0); present
# ones run import -> fused serving path -> golden boxes (+ mAP / val
# accuracy when --voc-root / --ilsvrc-root point at real datasets).
#
# The first run writes weights/released_golden.json; every later run
# checks against it, so serving-path regressions on the REAL weights
# fail loudly (exit 1).
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT="${TFY2_ROOT:-$(cd .. && pwd)}"
GOLDEN="$ROOT/weights/released_golden.json"
EXTRA=()
if [ -f "$GOLDEN" ]; then
    EXTRA+=(--golden-check "$GOLDEN")
else
    EXTRA+=(--golden-out "$GOLDEN")
fi
[ -d "$ROOT/data/VOCdevkit/VOC2007/ImageSets" ] && \
    EXTRA+=(--voc-root "$ROOT/data/VOCdevkit")
[ -f "$ROOT/data/ILSVRC/ImageSets/CLS-LOC/train_cls.txt" ] && \
    EXTRA+=(--ilsvrc-root "$ROOT/data/ILSVRC")

exec python -m tensorflow_yolo2_tpu.entries.verify_released_ckpts \
    "${EXTRA[@]}" "$@"
