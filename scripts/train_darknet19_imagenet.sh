#!/usr/bin/env bash
# Counterpart of the reference's top-level recipe
# /root/reference/slim_train_darknet19_imagenet.sh: train darknet19 on
# ImageNet (ILSVRC CLS-LOC layout) through the flag-driven classifier
# trainer with vgg preprocessing at 224². No network egress / no real
# ImageNet is mounted here, so when IMAGENET_DIR is absent a synthetic
# CLS-LOC-layout fixture is generated; point IMAGENET_DIR at a real
# ILSVRC2017 CLS tree (train_cls.txt + Data/CLS-LOC/...) to train for real
# and raise ITERS/BATCH to production values (reference: batch 48,
# ~88 epochs to ~60% top-1, README.md:23).
set -euo pipefail
cd "$(dirname "$0")/.."

IMAGENET_DIR="${IMAGENET_DIR:-${TFY2_ROOT:-..}/data/ilsvrc}"
ITERS="${ITERS:-100}"
BATCH="${BATCH:-16}"

if [ ! -e "$IMAGENET_DIR/train_cls.txt" ]; then
  echo "no ILSVRC at $IMAGENET_DIR — writing synthetic CLS-LOC fixture"
  python - "$IMAGENET_DIR" <<'EOF'
import sys
from tests.synthetic import make_cls_pretrain
make_cls_pretrain(sys.argv[1], per_class=24, n_val=16)
EOF
fi

python -m tensorflow_yolo2_tpu.entries.train_classifier \
  --model-name darknet19 --dataset-name imagenet \
  --data-path "$IMAGENET_DIR" \
  --image-size 224 --preprocessing-name vgg \
  --iters "$ITERS" --batch-size "$BATCH" \
  --optimizer momentum --learning-rate 0.001 --momentum 0.9

python -m tensorflow_yolo2_tpu.entries.eval_classifier \
  --model-name darknet19 --dataset-name imagenet \
  --data-path "$IMAGENET_DIR" \
  --image-size 224 --preprocessing-name vgg \
  --dataset-split-name val --max-batches 4
