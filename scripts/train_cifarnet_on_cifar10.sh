#!/usr/bin/env bash
# Capability of reference slim_dir/scripts/train_cifarnet_on_cifar10.sh:
# download cifar10 → convert → train cifarnet → eval. No network egress
# here, so the "download" step generates python-format batch files when
# none are present; point CIFAR_DIR at a real extracted
# cifar-10-batches-py to use actual data. The convert step exercises the
# download_and_convert CLI into prepared shards, and training runs off
# the prepared reader (the slim TFRecord path analog).
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT="${TFY2_ROOT:-..}"
CIFAR_DIR="${CIFAR_DIR:-$ROOT/data/cifar10}"
PREP_DIR="${PREP_DIR:-$ROOT/data/cifar10_prepared}"

if [ ! -e "$CIFAR_DIR/data_batch_1" ] && \
   [ ! -e "$CIFAR_DIR/data_batch_1.bin" ]; then
  echo "no CIFAR-10 at $CIFAR_DIR — writing synthetic python batches"
  python - "$CIFAR_DIR" <<'EOF'
import sys
from tests.synthetic import make_cifar10
make_cifar10(sys.argv[1], per_batch=64)
EOF
fi

python -m tensorflow_yolo2_tpu.entries.download_and_convert \
  --dataset-name cifar10 --source-dir "$CIFAR_DIR" \
  --dataset-dir "$PREP_DIR"

python -m tensorflow_yolo2_tpu.entries.train_classifier \
  --preprocessing-name cifarnet \
  --model-name cifarnet --dataset-name prepared \
  --data-path "$PREP_DIR/train" \
  --iters 200 --batch-size 32 --optimizer sgd --learning-rate 0.01 \
  --weight-decay 0.004 --compute-dtype float32 --num-workers 2

python -m tensorflow_yolo2_tpu.entries.eval_classifier \
  --preprocessing-name cifarnet \
  --model-name cifarnet --dataset-name prepared \
  --data-path "$PREP_DIR/test" --max-batches 4 --compute-dtype float32
