#!/usr/bin/env bash
# Capability of reference slim_dir/scripts/finetune_inception_v1_on_
# flowers.sh: warm-start inception_v1 from pretrained weights (drop the
# logits scope), fine-tune only the new head on flowers, then fine-tune
# the whole net at a lower LR, evaluating after each phase.
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT="${1:-}"  # optional warm-start snapshot dir
SIZE="${IMAGE_SIZE:-96}"  # 224 for real runs; small default keeps the
                          # synthetic-smoke recipe fast on 1 CPU core

python -m tensorflow_yolo2_tpu.entries.train_classifier \
  --model-name inception_v1 --preprocessing-name inception_v1 --dataset-name flowers --image-size "$SIZE" \
  --iters 300 --batch-size 16 --optimizer rmsprop --learning-rate 0.01 \
  --trainable-scopes logits \
  ${CKPT:+--checkpoint-path "$CKPT" --checkpoint-exclude-scopes logits}

python -m tensorflow_yolo2_tpu.entries.train_classifier \
  --model-name inception_v1 --preprocessing-name inception_v1 --dataset-name flowers --image-size "$SIZE" \
  --iters 150 --batch-size 16 --optimizer rmsprop --learning-rate 0.0001

python -m tensorflow_yolo2_tpu.entries.eval_classifier \
  --model-name inception_v1 --preprocessing-name inception_v1 --dataset-name flowers --image-size "$SIZE" \
  --max-batches 8
