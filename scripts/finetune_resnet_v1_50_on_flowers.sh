#!/usr/bin/env bash
# Capability of reference slim_dir/scripts/finetune_resnet_v1_50_on_
# flowers.sh: warm-start resnet_v1_50 from pretrained weights (drop the
# logits scope), fine-tune only the new head on flowers, then fine-tune
# the whole net at a lower LR, evaluating after each phase.
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT="${1:-}"  # optional warm-start snapshot dir

python -m tensorflow_yolo2_tpu.entries.train_classifier \
  --model-name resnet_v1_50 --preprocessing-name resnet_v1_50 --dataset-name flowers \
  --iters 1000 --batch-size 32 --optimizer rmsprop --learning-rate 0.01 \
  --trainable-scopes logits \
  ${CKPT:+--checkpoint-path "$CKPT" --checkpoint-exclude-scopes logits}

python -m tensorflow_yolo2_tpu.entries.train_classifier \
  --model-name resnet_v1_50 --preprocessing-name resnet_v1_50 --dataset-name flowers \
  --iters 500 --batch-size 32 --optimizer rmsprop --learning-rate 0.001

python -m tensorflow_yolo2_tpu.entries.eval_classifier \
  --model-name resnet_v1_50 --preprocessing-name resnet_v1_50 --dataset-name flowers --max-batches 8
