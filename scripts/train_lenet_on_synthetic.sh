#!/usr/bin/env bash
# End-to-end recipe (capability of reference slim_dir/scripts/
# train_lenet_on_mnist.sh): train a small model on a small dataset, then
# evaluate — the smoke-test integration recipe. Uses the synthetic
# dataset because no real data is mounted in this environment.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m tensorflow_yolo2_tpu.entries.train_classifier \
  --model-name lenet --dataset-name synthetic \
  --iters 200 --batch-size 32 --optimizer sgd --learning-rate 0.01 \
  --compute-dtype float32 --num-workers 2

python -m tensorflow_yolo2_tpu.entries.eval_classifier \
  --model-name lenet --dataset-name synthetic --max-batches 4 \
  --compute-dtype float32
