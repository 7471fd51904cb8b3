#!/usr/bin/env bash
# End-to-end recipe (capability of reference slim_dir/scripts/
# train_lenet_on_mnist.sh: download mnist → convert → train lenet →
# eval). No network egress is available here, so the "download" step
# generates IDX-format files if none are present; point MNIST_DIR at a
# real extracted MNIST to use actual data.
set -euo pipefail
cd "$(dirname "$0")/.."

MNIST_DIR="${MNIST_DIR:-${TFY2_ROOT:-..}/data/mnist}"

if [ ! -e "$MNIST_DIR/train-images-idx3-ubyte" ] && \
   [ ! -e "$MNIST_DIR/train-images-idx3-ubyte.gz" ]; then
  echo "no MNIST at $MNIST_DIR — writing synthetic IDX files"
  python - "$MNIST_DIR" <<'EOF'
import sys
from tests.synthetic import make_mnist
make_mnist(sys.argv[1], n_train=512, n_test=128)
EOF
fi

python -m tensorflow_yolo2_tpu.entries.train_classifier \
  --preprocessing-name lenet \
  --model-name lenet --dataset-name mnist --data-path "$MNIST_DIR" \
  --iters 200 --batch-size 32 --optimizer sgd --learning-rate 0.01 \
  --compute-dtype float32 --num-workers 2

python -m tensorflow_yolo2_tpu.entries.eval_classifier \
  --preprocessing-name lenet \
  --model-name lenet --dataset-name mnist --data-path "$MNIST_DIR" \
  --dataset-split-name test --max-batches 4 --compute-dtype float32
