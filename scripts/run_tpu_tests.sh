#!/bin/bash
# Run the @tpu-marked tests (compiled Pallas kernels) on the real chip.
# Keeps the ambient axon backend (TFY2_TEST_TPU=1 disables the conftest
# CPU forcing). TPU jobs must run serially — do not run concurrently
# with other TPU work.
cd "$(dirname "$0")/.."
TFY2_TEST_TPU=1 exec python -m pytest tests -m tpu -p no:cacheprovider "$@"
