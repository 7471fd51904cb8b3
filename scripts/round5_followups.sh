#!/usr/bin/env bash
# Round-5 follow-ups, run AFTER scripts/round5_quality.sh completes:
#
# 1. int8 accuracy refresh on the saturated v2+PASSTHROUGH snapshot —
#    the reorg head gained int8 support this round (ops/quant
#    head="detector_v2p"), so the int8-costs-nothing claim can now be
#    checked on all three head layouts.
# 2. SINGLE-PROCESS v2 2400-iter run in a cloned root (same fixture,
#    same pretrain, same recipe) — diagnoses the chunked program's
#    v2 0.386@2400 against round 4's single-process 0.540@2400.
#    Burn-in step resume across chunks was verified correct (burnin_loss
#    is 0 right after a stage boundary past 12800 samples), so this
#    isolates process-chunking effects from plain run-to-run variance.
#
# Usage: bash scripts/round5_followups.sh [ROOT=/root/repo/_q5]
set -uo pipefail
ROOT="${1:-/root/repo/_q5}"
cd "$(dirname "$0")/.."

run() { echo "==== $(date +%H:%M:%S) $* ===="; "$@"; }

export TFY2_ROOT="$ROOT"
export TFY2_COMPILE_CACHE="${TFY2_COMPILE_CACHE:-$ROOT/jax_cache}"

run python benchmarks/int8_quality.py --v2 --passthrough \
    2>&1 | tee "$ROOT/int8_v2p.log"

RR="${ROOT}_rerun"
mkdir -p "$RR/ckpts/darknet19" "$RR/data"
cp -r "$ROOT/data/VOCdevkit" "$RR/data/" 2>/dev/null || true
cp -r "$ROOT/data/ILSVRC" "$RR/data/" 2>/dev/null || true
cp -r "$ROOT/cache" "$RR/" 2>/dev/null || true
cp -r "$ROOT/ckpts/darknet19/ilsvrc_2017_cls" \
      "$RR/ckpts/darknet19/" 2>/dev/null || true
TFY2_ROOT="$RR" run python benchmarks/quality_curve.py --stages 2400 \
    --n-train 1024 --n-val 128 --bn-momentum 0.9 --grad-clip 5 \
    --pretrain-iters 0 --v2 --anchors kmeans \
    2>&1 | tee "$RR/curve_v2_single.log"
