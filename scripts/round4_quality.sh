#!/usr/bin/env bash
# Round-4 quality program (VERDICT r3 items 2+3): run BOTH head curves to
# saturation on the shared hard fixture + pretrain, then measure
# YOLO9000 multiscale training against the fixed-resolution baseline.
#
# All runs share ONE pretrain snapshot and ONE fixture (the v1 run
# generates both; later runs warm-start via the auto-discovered ImageNet
# snapshot with --pretrain-iters 0), so curves differ only in the head.
# TPU jobs are serial (single-tenant tunnel) — this script runs them
# sequentially. Expect several hours cold (224^2 train-step compiles are
# remote and slow; the persistent compile cache makes stages 2+ fast).
#
# Usage: bash scripts/round4_quality.sh [ROOT=/tmp/q4]
set -euo pipefail
ROOT="${1:-/tmp/q4}"
MSROOT="${ROOT}_ms"
STAGES="${STAGES:-600,1200,2400,4800,9600}"
MS_STAGES="${MS_STAGES:-600,1200,2400}"
cd "$(dirname "$0")/.."

run() { echo "==== $* ===="; "$@"; }

export TFY2_ROOT="$ROOT"
# one shared compile cache across all roots (the _ms/_fix stages would
# otherwise each pay fresh remote compiles under their own TFY2_ROOT)
export TFY2_COMPILE_CACHE="${TFY2_COMPILE_CACHE:-$ROOT/jax_cache}"
mkdir -p "$ROOT"

# ---- v1 curve (generates fixture + pretrain on first run) ----
run python benchmarks/quality_curve.py \
    --stages "$STAGES" --n-train 256 --n-val 64 \
    --pretrain-iters 1500 --bn-momentum 0.9 \
    2>&1 | tee "$ROOT/curve_v1.log"

# ---- v2 + stabilizers + dimension clusters, same pretrain ----
run python benchmarks/quality_curve.py \
    --stages "$STAGES" --n-train 256 --n-val 64 \
    --pretrain-iters 0 --bn-momentum 0.9 \
    --v2 --anchors kmeans \
    2>&1 | tee "$ROOT/curve_v2_kmeans.log"

# ---- multiscale vs the fixed-224 v2 curve above ----
# fresh root, SAME fixture + pretrain (copied), so the only delta vs the
# v2 curve is --multiscale; also evaluates at off-train serving sizes
mkdir -p "$MSROOT/ckpts/darknet19" "$MSROOT"/data
cp -r "$ROOT/data/VOCdevkit" "$MSROOT/data/" 2>/dev/null || true
cp -r "$ROOT/data/ILSVRC" "$MSROOT/data/" 2>/dev/null || true
cp -r "$ROOT/cache" "$MSROOT/" 2>/dev/null || true
cp -r "$ROOT/ckpts/darknet19/ilsvrc_2017_cls" \
      "$MSROOT/ckpts/darknet19/" 2>/dev/null || true
export TFY2_ROOT="$MSROOT"
run python benchmarks/quality_curve.py \
    --stages "$MS_STAGES" --n-train 256 --n-val 64 \
    --pretrain-iters 0 --bn-momentum 0.9 \
    --v2 --anchors kmeans \
    --multiscale 192,224,288 --eval-sizes 160,192,224,288,320 \
    2>&1 | tee "$MSROOT/curve_v2_multiscale.log"

# the fixed-224 comparison point at the same serving sizes — its own
# root (re-running in $ROOT would RESUME from the 9600-iter snapshots)
FIXROOT="${ROOT}_fix"
mkdir -p "$FIXROOT/ckpts/darknet19" "$FIXROOT"/data
cp -r "$ROOT/data/VOCdevkit" "$FIXROOT/data/" 2>/dev/null || true
cp -r "$ROOT/data/ILSVRC" "$FIXROOT/data/" 2>/dev/null || true
cp -r "$ROOT/cache" "$FIXROOT/" 2>/dev/null || true
cp -r "$ROOT/ckpts/darknet19/ilsvrc_2017_cls" \
      "$FIXROOT/ckpts/darknet19/" 2>/dev/null || true
export TFY2_ROOT="$FIXROOT"
run python benchmarks/quality_curve.py \
    --stages "$MS_STAGES" --n-train 256 --n-val 64 \
    --pretrain-iters 0 --bn-momentum 0.9 \
    --v2 --anchors kmeans \
    --eval-sizes 160,192,224,288,320 \
    2>&1 | tee "$FIXROOT/curve_v2_fixed224.log"

echo "==== DONE: logs in $ROOT, $MSROOT, $FIXROOT ===="
