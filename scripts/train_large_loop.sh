#!/bin/bash
# Round-5 capacity-training loop (VERDICT r4 task #1): train the LARGE_GEOMETRY
# ConvTDF (ch32/d3, ~5 M params) from scratch on the rich families.
#
# Same attach discipline as train_bootstrap_loop.sh: every attempt is a FRESH
# process (tunnel attach quality is bimodal per process), rc=3 is a degraded-
# attach bail-out worth retrying, and no child is ever killed externally —
# each exits on its own --max-minutes budget. Promotion is NOT automatic here:
# the large candidate is scored by eval_compare_separator.py (sidecar-aware)
# and eval_models_diverse.py (OOD) in a separate step.
#
# Usage: scripts/train_large_loop.sh [steps] [max_minutes] [attempts] [out] \
#            [extra train_separator.py flags...]
set -u
STEPS=${1:-40000}
MAXMIN=${2:-150}
ATTEMPTS=${3:-4}
OUT=${4:-/tmp/convtdf_large_r5.msgpack}
shift $(( $# > 4 ? 4 : $# )) || true
cd "$(dirname "$0")/.."

for i in $(seq 1 "$ATTEMPTS"); do
  echo "=== large-geometry training attempt $i/$ATTEMPTS ==="
  python scripts/train_separator.py --large --rich \
    --steps "$STEPS" --batch 4 --datagen-threads 3 \
    --checkpoint "$OUT" --max-minutes "$MAXMIN" \
    --probe-threshold-s 0.2 --warm-step-threshold-s 8 "$@"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "=== attempt $i finished; candidate at $OUT ==="
    exit 0
  elif [ "$rc" -eq 3 ] || [ "$rc" -eq 4 ]; then
    echo "attempt $i drew a bad attach/budget (rc=$rc); retrying in a fresh process"
    sleep 30
  else
    echo "training failed with rc=$rc; aborting"
    exit "$rc"
  fi
done
echo "no healthy attach in $ATTEMPTS attempts"
exit 3
