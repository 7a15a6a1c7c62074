#!/bin/bash
# Guarded bootstrap-training loop for the packaged separator weights.
#
# Each attempt runs in a FRESH process (tunnel attach quality is bimodal per
# process); rc=3 means a degraded-attach bail-out, so retry. Never kill an
# attached process — every child exits on its own (--max-minutes budget).
# The packaged checkpoint is only replaced when the candidate evaluates
# strictly better across both synthetic families
# (scripts/eval_compare_separator.py).
#
# Usage: scripts/train_bootstrap_loop.sh [steps] [max_minutes] [attempts] \
#            [family] [extra train_separator.py flags...]
# e.g.   scripts/train_bootstrap_loop.sh 4000 45 4 convtdf --rich --resume packaged
set -u
STEPS=${1:-4000}
MAXMIN=${2:-45}
ATTEMPTS=${3:-4}
FAMILY=${4:-convtdf}
shift $(( $# > 4 ? 4 : $# )) || true
CAND=/tmp/${FAMILY}_candidate.msgpack
cd "$(dirname "$0")/.."

for i in $(seq 1 "$ATTEMPTS"); do
  echo "=== training attempt $i/$ATTEMPTS (family=$FAMILY) ==="
  python scripts/train_separator.py --bootstrap --family "$FAMILY" \
    --steps "$STEPS" --batch 4 \
    --checkpoint "$CAND" --max-minutes "$MAXMIN" \
    --probe-threshold-s 0.2 --warm-step-threshold-s 8 "$@"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "=== training attempt $i succeeded; evaluating candidate ==="
    python scripts/eval_compare_separator.py "$CAND" --family "$FAMILY"
    exit $?
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
