#!/usr/bin/env bash
# DEV-ONLY bench window qualification (see tools/check_anchors.py):
# times the pinned compute-bound anchor set in a fresh session, then
# gates on each anchor landing within 15% of its committed reference.
# Usage: tools/qualify_window.sh [sfDir]
set -euo pipefail
cd "$(dirname "$0")/.."
SFDIR="${1:-/root/testdata/sf0.1}"
OUT="${ANCHOR_OUT:-/tmp/anchor_out.json}"
# Remove any previous output FIRST: a failed bench run must fail the
# gate, not be judged on a stale file (r15 advisor note — the old
# `|| true` + fixed path could print WINDOW QUALIFIED from old data).
rm -f "$OUT"
SPARK_GRAFT_ONLY="a9_pq_adc,a9c_ivfadc,a9b_pq_trained,a4b_ivf_train_iters,c10_weighted_sample,a6_ann_quantized" \
SPARK_GRAFT_SF_DIR="$SFDIR" \
SPARK_GRAFT_BENCH_OUT="$OUT" \
sbt -batch "runMain graft.Bench" >/dev/null 2>&1 || {
  echo "bench run failed — window cannot be judged" >&2
  exit 1
}
python3 tools/check_anchors.py "$OUT"
