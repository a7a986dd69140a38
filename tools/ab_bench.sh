#!/usr/bin/env bash
# Same-window A/B bench: separates CODE drift from HOST drift.
#
# The problem this solves (round 11): BENCH_r{N}.json totals from different
# rounds run on different host conditions — round-10's 108.6s vs round-11's
# 115-131s turned out to be ~100% host drift, provable only by rebuilding the
# old commit and running BOTH suites interleaved in the same wall-clock
# window. This script makes that a one-liner.
#
# Usage:  tools/ab_bench.sh <baseline-ref> [rounds=3] [out=BENCH_AB.json]
# Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
#         SPARK_GRAFT_CPUS   (default 32)
#
# Method: the baseline ref is checked out into a detached git worktree under
# /tmp and compiled once (compile time stays out of the measurement window).
# Then `rounds` interleaved pairs run — current, baseline, current, baseline,
# … — each a fresh single-fork `graft.Bench` JVM writing only its samples
# sidecar (BENCH_LOCAL is disabled on both sides). Per-query MIN across a
# side's rounds is that side's statistic (same estimator as the committed
# bench record: min across fresh isolated runs is the low-noise-floor
# statistic; medians lose to 2/5 contended forks). The report writes
# per-query cur/base/ratio plus the median ratio — the number that says
# "code drift" (ratio far from 1 on many queries) vs "host drift" (totals
# moved, median per-query ratio ~1).
set -euo pipefail

REF=${1:?usage: tools/ab_bench.sh <baseline-ref> [rounds] [out]}
ROUNDS=${2:-3}
OUT=${3:-BENCH_AB.json}
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
CPUS=${SPARK_GRAFT_CPUS:-32}

REPO=$(git rev-parse --show-toplevel)
BASE_SHA=$(git -C "$REPO" rev-parse --short "$REF")
CUR_SHA=$(git -C "$REPO" rev-parse --short HEAD)
WT=/tmp/graft_ab_wt_$BASE_SHA

if [ ! -d "$WT" ]; then
  git -C "$REPO" worktree add --detach "$WT" "$BASE_SHA"
fi

echo "[ab] compiling baseline $BASE_SHA in $WT"
(cd "$WT" && sbt -batch compile > /tmp/graft_ab_compile_base.log 2>&1)
echo "[ab] compiling current $CUR_SHA in $REPO"
(cd "$REPO" && sbt -batch compile > /tmp/graft_ab_compile_cur.log 2>&1)

run_side() { # side(cur|base) round dir
  local side=$1 i=$2 dir=$3
  echo "[ab] round $i/$ROUNDS $side ($(date +%H:%M:%S))"
  (cd "$dir" && \
    SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_BENCH_SAMPLES="/tmp/graft_ab_${side}_${i}.json" \
    SPARK_GRAFT_BENCH_LOCAL="" \
    sbt -batch "runMain graft.Bench" > "/tmp/graft_ab_${side}_${i}.log" 2>&1)
}

for i in $(seq 1 "$ROUNDS"); do
  run_side cur  "$i" "$REPO"
  run_side base "$i" "$WT"
done

python3 "$REPO/tools/ab_bench_report.py" \
  "$CUR_SHA" "$BASE_SHA" "$ROUNDS" "$SF" "$REPO/$OUT"
echo "[ab] wrote $REPO/$OUT (worktree kept at $WT; remove with:"
echo "      git worktree remove --force $WT)"
