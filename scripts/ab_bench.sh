#!/bin/bash
# Paired A/B bench of the round-8 freeze (git worktree at target/r8ab,
# commit a309cc9) against the current tree, over the ten queries whose
# driver-bench times moved most between BENCH_r08 and BENCH_r09 — the
# round-9 verdict (item 3) asked for interleaved same-session pairs so
# "host band" stops absorbing consecutive +6% totals unexamined.
#
# Protocol: 3 interleaved rounds of (r8 run, current run); each run is
# one Bench JVM timing the ten queries once (reps=1) at local[32] on
# sf0.1 — the driver-bench regime. min-of-3 per (version, query) is
# the comparison statistic, computed by scripts/ab_report.py over the
# captured stdout JSON.
set -e
cd "$(dirname "$0")/.."
# bare qNN prefixes: Bench matches wanted(n.takeWhile(_ != '_'))
QUERIES="q117 q170 q119 q03 q166 q163 q174 q214 q248 q238"
OUT=${1:-/tmp/ab}
mkdir -p "$OUT"
for rep in 1 2 3; do
  for ver in r8 cur; do
    dir=.
    [ "$ver" = r8 ] && dir=target/r8ab
    echo "=== rep $rep $ver ===" >&2
    (cd "$dir" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_REPS=1 sbt -batch "runMain graft.Bench $QUERIES" 2>/dev/null) \
      | sed -n 's/^\[info\] \({"metric".*}\)$/\1/p' | head -1 > "$OUT/${ver}_${rep}.json"
  done
done
echo "done -> $OUT"
