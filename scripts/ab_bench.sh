#!/bin/bash
# Paired interleaved A/B bench of two tree versions over a query list —
# the round-9 protocol (interleaved same-session pairs so "host band"
# stops absorbing consecutive bench drifts unexamined), generalized in
# round 11 to arbitrary git refs.
#
# usage: ab_bench.sh [OUT] [A_REF] [B_REF]
#   OUT    output dir (default /tmp/ab)
#   A_REF  git ref for side "a" (default a309cc9, the round-8 freeze);
#          "." means the current tree
#   B_REF  git ref for side "b" (default ".")
#   QUERIES env var overrides the query list (bare qNN prefixes:
#          Bench matches wanted(n.takeWhile(_ != '_'))). Default: the
#          ten biggest r9->r10 driver-bench movers (round-10 verdict
#          item 2).
#
# Protocol: 3 interleaved rounds of (a run, b run); each run is one
# Bench JVM timing the queries once (reps=1) at local[32] on sf0.1 —
# the driver-bench regime. min-of-3 per (version, query) is the
# comparison statistic, computed by scripts/ab_report.py over the
# captured stdout JSON.
set -e
cd "$(dirname "$0")/.."
QUERIES=${QUERIES:-"q165 q163 q169 q111 q151 q170 q107 q229 q209 q105"}
OUT=${1:-/tmp/ab}
A_REF=${2:-a309cc9}
B_REF=${3:-.}
mkdir -p "$OUT"

dir_for() { # ref -> working dir (a git worktree for non-"." refs)
  local ref=$1
  if [ "$ref" = "." ]; then echo "."; return; fi
  local wt="target/ab_$ref"
  if [ ! -d "$wt" ]; then git worktree add --detach "$wt" "$ref" >&2; fi
  echo "$wt"
}

A_DIR=$(dir_for "$A_REF")
B_DIR=$(dir_for "$B_REF")
echo "a=$A_REF ($A_DIR)  b=$B_REF ($B_DIR)  queries: $QUERIES" >&2

for rep in 1 2 3; do
  for ver in a b; do
    dir=$A_DIR; [ "$ver" = b ] && dir=$B_DIR
    echo "=== rep $rep $ver ===" >&2
    # extraction tolerates sbt's "[info] " prefix (pre-r11 trees) and
    # the r11 unprefixed StdoutOutput; the queries-map line is the one
    # ab_report.py reads
    (cd "$dir" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_REPS=1 sbt -batch "runMain graft.Bench $QUERIES" 2>/dev/null) \
      | grep -o '{"metric".*}' | grep '"queries"' | head -1 > "$OUT/${ver}_${rep}.json"
  done
done
echo "done -> $OUT"
