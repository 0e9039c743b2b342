#!/bin/bash
# Interleaved paired A/B for a noisy host: alternates BEFORE (stashed)
# and AFTER (working tree) states N times, timing the same key list
# with tools/ab_bench.py each round. Paired rounds bracket environment
# drift; compare per-key medians of the A and B columns.
# Usage: tools/ab_paired.sh N "key1 key2 ..." OUT_PREFIX
set -e
N=${1:-3}
KEYS=$2
OUT=${3:-/tmp/abp}
cd /root/repo
for i in $(seq 1 "$N"); do
  git stash >/dev/null
  SPARK_GRAFT_BENCH_RUNS=3 python tools/ab_bench.py $KEYS 2>/dev/null \
    | tail -1 > "${OUT}_before_$i.json"
  git stash pop >/dev/null
  SPARK_GRAFT_BENCH_RUNS=3 python tools/ab_bench.py $KEYS 2>/dev/null \
    | tail -1 > "${OUT}_after_$i.json"
  echo "round $i done"
done
