#!/bin/bash
# Multi-leg 4-point scale sweep (round-13 verdict, next-round task 1):
# LEGS (default 2) independent Bench runs per SF. Raw evidence lands in
# bench/bench_sf<SF>_leg<k>.json; bench/bench_sf<SF>.json becomes the
# per-query MIN across legs (tools/legmin.py) — the file slopes.py and
# the round-over-round comparisons read. Single contiguous legs swing
# +-20% under host noise (SCALE.md), which made committed sf1 totals
# unadjudicable; the per-query min across independent legs is the
# steady-state figure. Bench itself already takes the min of 2 timed
# passes per leg, so each committed number is min over 2*LEGS passes.
# Run inside tmux with the machine otherwise quiet.
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
LEGS=${LEGS:-2}
for sf in 0.01 0.1 0.3 1; do
  case $sf in
    0.01|0.1) dir=/root/testdata/sf$sf ;;
    *)        dir=/root/repo/testdata/sf$sf ;;
  esac
  for leg in $(seq 1 "$LEGS"); do
    echo "[sweep] sf=$sf leg=$leg dir=$dir $(date +%H:%M:%S)"
    SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 \
      java -Xmx48g -XX:ReservedCodeCacheSize=512m -cp "$CP" graft.Bench \
      2>/dev/null | grep '"queries"' | head -1 \
      > "bench/bench_sf${sf}_leg${leg}.json"
  done
  python3 tools/legmin.py bench/bench_sf${sf}_leg*.json \
    > "bench/bench_sf$sf.json"
done
echo "[sweep] done $(date +%H:%M:%S)"
python3 tools/slopes.py bench/bench_sf0.01.json bench/bench_sf0.1.json \
  bench/bench_sf0.3.json bench/bench_sf1.json > /tmp/slopes.md
echo "[sweep] slopes written to /tmp/slopes.md"
