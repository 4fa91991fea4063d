#!/bin/bash
# 4-point scale sweep: full Bench at each SF, saving the full per-query
# JSON line to bench/bench_sf<SF>.json (the file slopes.py reads).
# Run inside tmux with the machine otherwise quiet — Bench takes the
# per-query MIN of 2 passes, so background load skews the numbers.
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
for sf in 0.01 0.1 0.3 1; do
  case $sf in
    0.01|0.1) dir=/root/testdata/sf$sf ;;
    *)        dir=/root/repo/testdata/sf$sf ;;
  esac
  echo "[sweep] sf=$sf dir=$dir $(date +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 \
    java -Xmx48g -XX:ReservedCodeCacheSize=512m -cp "$CP" graft.Bench \
    2>/dev/null | grep '"queries"' | head -1 > bench/bench_sf$sf.json
done
echo "[sweep] done $(date +%H:%M:%S)"
python3 tools/slopes.py bench/bench_sf0.01.json bench/bench_sf0.1.json \
  bench/bench_sf0.3.json bench/bench_sf1.json > /tmp/slopes_r6.md
echo "[sweep] slopes written to /tmp/slopes_r6.md"
