#!/bin/bash
# Remainder of the round-14 sweep, big-SF-first: sf1's two legs are the
# evidence the verdict adjudicates (q235/q238/q265 noise-vs-regression),
# so they run before sf0.3. bench_sf<SF>.json is re-folded after EVERY
# leg, so a wall-clock cutoff still leaves internally consistent
# per-query-min files for whatever legs completed.
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
run_leg() {
  sf=$1; leg=$2; dir=$3
  echo "[sweep] sf=$sf leg=$leg dir=$dir $(date +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 \
    java -Xmx48g -XX:ReservedCodeCacheSize=512m -cp "$CP" graft.Bench \
    2>/dev/null | grep '"queries"' | head -1 \
    > "bench/bench_sf${sf}_leg${leg}.json"
  python3 tools/legmin.py bench/bench_sf${sf}_leg*.json \
    > "bench/bench_sf$sf.json"
}
run_leg 1 1 /root/repo/testdata/sf1
run_leg 1 2 /root/repo/testdata/sf1
run_leg 0.3 1 /root/repo/testdata/sf0.3
run_leg 0.3 2 /root/repo/testdata/sf0.3
echo "[sweep] done $(date +%H:%M:%S)"
python3 tools/slopes.py bench/bench_sf0.01.json bench/bench_sf0.1.json \
  bench/bench_sf0.3.json bench/bench_sf1.json > /tmp/slopes.md
echo "[sweep] slopes written to /tmp/slopes.md"
