#!/bin/bash
# Round-15 bench campaign (verdict task 1: attribute the in-suite sf1
# interference; task "commit the adjudicating evidence").
#
# Order puts the adjudicating sf1 evidence before the optional sf0.3
# point so a wall-clock overrun still leaves the round's question
# answered. Both sf1 legs run through tools/diag_codecache.sh at the
# sweep's own 1g code-cache flag, capturing 15 s jcmd/jstat telemetry
# plus Bench's per-query end markers (stderr) — if q238's in-suite row
# stays ~4x its isolated time at 1g, the code-cache hypothesis is dead
# and the telemetry window around q238 names the real mechanism; if the
# row collapses to ~1x, the 512m flag r13/r14 legs used was the cause.
#
# Run detached (nohup setsid) on an otherwise quiet machine:
#   nohup setsid bash tools/r15_campaign.sh > /tmp/r15_campaign.log 2>&1 &
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
echo "[r15] wipe scratch $(date +%H:%M:%S)"
rm -rf /tmp/graft_*

echo "[r15] stage 1: sf0.01 sweep (2 legs + spot) $(date +%H:%M:%S)"
SFS="0.01" bash tools/sweep.sh

echo "[r15] stage 2: sf0.1 sweep (2 legs + spot) $(date +%H:%M:%S)"
SFS="0.1" bash tools/sweep.sh

echo "[r15] stage 3: sf1 legs with telemetry $(date +%H:%M:%S)"
bash tools/diag_codecache.sh /root/repo/testdata/sf1 1g bench/diag_sf1_leg1
cp bench/diag_sf1_leg1_bench.json bench/bench_sf1_leg1.json
bash tools/diag_codecache.sh /root/repo/testdata/sf1 1g bench/diag_sf1_leg2
cp bench/diag_sf1_leg2_bench.json bench/bench_sf1_leg2.json
python3 tools/legmin.py bench/bench_sf1_leg1.json bench/bench_sf1_leg2.json \
  > bench/bench_sf1.json
spot=$(python3 -c "
import json
d = json.load(open('bench/bench_sf1.json'))
qs = {k: v for k, v in d['queries'].items() if v is not None}
print(','.join(sorted(qs, key=qs.get, reverse=True)[:10]))")
echo "[r15] sf1 spot (fresh JVM): $spot"
SPARK_GRAFT_ONLY=$spot SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
  SPARK_GRAFT_CPUS=32 \
  java -Xmx48g -XX:ReservedCodeCacheSize=1g -cp "$CP" graft.Bench \
  2>/dev/null | grep '"queries"' | head -1 > bench/bench_sf1_spot.json
[ -s bench/bench_sf1_spot.json ] || { echo "[r15] sf1 spot FAILED"; exit 1; }

echo "[r15] stage 4: sf0.3 sweep (2 legs + spot) $(date +%H:%M:%S)"
SFS="0.3" bash tools/sweep.sh

echo "[r15] stage 5: sf0.3 spot of round-15-touched gates $(date +%H:%M:%S)"
SPARK_GRAFT_ONLY=q122_schema_evolution,q249_codes_artifact_compaction,q284_exactsubstr_incremental,q295_audio_decode \
  SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf0.3 SPARK_GRAFT_CPUS=32 \
  java -Xmx48g -XX:ReservedCodeCacheSize=1g -cp "$CP" graft.Bench \
  2>/dev/null | grep '"queries"' | head -1 > bench/bench_sf0.3_touched_spot.json

python3 tools/slopes.py bench/bench_sf0.01.json bench/bench_sf0.1.json \
  bench/bench_sf0.3.json bench/bench_sf1.json > /tmp/slopes_r15.md
echo "[r15] ALL DONE $(date +%H:%M:%S)"
