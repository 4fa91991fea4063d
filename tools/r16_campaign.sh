#!/bin/bash
# Round-16 measurement campaign.
#
# Stage 1 (round-15 verdict task 8): INTERLEAVED base/new sf0.1 legs —
# A(base r15 classes) / B(new) / A / B in one session, so same-code
# drift bounds every cross-variant delta by construction. Folds are
# per-query MIN across each variant's legs (tools/legmin.py).
#
# Stages 2-4 (round-15 verdict task 1): regenerate the scaled dirs,
# run the sf1 legs through diag_codecache.sh (15 s jcmd/jstat telemetry
# + Bench's per-query end markers) to attribute the in-suite q238
# interference, then reconcile with a fresh-JVM isolated spot of the
# slowest gates + q238.
#
# Stage 5: sf0.3 2-leg sweep (tools/sweep.sh protocol).
#
# Run detached on an otherwise quiet machine:
#   nohup setsid bash tools/r16_campaign.sh > /tmp/r16_campaign.log 2>&1 &
set -e
cd /root/repo
CPB="/root/classes_r16_base:/opt/spark/jars/*"
CPN="target/scala-2.13/classes:/opt/spark/jars/*"
JF="-Xmx48g -XX:ReservedCodeCacheSize=1g"
mkdir -p bench/r16

echo "[r16] stage 1: interleaved A/B/A/B sf0.1 legs $(date +%H:%M:%S)"
for leg in 1 2; do
  for v in base new; do
    if [ "$v" = base ]; then cp="$CPB"; else cp="$CPN"; fi
    out="bench/r16/sf0.1_${v}_leg${leg}.json"
    echo "[r16] sf0.1 $v leg$leg $(date +%H:%M:%S)"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      java $JF -cp "$cp" graft.Bench \
      2> "bench/r16/sf0.1_${v}_leg${leg}_stderr.log" \
      | grep '"queries"' | head -1 > "$out"
    [ -s "$out" ] || { echo "[r16] LEG FAILED: empty $out"; exit 1; }
  done
done
python3 tools/legmin.py bench/r16/sf0.1_base_leg*.json \
  > bench/r16/sf0.1_base.json
python3 tools/legmin.py bench/r16/sf0.1_new_leg*.json \
  > bench/r16/sf0.1_new.json

echo "[r16] stage 2: ScaleGen sf0.3 + sf1 $(date +%H:%M:%S)"
rm -rf /root/repo/testdata/sf0.3 /root/repo/testdata/sf1
java $JF -cp "$CPN" graft.ScaleGen /root/testdata/sf0.1 \
  /root/repo/testdata/sf0.3 3 > /dev/null 2>&1
java $JF -cp "$CPN" graft.ScaleGen /root/testdata/sf0.1 \
  /root/repo/testdata/sf1 10 > /dev/null 2>&1

echo "[r16] stage 3: sf1 telemetry legs $(date +%H:%M:%S)"
bash tools/diag_codecache.sh /root/repo/testdata/sf1 1g bench/diag_r16_sf1_leg1
cp bench/diag_r16_sf1_leg1_bench.json bench/bench_sf1_leg1.json
bash tools/diag_codecache.sh /root/repo/testdata/sf1 1g bench/diag_r16_sf1_leg2
cp bench/diag_r16_sf1_leg2_bench.json bench/bench_sf1_leg2.json
python3 tools/legmin.py bench/bench_sf1_leg1.json bench/bench_sf1_leg2.json \
  > bench/bench_sf1.json

echo "[r16] stage 4: sf1 isolated spot (slowest 10 + q238) $(date +%H:%M:%S)"
spot=$(python3 -c "
import json
d = json.load(open('bench/bench_sf1.json'))
qs = {k: v for k, v in d['queries'].items() if v is not None}
top = sorted(qs, key=qs.get, reverse=True)[:10]
if 'q238_split_leakage_audit' not in top: top.append('q238_split_leakage_audit')
print(','.join(top))")
echo "[r16] sf1 spot: $spot"
SPARK_GRAFT_ONLY=$spot SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
  SPARK_GRAFT_CPUS=32 java $JF -cp "$CPN" graft.Bench \
  2>/dev/null | grep '"queries"' | head -1 > bench/bench_sf1_spot.json
[ -s bench/bench_sf1_spot.json ] || { echo "[r16] sf1 spot FAILED"; exit 1; }

echo "[r16] stage 5: sf0.3 sweep (2 legs + spot) $(date +%H:%M:%S)"
SFS="0.3" bash tools/sweep.sh

echo "[r16] ALL DONE $(date +%H:%M:%S)"
