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
#
# Round-15 additions (round-14 verdict task 1 + advice):
#  - every leg file is checked non-empty right after the run: under
#    set -e the `java | grep | head > file` pipeline takes head's exit
#    status, so a crashed Bench otherwise writes a 0-byte leg that
#    legmin would silently skip (exactly how the empty
#    bench_sf1_leg2.json got committed at round-14 HEAD).
#  - a FRESH-JVM spot-check pass per SF: the SPOT_N slowest gates from
#    the folded file are re-measured in a new JVM (SPARK_GRAFT_ONLY),
#    landing in bench_sf<SF>_spot.json. The per-query min across legs
#    removes independent noise but is blind to SYSTEMATIC in-suite
#    distortion both legs share (q238: 137-145 s in both sf1 legs vs
#    35.0 s isolated); the spot file is the steady-state reconciliation
#    committed next to the suite legs. SPOT_N=0 disables.
#
# Run inside tmux with the machine otherwise quiet.
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
LEGS=${LEGS:-2}
SPOT_N=${SPOT_N:-10}
# JVM flags shared by every leg and spot run; override via JFLAGS.
JFLAGS=${JFLAGS:--Xmx48g -XX:ReservedCodeCacheSize=1g}
SFS=${SFS:-0.01 0.1 0.3 1}
for sf in $SFS; do
  case $sf in
    0.01|0.1) dir=/root/testdata/sf$sf ;;
    *)        dir=/root/repo/testdata/sf$sf ;;
  esac
  for leg in $(seq 1 "$LEGS"); do
    out="bench/bench_sf${sf}_leg${leg}.json"
    echo "[sweep] sf=$sf leg=$leg dir=$dir $(date +%H:%M:%S)"
    SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 \
      java $JFLAGS -cp "$CP" graft.Bench \
      2>/dev/null | grep '"queries"' | head -1 > "$out"
    [ -s "$out" ] || { echo "[sweep] LEG FAILED: empty $out"; exit 1; }
  done
  python3 tools/legmin.py bench/bench_sf${sf}_leg*.json \
    > "bench/bench_sf$sf.json"
  if [ "$SPOT_N" -gt 0 ]; then
    spot=$(python3 -c "
import json, sys
d = json.load(open('bench/bench_sf$sf.json'))
qs = {k: v for k, v in d['queries'].items() if v is not None}
print(','.join(sorted(qs, key=qs.get, reverse=True)[:$SPOT_N]))")
    sout="bench/bench_sf${sf}_spot.json"
    echo "[sweep] sf=$sf spot-check ($SPOT_N slowest, fresh JVM): $spot"
    SPARK_GRAFT_ONLY=$spot SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 \
      java $JFLAGS -cp "$CP" graft.Bench \
      2>/dev/null | grep '"queries"' | head -1 > "$sout"
    [ -s "$sout" ] || { echo "[sweep] SPOT FAILED: empty $sout"; exit 1; }
  fi
done
echo "[sweep] done $(date +%H:%M:%S)"
python3 tools/slopes.py bench/bench_sf0.01.json bench/bench_sf0.1.json \
  bench/bench_sf0.3.json bench/bench_sf1.json > /tmp/slopes.md
echo "[sweep] slopes written to /tmp/slopes.md"
