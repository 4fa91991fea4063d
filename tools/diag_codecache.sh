#!/bin/bash
# Code-cache/GC attribution run (round-15 verdict task 1): one full
# Bench leg at the given SF and ReservedCodeCacheSize, with periodic
# JVM telemetry — `jcmd Compiler.codecache` (occupancy + whether the
# compiler got disabled) and `jstat -gcutil` (old-gen/GC pressure) —
# plus `jstat -compiler` (cumulative JIT compile count/time), sampled
# every 15 s. Bench emits untimed per-query end markers on stderr
# ("[bench] t <epoch-ms> <name> <sec>", kept in <outprefix>_stderr.log)
# so each sample window maps to the query that was running. This
# measures the in-suite interference
# hypothesis (q238: 137-145 s in both round-14 sf1 legs vs 35.0 s
# isolated) instead of guessing it.
#
# Usage: diag_codecache.sh <sfdir> <codecache-size> <outprefix>
# Outputs: <outprefix>_bench.json   (Bench's per-query line)
#          <outprefix>_telemetry.log (15 s codecache + gcutil + compiler samples)
#          <outprefix>_stderr.log    (JVM warnings, e.g. "CodeCache is full")
set -e
cd /root/repo
dir=$1; cc=$2; pre=$3
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 \
  java -Xmx48g -XX:ReservedCodeCacheSize=$cc -cp "$CP" graft.Bench \
  > "${pre}_bench_raw.log" 2> "${pre}_stderr.log" &
pid=$!
echo "[diag] bench pid=$pid sf=$dir codecache=$cc"
: > "${pre}_telemetry.log"
while kill -0 "$pid" 2>/dev/null; do
  {
    echo "=== $(date +%s) $(date +%H:%M:%S)"
    jcmd "$pid" Compiler.codecache 2>/dev/null || true
    jstat -gcutil "$pid" 2>/dev/null | tail -1 || true
    jstat -compiler "$pid" 2>/dev/null | tail -1 || true
  } >> "${pre}_telemetry.log"
  sleep 15
done
wait "$pid" || true
grep '"queries"' "${pre}_bench_raw.log" | head -1 > "${pre}_bench.json"
[ -s "${pre}_bench.json" ] || { echo "[diag] bench produced no JSON"; exit 1; }
echo "[diag] done; codecache-full warnings:"
grep -c "CodeCache is full" "${pre}_stderr.log" || true
