#!/bin/bash
# Live thread-level sampler for the q235-q238 in-suite window (round-15
# attribution): whenever the diag leg's stderr shows q234's timed end
# marker but not yet q238's (i.e. one of q235/q236/q237/q238 — the
# contiguous CPU-bound trio that inflates in pass 1 — is running),
# samples `top -H` (per-thread CPU), /proc/<pid>/io and loadavg every
# 20 s, plus up to three jstacks per window (~40 s apart).
# Distinguishes "threads busy on CPU but slow" (deopt/profile-state,
# memory locality) from "threads blocked" (I/O, lock, scheduler) — the
# split the jcmd/jstat telemetry cannot see.
#
# Usage: q238watch.sh <stderr-log> <outfile>
set -u
log=$1; out=$2
: > "$out"
js=0
iter=0
while true; do
  pid=$(ps -eo pid,args | grep 'graft\.Bench' | grep -v grep | awk '{print $1}' | head -1)
  t234=$(grep -c '\[bench\] t [0-9]* q234_beam_width_curve' "$log" 2>/dev/null | head -1)
  t238=$(grep -c '\[bench\] t [0-9]* q238_split_leakage_audit' "$log" 2>/dev/null | head -1)
  t234=${t234:-0}; t238=${t238:-0}
  if [ -z "$pid" ]; then
    [ "$t238" -ge 2 ] 2>/dev/null && break
    sleep 20; continue
  fi
  if [ "$t234" -gt "$t238" ] 2>/dev/null; then
    iter=$((iter + 1))
    {
      echo "=== $(date +%s) $(date +%H:%M:%S) window=$((t238 + 1)) iter=$iter"
      top -b -n 1 -H -p "$pid" 2>/dev/null | head -45
      echo "--- proc io"
      cat "/proc/$pid/io" 2>/dev/null
      echo "--- loadavg: $(cat /proc/loadavg)"
    } >> "$out"
    if [ $((iter % 2)) -eq 0 ] && [ "$js" -lt $((3 * (t238 + 1))) ]; then
      jstack "$pid" >> "${out%.log}_jstack_w$((t238 + 1))_$js.log" 2>/dev/null
      js=$((js + 1))
    fi
  else
    iter=0
    [ "$t238" -ge 2 ] 2>/dev/null && break
  fi
  sleep 20
done
echo "[q238watch] done $(date +%H:%M:%S)" >> "$out"
