#!/usr/bin/env python3
"""Attribute in-suite bench time to JVM-level causes.

Joins a diag leg's two artifacts (tools/diag_codecache.sh):
  <prefix>_stderr.log    — Bench's untimed per-query end markers
                           "[bench] t <epoch-ms> <name> <sec>"
  <prefix>_telemetry.log — 15 s samples: "=== <epoch-s> <hh:mm:ss>",
                           jcmd Compiler.codecache, jstat -gcutil,
                           jstat -compiler
and prints, for every timed-pass query window longer than --min-sec,
the window's wall time, Bench's measured query time, and the deltas of
cumulative GC time (gcutil GCT), full-GC time (FGCT), JIT compile time
(jstat -compiler Time) and code-cache occupancy across the window —
i.e. how much of the wall clock the JVM itself ate while that query ran.

Usage: attr.py <prefix> [--min-sec N]
"""
import bisect
import re
import sys


def parse_markers(path):
    """[(epoch_sec, name, measured_sec)] for timed passes, in order."""
    out = []
    pat = re.compile(r"\[bench\] t (\d+) (\S+) ([0-9.]+)")
    with open(path, errors="replace") as f:
        for line in f:
            m = pat.search(line)
            if m:
                out.append((int(m.group(1)) / 1000.0, m.group(2),
                            float(m.group(3))))
    return out


def parse_telemetry(path):
    """[(epoch_sec, dict)] — dict has gct, fgct, ygct, cgct, fgc,
    compile_sec, compiled, cc_used_kb, cc_full_count, old_pct."""
    samples = []
    cur_t = None
    cur = {}
    cc_used = 0
    with open(path, errors="replace") as f:
        for line in f:
            line = line.rstrip("\n")
            m = re.match(r"=== (\d+) ", line)
            if m:
                if cur_t is not None and cur:
                    cur["cc_used_kb"] = cc_used
                    samples.append((cur_t, cur))
                cur_t, cur, cc_used = int(m.group(1)), {}, 0
                continue
            m = re.match(r"CodeHeap '[^']+': size=\d+Kb used=(\d+)Kb", line)
            if m:
                cc_used += int(m.group(1))
                continue
            m = re.match(r" full_count=(\d+)", line)
            if m:
                cur["cc_full_count"] = int(m.group(1))
                continue
            cols = line.split()
            # gcutil: S0 S1 E O M CCS YGC YGCT FGC FGCT CGC CGCT GCT
            if len(cols) == 13 and re.match(r"^[0-9.]+$", cols[0] or "-") \
                    and "." in cols[-1]:
                try:
                    cur["old_pct"] = float(cols[3])
                    cur["ygct"] = float(cols[7])
                    cur["fgc"] = int(cols[8])
                    cur["fgct"] = float(cols[9])
                    cur["cgct"] = float(cols[11])
                    cur["gct"] = float(cols[12])
                    continue
                except ValueError:
                    pass
            # compiler: Compiled Failed Invalid Time FailedType FailedMethod
            if len(cols) >= 4 and cols[0].isdigit() and cols[1].isdigit() \
                    and "gct" in cur:
                try:
                    cur["compiled"] = int(cols[0])
                    cur["compile_sec"] = float(cols[3])
                except ValueError:
                    pass
    if cur_t is not None and cur:
        cur["cc_used_kb"] = cc_used
        samples.append((cur_t, cur))
    return samples


def value_at(samples, times, t, key):
    """Linear interpolation of cumulative counter `key` at epoch t."""
    i = bisect.bisect_left(times, t)
    if i == 0:
        return samples[0][1].get(key)
    if i >= len(samples):
        return samples[-1][1].get(key)
    (t0, d0), (t1, d1) = samples[i - 1], samples[i]
    v0, v1 = d0.get(key), d1.get(key)
    if v0 is None or v1 is None or t1 == t0:
        return v1 if v1 is not None else v0
    return v0 + (v1 - v0) * (t - t0) / (t1 - t0)


def main():
    prefix = sys.argv[1]
    min_sec = 10.0
    if "--min-sec" in sys.argv:
        min_sec = float(sys.argv[sys.argv.index("--min-sec") + 1])
    markers = parse_markers(prefix + "_stderr.log")
    samples = parse_telemetry(prefix + "_telemetry.log")
    if not markers or not samples:
        sys.exit(f"no markers ({len(markers)}) or samples ({len(samples)})")
    times = [t for t, _ in samples]
    print(f"{'query':<42} {'wall':>7} {'meas':>7} {'dGC':>6} {'dFGC':>6} "
          f"{'dJIT':>6} {'gc%':>5} {'ccKb':>8} {'old%':>5}")
    rows = []
    for k, (t_end, name, meas) in enumerate(markers):
        t_start = markers[k - 1][0] if k else samples[0][0]
        wall = t_end - t_start
        if meas < min_sec:
            continue
        d = {}
        for key in ("gct", "fgct", "compile_sec"):
            a = value_at(samples, times, t_start, key)
            b = value_at(samples, times, t_end, key)
            d[key] = (b - a) if a is not None and b is not None else None
        cc = value_at(samples, times, t_end, "cc_used_kb")
        old = value_at(samples, times, t_end, "old_pct")
        rows.append((name, wall, meas, d["gct"], d["fgct"],
                     d["compile_sec"], cc, old))
    rows.sort(key=lambda r: -r[2])
    for name, wall, meas, gct, fgct, jit, cc, old in rows:
        gcpct = f"{100*gct/wall:5.1f}" if gct is not None and wall > 0 else "    -"
        fmt = lambda v: f"{v:6.1f}" if v is not None else "     -"
        print(f"{name:<42} {wall:7.1f} {meas:7.1f} {fmt(gct)} {fmt(fgct)} "
              f"{fmt(jit)} {gcpct} {cc or 0:8.0f} {old if old is not None else -1:5.1f}")


if __name__ == "__main__":
    main()
