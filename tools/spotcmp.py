#!/usr/bin/env python3
"""Reconcile in-suite folded numbers with the fresh-JVM spot pass.

Usage: spotcmp.py bench/bench_sf1.json bench/bench_sf1_spot.json

For every query in the spot file, prints the folded in-suite min, the
fresh-JVM spot value, and the ratio suite/spot — the systematic
in-suite distortion the multi-leg min cannot see (ratio ~1 = clean;
>>1 = the suite row is interference, cite the spot value as
steady-state).
"""
import json
import sys

suite = json.load(open(sys.argv[1]))["queries"]
spot = json.load(open(sys.argv[2]))["queries"]
print(f"{'query':<45} {'suite':>8} {'spot':>8} {'ratio':>6}")
for k in sorted(spot, key=lambda k: -(spot[k] or 0)):
    a, b = suite.get(k), spot.get(k)
    if a is None or b is None or b == 0:
        print(f"{k:<45} {a or '-':>8} {b or '-':>8}      -")
        continue
    print(f"{k:<45} {a:8.2f} {b:8.2f} {a/b:6.2f}")
