#!/usr/bin/env python3
"""Fold N Bench leg files into one noise-proof figure: per-query MIN.

Usage: legmin.py bench_sfX_leg1.json bench_sfX_leg2.json ...
Prints one JSON line in Bench's own schema (metric/value/unit/queries/
sf), where queries[q] = min over legs (ignoring nulls; null only if every
leg failed the query) and value = sum of the per-query minima. Single
legs swing +-20% under host noise (SCALE.md "Host-noise addendum"); the
min across independent legs is the steady-state number the round's
committed evidence needs (round-13 verdict, next-round task 1).
"""
import json
import sys

legs = []
for path in sys.argv[1:]:
    found = False
    with open(path) as f:
        for line in f:
            line = line.strip()
            if '"queries"' in line:
                legs.append(json.loads(line))
                found = True
                break
    if not found:
        # Loud, not silent: a 0-byte/parse-less leg means the Bench run
        # crashed; folding fewer legs than the protocol claims is how an
        # empty leg file masqueraded as evidence at round-14 HEAD.
        sys.exit(f"legmin: leg file {path} has no queries line "
                 f"(crashed Bench run?) — refusing to fold")
if not legs:
    sys.exit("legmin: no leg files with a queries line")
print(f"legmin: folding {len(legs)}/{len(sys.argv) - 1} legs",
      file=sys.stderr)

names = sorted({q for leg in legs for q in leg["queries"]})
mins = {}
for q in names:
    vals = [leg["queries"].get(q) for leg in legs]
    vals = [v for v in vals if v is not None]
    mins[q] = min(vals) if vals else None

total = sum(v for v in mins.values() if v is not None)
out = {
    "metric": legs[0].get("metric", "bench_total"),
    "value": round(total, 3),
    "unit": legs[0].get("unit", "sec"),
    "queries": mins,
    "sf": legs[0].get("sf"),
    "legs": len(legs),
}
print(json.dumps(out))
