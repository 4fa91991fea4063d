#!/usr/bin/env python3
"""Scale-slope report from bench JSONs at several scale factors.

Usage: python3 tools/slopes.py bench/bench_sf0.01.json bench/bench_sf0.1.json \
           bench/bench_sf0.3.json bench/bench_sf1.json

Reads the first line (the full per-query map) of each file, groups queries
into operator families, and prints a markdown table of per-family wall time
at each SF plus the log-log slope over the top decade
(sf0.1 -> sf1: slope = log10(t1/t0.1); 1.0 = linear, 2.0 = quadratic).
Queries that are fixed-cost demonstrations (streaming micro-batch
machinery, 1-row bridge/meta queries) still get rows — their slope ~0 is
the point.

Driver-side tooling only — not part of the Scala library.
"""
import json
import math
import re
import sys

FAMILIES = [
    ("scan/filter/project", ["q01", "q02", "q03", "q04", "q05", "q06", "q09",
                             "q68", "q69", "q88", "q90"]),
    ("aggregation", ["q07", "q08", "q21", "q22", "q23", "q24", "q25", "q26",
                     "q85", "q86", "q112", "q124", "q151", "q164",
                     "q272", "q278"]),
    ("joins", ["q10", "q11", "q12", "q13", "q14", "q15", "q16", "q64",
               "q65", "q66", "q67", "q107"]),
    ("tpch suite", ["q71", "q72", "q80", "q81", "q82", "q83", "q84", "q94",
                    "q95", "q96", "q97", "q98", "q99", "q100", "q101",
                    "q102", "q103", "q104", "q105", "q118", "q119", "q120"]),
    ("windows/sessionization", ["q17", "q18", "q19", "q93", "q154", "q161",
                                "q163", "q168", "q172"]),
    ("asof/range join", ["q31", "q32", "q76"]),
    ("dedup family", ["q43", "q44", "q45", "q46", "q47", "q48", "q49",
                      "q53", "q114", "q134", "q139", "q141", "q174",
                      "q193", "q200", "q204", "q206", "q208", "q209",
                      "q238", "q256", "q258", "q262", "q265", "q268",
                      "q274", "q277", "q283", "q284", "q289"]),
    ("similarity/ann", ["q50", "q51", "q52", "q59", "q74", "q75", "q140",
                        "q159", "q171", "q184", "q191", "q196", "q197",
                        "q202", "q207", "q211", "q215", "q217", "q219",
                        "q220", "q221", "q222", "q224", "q248", "q249",
                        "q250", "q251", "q257", "q259", "q260", "q270",
                        "q271", "q282"]),
    ("ivf-pq lifecycle (ingest/delete/curves/stream)",
     ["q225", "q226", "q227", "q228", "q229", "q230", "q231", "q232"]),
    ("graph ann tier (build/serve/lifecycle/deploy)",
     ["q233", "q234", "q235", "q236", "q237", "q239", "q240", "q241",
      "q242", "q243", "q244", "q245", "q246", "q247"]),
    ("text/corpus analysis", ["q40", "q41", "q42", "q79", "q113", "q127",
                              "q130", "q138", "q143", "q144", "q156",
                              "q157", "q177", "q179", "q183", "q190", "q203",
                              "q210", "q213", "q214", "q218", "q273",
                              "q285"]),
    ("pipeline ops", ["q126", "q128", "q129", "q131", "q132", "q133",
                      "q145", "q146", "q147", "q148", "q149", "q150",
                      "q165", "q176", "q178", "q180", "q181", "q182",
                      "q185", "q186", "q192", "q195", "q201", "q205",
                      "q216", "q252", "q253", "q254", "q255", "q261",
                      "q264", "q266", "q267", "q269", "q275", "q276",
                      "q280", "q281", "q286", "q287", "q290"]),
    ("behavioral/graph", ["q153", "q158", "q160", "q166", "q167", "q169",
                          "q170", "q187"]),
    ("lake maintenance", ["q109", "q135", "q136", "q152", "q155", "q162",
                          "q198", "q212"]),
    ("streaming (fixed-cost state machinery)",
     ["q55", "q56", "q57", "q91", "q92", "q108", "q115", "q116", "q117",
      "q123", "q125", "q142", "q194", "q199", "q223", "q263", "q279",
      "q288"]),
    ("multimodal", ["q60", "q61", "q188", "q189"]),
]


def load(path):
    with open(path) as f:
        line = f.readline()
    d = json.loads(line)
    sf = d.get("sf", path)
    m = re.search(r"sf([0-9.]+)", str(sf))
    return (float(m.group(1)) if m else None), d["queries"], d["value"]


def main():
    runs = [load(p) for p in sys.argv[1:]]
    runs.sort(key=lambda r: r[0])
    sfs = [r[0] for r in runs]
    qmaps = [r[1] for r in runs]
    # index of the run one decade below the largest SF (slope base)
    base_i = next((i for i, sf in enumerate(sfs)
                   if abs(sf - sfs[-1] / 10) < 1e-9), None)
    all_named = set()
    decade = (f"sf{sfs[base_i]:g}→sf{sfs[-1]:g}"
              if base_i is not None else "last decade")
    print("| family | " + " | ".join(f"sf{sf:g} (s)" for sf in sfs) +
          f" | slope({decade}) |")
    print("|---|" + "---|" * (len(sfs) + 1))

    def fam_time(qmap, prefixes):
        tot, n = 0.0, 0
        for q, t in qmap.items():
            base = q.split("_")[0]
            if base in prefixes and t is not None:
                tot += t
                n += 1
        return tot, n

    for fam, prefixes in FAMILIES:
        all_named.update(prefixes)
        times = [fam_time(m, prefixes)[0] for m in qmaps]
        slope = ""
        if base_i is not None and times[-1] > 0 and times[base_i] > 0:
            slope = f"{math.log10(times[-1] / times[base_i]):.2f}"
        print(f"| {fam} | " +
              " | ".join(f"{t:.1f}" for t in times) + f" | {slope} |")

    other = [
        sum(t for q, t in m.items()
            if q.split("_")[0] not in all_named and t is not None)
        for m in qmaps]
    slope = (f"{math.log10(other[-1] / other[base_i]):.2f}"
             if base_i is not None and other[-1] > 0 and other[base_i] > 0
             else "")
    print("| other (bridge/meta/nested/json/sinks) | " +
          " | ".join(f"{t:.1f}" for t in other) + f" | {slope} |")
    totals = [r[2] for r in runs]
    tslope = (f"{math.log10(totals[-1] / totals[base_i]):.2f}"
              if base_i is not None else "")
    print("| **total** | " +
          " | ".join(f"**{t:.1f}**" for t in totals) + f" | **{tslope}** |")

    # the 10 worst per-query slopes over the last decade, for triage
    print(f"\nWorst per-query slopes {decade} (t_sf{sfs[-1]:g} >= 0.5s):")
    worst = []
    base = qmaps[base_i] if base_i is not None else qmaps[-2]
    for q, t1 in qmaps[-1].items():
        t0 = base.get(q)
        if t0 and t1 and t1 >= 0.5:
            worst.append((math.log10(t1 / t0), q, t0, t1))
    for s, q, t0, t1 in sorted(worst, reverse=True)[:10]:
        print(f"  {q}: {t0:.2f}s -> {t1:.2f}s  slope {s:.2f}")


if __name__ == "__main__":
    main()
