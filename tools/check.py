#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over views named after the
testdata tables in <sfDir>, and compares: row count, column names (sorted),
pandas dtypes per column (the driver's hash is TYPE-sensitive: a DuckDB
HUGEINT renders as float64 while Spark's BIGINT renders int64, and
`28109.0 == 28109` would pass a value-only gate the driver fails — §7.4
trap 9), and cell values with exact Python types. Also DESCRIBEs every
oracle SQL and fails outright on any HUGEINT/UHUGEINT result column (an
uncast SUM over BIGINT). Exit 1 if any query mismatches.

Driver-side tooling only — not part of the Scala library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if hasattr(v, "tolist") and not isinstance(v, (int, float)):  # numpy
        return norm_cell(v.tolist())
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return v


def rows_of(rel_df):
    cols = sorted(rel_df.columns)
    out = []
    for _, row in rel_df[cols].iterrows():
        out.append(tuple(norm_cell(v) for v in row.tolist()))
    return cols, out


def cells_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        # report near-misses distinctly: equal to 1e-9 relative
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(cells_equal(x, y) for x, y in zip(a, b))
    # timestamps etc: compare str forms as fallback only when equal
    return a == b or str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written dataset dir (e.g. ScaleGen output)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())

    failures = []
    names = sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir())
    for name in names:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            if len(spark_df) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
            huge = [(c, t) for c, t, *_ in desc if "HUGEINT" in str(t).upper()]
            if huge:
                failures.append(
                    (name, f"oracle HUGEINT column(s) {huge}: add CAST(... AS BIGINT)"))
                continue
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        sc, srows = rows_of(spark_df)
        dc, drows = rows_of(duck_df)
        if sc != dc:
            failures.append((name, f"columns differ: spark={sc} duck={dc}"))
            continue
        # dtype FAMILY compare: the driver hashes the Python cell values
        # pandas yields, so int32 vs int64 both render int and match,
        # but int64 vs float64 renders 28109 vs 28109.0 and fails the
        # hash (the q280/q283 drift). Flag exactly that class.
        def fam(dt):
            k = getattr(dt, "kind", "?")  # i/u int, f float, else exact
            return k if k in "iuf" else str(dt)
        sdt = [fam(spark_df[c].dtype) for c in sc]
        ddt = [fam(duck_df[c].dtype) for c in dc]
        if [d.replace("u", "i") for d in sdt] != \
                [d.replace("u", "i") for d in ddt]:
            # diff with the SAME u->i normalization as the gate, so a
            # harmless uint-vs-int pair never muddies the real culprit
            diffs = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                     for c, a, b in zip(sc, sdt, ddt)
                     if a.replace("u", "i") != b.replace("u", "i")]
            failures.append((name, f"DTYPE differs (spark, duck): {diffs}"))
            continue
        if len(srows) != len(drows):
            failures.append(
                (name, f"row count differs: spark={len(srows)} duck={len(drows)}"))
            continue
        # STRICT: the driver hash-compares, so require exact equality
        # (including float bits); cells_equal only classifies the miss.
        bad = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b or any(type(x) is not type(y) for x, y in zip(a, b)):
                if any(type(x) is not type(y) for x, y in zip(a, b)):
                    kind = "CELLTYPE"
                else:
                    near = all(cells_equal(x, y) for x, y in zip(a, b))
                    kind = "float-low-bits" if near else "VALUE"
                bad = (i, a, b, kind)
                break
        if bad:
            failures.append(
                (name, f"row {bad[0]} differs ({bad[3]}):\n    spark={bad[1]}\n    duck ={bad[2]}"))
            continue
        print(f"  [OK] {name}: {len(srows)} rows")

    if failures:
        print(f"\nFAILURES ({len(failures)}):")
        for n, msg in failures:
            print(f"  {n}: {msg}")
        sys.exit(1)
    print(f"\nall {len(names)} queries OK")


if __name__ == "__main__":
    main()
