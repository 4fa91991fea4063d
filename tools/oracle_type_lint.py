#!/usr/bin/env python3
"""Suite-wide oracle result-type lint (round-12 verdict task 3).

Usage: python3 tools/oracle_type_lint.py <sfDir> <oracle_sql.json> [verifyOutDir]

For every oracle SQL, DuckDB-DESCRIBEs the query over views named after the
testdata tables in <sfDir> and fails on:
  * any HUGEINT / UHUGEINT result column (an uncast SUM over BIGINT — the
    driver's type-sensitive hash sees float64 vs Spark's int64; SURVEY.md
    §7.4 trap 9, the exact bug that shipped q280/q283 red in round 12);
  * [with verifyOutDir] float-family disagreement between the oracle's
    DESCRIBE type and the Verify parquet schema for the same column
    (int-family vs float-family mismatch).

DESCRIBE plans without executing, so the whole 290-query sweep takes
seconds at any SF. Driver-side tooling only — not part of the Scala
library.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
FLOAT_FAMILY = {"FLOAT", "DOUBLE", "REAL"}


def family(t):
    t = str(t).upper()
    base = t.split("(")[0].strip()
    if base in INT_FAMILY:
        return "int"
    if base in FLOAT_FAMILY:
        return "float"
    if base.startswith("DECIMAL"):
        return "decimal"
    return "other"


def parquet_families(con, qdir):
    rows = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchall()
    return {c: family(t) for c, t, *_ in rows}


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    out_dir = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(oracle_path).read_text())

    failures = []
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            failures.append((name, f"DESCRIBE failed: {e}"))
            continue
        types = {c: str(t) for c, t, *_ in desc}
        huge = {c: t for c, t in types.items() if "HUGEINT" in t.upper()}
        if huge:
            failures.append(
                (name, f"HUGEINT column(s) {huge}: add CAST(... AS BIGINT)"))
            continue
        if out_dir and (Path(out_dir) / name).is_dir():
            spark_fam = parquet_families(con, Path(out_dir) / name)
            for c, t in types.items():
                sf, of = spark_fam.get(c), family(t)
                if sf is None:
                    failures.append((name, f"column {c} missing in Verify parquet"))
                elif {sf, of} == {"int", "float"}:
                    failures.append(
                        (name, f"column {c}: spark {sf} vs oracle {of} ({t})"))
    if failures:
        print(f"LINT FAILURES ({len(failures)}):")
        for n, msg in failures:
            print(f"  {n}: {msg}")
        sys.exit(1)
    print(f"oracle type lint: all {len(oracle)} queries clean "
          f"(no HUGEINT{', float-family agreement checked' if out_dir else ''})")


if __name__ == "__main__":
    main()
