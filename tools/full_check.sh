#!/bin/bash
# Full-suite driver-parity correctness gate at sf0.1 (round-12 verdict
# tasks 1-3): runs graft.Verify over ALL gates, then the oracle-type
# lint (DESCRIBE every oracle SQL; no HUGEINT, float-family agreement
# with the Verify parquet schema), then the dtype-exact tools/check.py.
# Writes the committed evidence to bench/full_sf0.1_check.txt.
# Run at FINAL HEAD so the committed artifact matches committed code.
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OUT=${1:-/tmp/verify_full_sf01}
SF=/root/testdata/sf0.1
rm -rf "$OUT"
java -Xmx48g -XX:ReservedCodeCacheSize=512m -cp "$CP" graft.Verify "$SF" "$OUT" \
  2>&1 | grep -E '\[verify\]' || true
{
  echo "# Full-suite sf0.1 oracle check ($(date -u +%Y-%m-%dT%H:%MZ), dtype-exact gate):"
  python3 tools/oracle_type_lint.py "$SF" "$OUT/oracle_sql.json" "$OUT"
  python3 tools/check.py "$SF" "$OUT"
} | tee bench/full_sf0.1_check.txt
