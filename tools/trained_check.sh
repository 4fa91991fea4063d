#!/bin/bash
# Standing per-round evidence that the SAMPLED coarse-training path is
# hash-verified where the sample is ACTIVE (round-8 verdict task 3).
#
# At sf0.01 the embeddings corpus is ~500 rows and servingK(n) gives
# k=11, so the 64·k admission threshold saturates for every gate except
# q248 (fixed k=4). At sf0.1 (n=2000, k=22) the threshold is active for
# the WHOLE trained family — this script runs the driver's own
# Verify+check pipeline for that family at sf0.1 and writes the result
# to bench/trained_sf0.1_check.txt, which is committed per round.
set -e
cd /root/repo
FAM=q74_ann_ivf,q196_kmeans_codebook,q207_ivf_pq_search,q220_residual_ivf_pq,q241_graph_pq_serve,q248_sampled_codebook_small
OUT=/tmp/verify_trained_sf01
rm -rf "$OUT"
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $OUT $FAM" \
  2>&1 | grep -E '\[verify\]' || true
{
  echo "# trained-family sf0.1 oracle check ($(date -u +%Y-%m-%dT%H:%MZ))"
  echo "# sampling ACTIVE at sf0.1: n=2000, servingK=22, threshold"
  echo "# 64*22*2^20/2000 < 2^20 (vs saturated at sf0.01 for k=22)"
  python3 tools/oracle_type_lint.py /root/testdata/sf0.1 "$OUT/oracle_sql.json" "$OUT"
  python3 tools/check.py /root/testdata/sf0.1 "$OUT"
} | tee bench/trained_sf0.1_check.txt
