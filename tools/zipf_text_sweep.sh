#!/usr/bin/env bash
# Zipf-vocabulary text-gate sweep (round-10): the driver replicas inherit
# the source's 31-word salad, where every term is effectively a stopword —
# that stress-tests the seeded phrase/proximity path's worst case (no rare
# seeds) but under-tests the df skew every real corpus has: rare-term
# seeds that actually prune, bm25 idf spread, PMI tails.
#
# This sweep regenerates the 10x/100x replicas with
# GRAFT_SCALEGEN_ZIPF=10000 (P(rank) ∝ 1/rank over w1..w10000, 30-80
# tokens/doc, planted ~0.2% exact-dup rate) and re-runs the term-df-
# sensitive gates against their unchanged DuckDB oracles — the oracles
# recompute from the replica's own text, so parity is exact, not salad-
# specific.
#
# Usage: tools/zipf_text_sweep.sh [workdir]   (defaults to /tmp)
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp}

GATES="q_bm25_topk,q_bm25f_topk,q_bm25_delete,q_phrase_search,q_proximity_search,q_pmi_cooccur,q_tfidf_keywords,q_decontam,q_bloom_decontam"

echo "== 10x Zipf replica"
GRAFT_SCALEGEN_ZIPF=10000 \
  sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 $WORK/graft_zipf10 10"
GRAFT_VERIFY_ONLY="$GATES" SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Verify $WORK/graft_zipf10 $WORK/verify_zipf10"
CHECK_ONLY="$GATES" python3 -u tools/check_oracle.py \
  "$WORK/graft_zipf10" "$WORK/verify_zipf10"

echo "== 100x Zipf replica (decade 2 word-salts the Zipf base per copy;"
echo "   GRAFT_SCALEGEN_ZIPF deliberately NOT set so the decade keeps the"
echo "   10x replica's term-df structure instead of regenerating it)"
sbt -batch "runMain graft.ScaleGen $WORK/graft_zipf10 $WORK/graft_zipf100 10"
GRAFT_VERIFY_ONLY="$GATES" SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Verify $WORK/graft_zipf100 $WORK/verify_zipf100"
CHECK_ONLY="$GATES" python3 -u tools/check_oracle.py \
  "$WORK/graft_zipf100" "$WORK/verify_zipf100"
echo "==== zipf sweep complete"
