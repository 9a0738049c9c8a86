#!/usr/bin/env bash
# Scaled-correctness sweep: full DuckDB oracle parity on ScaleGen replicas.
#
# Round 7 measured only TIMINGS at 10x/100x; this sweep runs the actual
# per-query oracle compare there, and caught two bugs timing curves never
# would (SURVEY §14.5): the upsert gate's fixed insert-key offset colliding
# with live keys past 100k rows, and Mix.uniform's double-division wrap.
#
# Usage: tools/scale_oracle_sweep.sh [workdir]   (defaults to /tmp)
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp}

# Oracles that are intentionally naive and intractable on scaled replicas
# (all-pairs joins); engine-side parity for these stands at sf0.01/sf0.1.
# (q_ngram_jaccard left this list in round 9: its oracle replays the
# engine's lossless AllPairs prefix filter. q_embed_neardup left in round
# 10: cosine at t=0.45 has no lossless discrete candidate key — the
# sub-threshold similarity distribution is continuous — but the oracle's
# computation shape changed to DuckDB-native DOUBLE[64]
# array_cosine_similarity, which covers the 10x decade in ~22 s; the
# skip-everywhere class is now EMPTY.)
QUADRATIC=""
# Gates whose oracle or engine arm is intentionally quadratic — skip at
# 100x only (2e10 pairs at 200k vectors): q_hybrid_rrf_ivf's exact
# operating point (full probe + exhaustive recallNum rerank); the cosine
# near-dup pair (q_embed_neardup + the q_embed_neardup_lsh verdict's
# brute arm — 100x parity for these via tools/embed_neardup_oracle.py's
# blocked-BLAS exact oracle); q_dedup_semantic's verdict brute arm.
QUADRATIC_100="q_hybrid_rrf_ivf,q_embed_neardup,q_embed_neardup_lsh,q_dedup_semantic"

echo "== 10x replica (sf1-scale)"
sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 $WORK/graft_sf1 10"
sbt -batch "runMain graft.Verify $WORK/graft_sf1 $WORK/verify_x10"
CHECK_SKIP="$QUADRATIC" python3 -u tools/check_oracle.py \
  "$WORK/graft_sf1" "$WORK/verify_x10"

echo "== 100x replica"
sbt -batch "runMain graft.ScaleGen $WORK/graft_sf1 $WORK/graft_sf10 10"
SKIP="$QUADRATIC,$QUADRATIC_100"
ONLY=$(python3 - "$WORK/verify_x10/oracle_sql.json" "$SKIP" <<'EOF'
import json, sys
skip = set(sys.argv[2].split(','))
print(','.join(q for q in sorted(json.load(open(sys.argv[1]))) if q not in skip))
EOF
)
# run/fork := true — size the FORKED engine JVM via SPARK_DRIVER_MEM
# (sbt -J-Xmx only sizes the launcher)
# The cosine near-dup pair RUNS at 100x (engine arms are Spark-side
# quadratic but tractable); only their DuckDB oracles are skipped —
# the blocked-BLAS oracle below adjudicates them instead.
GRAFT_VERIFY_ONLY="$ONLY,q_embed_neardup,q_embed_neardup_lsh" \
  SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Verify $WORK/graft_sf10 $WORK/verify_x100"
CHECK_ONLY="$ONLY" python3 -u tools/check_oracle.py \
  "$WORK/graft_sf10" "$WORK/verify_x100"
python3 -u tools/embed_neardup_oracle.py "$WORK/graft_sf10" "$WORK/verify_x100"

echo "== stream operators via real file-source ingest (no driver feed)"
sbt -batch "runMain graft.StreamScaleProbe $WORK/graft_sf1 2"
SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.StreamScaleProbe $WORK/graft_sf10 2"
