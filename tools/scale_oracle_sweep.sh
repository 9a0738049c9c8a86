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
# (q_ngram_jaccard left this list in round 9: its oracle now replays the
# engine's lossless AllPairs prefix filter — same output, tractable at
# scale. q_embed_neardup stays: cosine has no lossless discrete
# candidate key; its scale path is the LSH variant.)
QUADRATIC="q_embed_neardup"
# q_hybrid_rrf_ivf's exact operating point (full probe + exhaustive
# recallNum rerank) is intentionally quadratic — skip at 100x only.
# (q_mmr_rerank left this list in round 9: its oracle candidate stage is
# 64 fixed queries x corpus now, not (n/97) x corpus. The stream gates
# also left: they ingest via real file-source microbatches — no
# driver-side MemoryStream feed, no skip class.)
QUADRATIC_100="q_hybrid_rrf_ivf"

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
GRAFT_VERIFY_ONLY="$ONLY" SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Verify $WORK/graft_sf10 $WORK/verify_x100"
CHECK_ONLY="$ONLY" python3 -u tools/check_oracle.py \
  "$WORK/graft_sf10" "$WORK/verify_x100"

echo "== stream operators via real file-source ingest (no driver feed)"
sbt -batch "runMain graft.StreamScaleProbe $WORK/graft_sf1 2"
SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.StreamScaleProbe $WORK/graft_sf10 2"
