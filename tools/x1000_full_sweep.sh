#!/usr/bin/env bash
# FULL-gate oracle parity at the 1000x replica (sf100-equivalent: 600M
# lineitem / 150M orders / 100M events / 15M customer / 5M docs / 2M vecs).
#
# Rounds 8-9 probed ~36 gates at 1000x; this sweep runs every remaining
# checkable gate there, in table-affinity chunks so one failure cannot
# take down the pass, with per-chunk tmp cleanup (lifecycle gates write
# multi-GB table copies under /tmp/graft_*).
#
# Compare routing: outputs <= 1M rows go through tools/check_oracle.py
# (the driver-faithful pandas compare, incl. dtype-kind guard); larger
# outputs through tools/except_all_check.py (DuckDB-native EXCEPT ALL
# both directions + the same dtype-kind guard).
#
# Exclusions (documented, same rules as scale_oracle_sweep.sh):
#   q_embed_neardup        engine+oracle are intentionally exact quadratic
#                          (2e12 pairs at 2M vectors — beyond even the
#                          blocked-BLAS oracle); 10x/100x parity stands
#   q_embed_neardup_lsh    verdict gate, but its brute arm is the same
#   q_dedup_semantic       quadratic baseline — 10x parity stands
#   q_ngram_jaccard        oracle is now prefix-filter (checkable at
#                          10x/100x) but the 31-word-salad vocab still
#                          fans ~8B candidate pairs at 1000x
#   q_hybrid_rrf_ivf       intentionally-exact full-probe operating point
#   already 1000x-exact    the 36 r8/r9-probed gates (SURVEY 14.6/15.5/16)
# r10: q_ivfpq_ann/q_hnsw_ann joined C5 (verdict gates now — their FLAT
# arm is the same 8-query brute scan the exact KNN gates already pay);
# q_media_headers_v2 joined C1.
#
# Usage: tools/x1000_full_sweep.sh [sfDir] [outDir]
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/tmp/graft_sf100}
OUT=${2:-/tmp/verify_x1000_full}
mkdir -p "$OUT"

C1_TEXT="q_text_chunk,q_text_fingerprint,q_text_langid,q_text_quality,q_text_redact,q_text_repetition,q_url_ops,q_media_meta,q_media_headers,q_media_headers_v2,q_boilerplate,q_heavy_hitters,q_lm_score,q_bpe_pairs,q_decontam,q_decontam_window,q_bloom_decontam,q_pmi_cooccur"
C2_DEDUP="q_dedup_simhash,q_dedup_cross,q_dedup_clusters,q_dedup_clusters_star,q_dedup_keep_best,q_dedup_substr,q_text_dedup_spans"
C3_SELECT="q_corpus_select,q_corpus_select_domain,q_corpus_select_waterfill,q_quality_topfrac,q_sample_stratified,q_sample_weighted,q_sample_weighted_group,q_split_group,q_mix_sample,q_mix_temperature,q_seq_pack,q_shard_assign,q_pipeline_curate"
C4_JOIN="q_agg_salted,q_anti_join,q_semi_join,q_asof_join,q_asof_fwd_tol,q_asof_nearest,q_range_join,q_window_dedup,q_bm25_delete,q_bm25f_topk"
C5_VEC="q_embed_project,q_knn_cosine,q_knn_ip,q_knn_l2sqrt,q_knn_int8,q_knn_hamming,q_knn_filtered,q_knn_scorerange,q_int8_roundtrip,q_ivfflat_fullprobe,q_ivfpq_exactrank,q_ivfpq_opq_exactrank,q_ivfpq_recallnum,q_binaryivf_fullprobe,q_mmr_rerank,q_hybrid_rrf,q_vecs_roundtrip,q_vecs_export,q_sql_ann_rewrite,q_multi_model,q_vec_fusion,q_multivid,q_ivfpq_ann,q_hnsw_ann"
C6_TABLE="q_table_e2e,q_table_int8,q_table_persisted,q_table_persisted_pq,q_binaryivf_lifecycle,q_point_lookup,q_scan_range,q_filter_range,q_term_all,q_term_notin,q_term_union,q_setops_pred,q_count_filter,q_live_count,q_delete_by_key,q_delete_by_query,q_upsert_state,q_tar_roundtrip"
C7_STREAM="q_stream_dedup,q_stream_neardup,q_stream_heavy,q_stream_hll,q_stream_upsert"
# r14: media decode/container gates (all checkable — closed-form oracles;
# q_media_neardup_clusters is adjudicated by tools/cluster_oracle.py over
# the EXCEPT-ALL-verified pairs, NOT by its recursive-CTE oracle, which is
# sum(k^2) reach rows on a percolating graph)
C8_MEDIA="q_media_decode,q_media_resize,q_media_jpeg,q_media_audio,q_media_audio_neardup,q_media_mp4_samples,q_media_mp4_keyframes,q_media_mp4_keyframes_edit,q_media_mp4_dupsig,q_media_mp4_fragmented,q_media_mp4_codec,q_media_mp4_multitrack,q_media_mp4_trackinfo,q_media_mp4_frag_multitrack,q_media_mp4_clip,q_media_neardup_dupheavy"

run_chunk() {
  local name=$1 gates=$2
  echo "==== chunk $name: engine pass"
  # run/fork := true — the engine heap is SPARK_DRIVER_MEM (sbt -J-Xmx
  # only sizes the sbt launcher, which bit the first run of this sweep:
  # Verify forked at the 8g default and G1's GCLocker aborted 65 MB
  # vectored-IO parquet reads). ParallelGC sidesteps the humongous-
  # region stall class entirely for these batch passes.
  GRAFT_VERIFY_ONLY="$gates" SPARK_GRAFT_CPUS=${CPUS:-24} \
  SPARK_DRIVER_MEM=${HEAP:-80g} SPARK_GC_OPTS="-XX:+UseParallelGC" \
    sbt -batch "runMain graft.Verify $SF $OUT" \
    2> >(grep -E '\[verify\]' >&2) || echo "chunk $name: Verify EXIT=$?"
  echo "==== chunk $name: oracle compare"
  python3 tools/route_compare.py "$SF" "$OUT" "$gates"
  # lifecycle gates leave multi-GB staged tables under /tmp/graft_*;
  # replicas are /tmp/graft_sf* — keep those.
  find /tmp -maxdepth 1 -name 'graft_*' ! -name 'graft_sf*' \
    -newer "$OUT/oracle_sql.json" -exec rm -rf {} + 2>/dev/null || true
}

# CHUNKS env selects a subset (resume after a mid-sweep failure without
# re-paying completed chunks), e.g. CHUNKS="dedup select join"
want() { [[ " ${CHUNKS:-text dedup select join vec table stream media} " == *" $1 "* ]]; }
want text   && run_chunk text   "$C1_TEXT"
want dedup  && run_chunk dedup  "$C2_DEDUP"
want select && run_chunk select "$C3_SELECT"
want join   && run_chunk join   "$C4_JOIN"
want vec    && run_chunk vec    "$C5_VEC"
want table  && run_chunk table  "$C6_TABLE"
want stream && run_chunk stream "$C7_STREAM"
want media  && run_chunk media  "$C8_MEDIA"
echo "==== sweep complete"
