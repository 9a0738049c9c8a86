package graft.core

/** Typed re-expression of the reference's flatbuffers request surface
  * (reference idl/fbs/request.fbs:27-40): topn, req_num (vector batch),
  * per-field vector queries with boost, term filters with union/and/not-in
  * modes, numeric range filters with inclusive/exclusive bounds, score
  * range, brute-force override, l2_sqrt transform.
  */
object Metric extends Enumeration {
  val L2, InnerProduct, Cosine, Hamming = Value

  /** Lower-is-better (L2, Hamming) vs higher-is-better (IP, Cosine). */
  def ascending(m: Value): Boolean = m == L2 || m == Hamming
}

/** Term filter over a tag/string field (request.fbs:3-7).
  * Modes mirror `is_union`: 1 = union (any value matches), 0 = all values
  * must be present, 2 = not-in (complement)
  * (reference table/field_range_index.cc:1029-1058).
  */
object TermMode extends Enumeration { val Union, All, NotIn = Value }

case class TermFilter(
    field: String,
    values: Seq[String],
    mode: TermMode.Value = TermMode.Union)

/** Numeric range filter, bounds optional and inclusive by default
  * (request.fbs:9-15; evaluation reference table/field_range_index.cc:616-759).
  */
case class RangeFilter(
    field: String,
    lower: Option[Double] = None,
    upper: Option[Double] = None,
    includeLower: Boolean = true,
    includeUpper: Boolean = true)

/** One vector query against a named vector field (request.fbs:17-25).
  * `vectors` carries a batch of `req_num` query vectors (request.fbs:28 —
  * the reference packs req_num vectors into one VectorQuery buffer); when
  * empty, `vector` is the single query. Results carry `qid` = position in
  * the batch.
  *
  * `retrievalType` picks WHICH of a field's attached indexes answers when
  * several models are registered per field (V10 — the reference resolves
  * by (name, retrieval_type), vector/vector_manager.cc:447-459, defaulting
  * to the table's declared type when unset). `nprobe`/`efSearch` are
  * per-request knob overrides (the reference parses a per-request param
  * JSON, vector_manager.cc:482-483).
  */
case class VecQuery(
    field: String,
    vector: Array[Float] = Array.empty,
    boost: Option[Double] = None,
    minScore: Option[Double] = None,
    maxScore: Option[Double] = None,
    vectors: Seq[Array[Float]] = Nil,
    retrievalType: Option[String] = None,
    nprobe: Option[Int] = None,
    efSearch: Option[Int] = None,
    // per-request candidate-pool size and exact-re-rank toggle (the
    // reference's request param JSON carries recall_num / has_rank next to
    // nprobe: common/gamma_common_data.h:89, request.fbs:38, parsed at
    // gamma_index_ivfpq.h:707+); None = the index's build-time setting
    recallNum: Option[Int] = None,
    hasRank: Option[Boolean] = None) {
  def batch: Seq[(Long, Array[Float])] =
    if (vectors.nonEmpty) vectors.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    else Seq((0L, vector))
}

/** Search request (request.fbs:27-40). `vecQueries` over multiple fields
  * are intersected on docid with fused scores (the reference's multi-vector
  * merge, vector/vector_manager.cc:501-576).
  */
case class SearchRequest(
    topn: Int,
    vecQueries: Seq[VecQuery] = Nil,
    termFilters: Seq[TermFilter] = Nil,
    rangeFilters: Seq[RangeFilter] = Nil,
    metric: Metric.Value = Metric.L2,
    bruteForce: Boolean = false,
    l2Sqrt: Boolean = false,
    multiVectorRank: Boolean = true,
    fields: Seq[String] = Nil)
