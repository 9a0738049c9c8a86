package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Metric

/** Multi-vector-per-document support: a doc may carry several vectors in
  * one field (the reference's vid/docid mapping, `VIDMgr`,
  * vector/raw_vector_common.h:44-115). Search scores every vid and then
  * collapses to the best hit per doc BEFORE any top-k limit — the order the
  * reference enforces in `parse_index_search_result`
  * (vector/vector_manager.cc:396-417); deduping after the limit would
  * under-fill the result.
  */
object MultiVec {

  /** Explode `array<array<float>>` into vid-level rows keeping the doc id:
    * output = idCol, vid (position), `outVecCol`.
    */
  def explodeVids(
      docs: DataFrame, idCol: String, multiVecCol: String,
      outVecCol: String = "vec"): DataFrame =
    docs.select(
      col(idCol),
      posexplode(col(multiVecCol)).as(Seq("vid", outVecCol)))

  /** KNN over a multi-vector field: score all vids, keep the best vid per
    * (query, doc) — min for ascending metrics, max otherwise — then top-k
    * docs per query.
    */
  def search(
      docs: DataFrame,
      idCol: String,
      multiVecCol: String,
      queries: DataFrame, // qidCol, qvecCol
      qidCol: String,
      qvecCol: String,
      k: Int,
      metric: Metric.Value = Metric.L2,
      filter: Option[Column] = None): DataFrame = {
    val vids = explodeVids(filter.map(docs.filter).getOrElse(docs), idCol, multiVecCol)
    val scored = vids
      .crossJoin(broadcast(queries))
      .select(col(qidCol).as("qid"), col(idCol).as("id"),
        Knn.score(metric, col("vec"), col(qvecCol)).as("vid_score"))
    val asc = Metric.ascending(metric)
    // P9: per-doc collapse BEFORE the limit
    val perDoc = scored.groupBy(col("qid"), col("id"))
      .agg((if (asc) min(col("vid_score")) else max(col("vid_score"))).as("score"))
    TopK.perGroup(perDoc, "qid", "score", asc, k, Seq("id"))
  }
}
