package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.{cosine_sim, hamming, inner_product, l2_sq}

/** Exact (FLAT) k-nearest-neighbor search — the reference's brute-force
  * model (reference index/impl/gamma_index_flat.cc:118-280) re-expressed as
  * a broadcast-product + codegen distance + per-query top-k.
  *
  * Scale design: the query set is small (req_num of the request batch) and
  * is broadcast; the doc side streams through whole-stage codegen computing
  * the distance kernel, and [[TopK.perGroup]] bounds the shuffle to
  * partitions x queries x k rows. No doc-side data is ever collected.
  */
object Knn {

  def score(metric: Metric.Value, docVec: Column, queryVec: Column): Column =
    metric match {
      case Metric.L2           => l2_sq(docVec, queryVec)
      case Metric.InnerProduct => inner_product(docVec, queryVec)
      case Metric.Cosine       => cosine_sim(docVec, queryVec)
      case Metric.Hamming      => hamming(docVec, queryVec).cast("double")
    }

  /** Brute-force top-k for a batch of queries.
    *
    * @param docs     doc table; must contain `idCol` and `vecCol`
    * @param queries  query table (small, broadcast); `qidCol` + `qvecCol`
    * @param k        neighbors per query
    * @param metric   L2 (asc) / InnerProduct / Cosine (desc) / Hamming (asc)
    * @param filter   optional scalar pre-filter on docs (the reference
    *                 applies filters before/inside the index scan,
    *                 search/gamma_engine.cc:359-372)
    * @param l2Sqrt   emit sqrt(L2^2) like the reference's `l2_sqrt` flag
    * @param minScore/maxScore score-range predicate (P8,
    *                 common/gamma_common_data.h:95-97)
    * @return (qid, id, score) + any extra doc columns requested
    */
  def flatSearch(
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int,
      metric: Metric.Value = Metric.L2,
      filter: Option[Column] = None,
      l2Sqrt: Boolean = false,
      minScore: Option[Double] = None,
      maxScore: Option[Double] = None,
      keepCols: Seq[String] = Nil): DataFrame = {
    val filtered = filter.map(docs.filter).getOrElse(docs)
    val raw = score(metric, col(vecCol), col(qvecCol))
    val scoreExpr = if (metric == Metric.L2 && l2Sqrt) sqrt(raw) else raw
    val scored = filtered
      .crossJoin(broadcast(queries))
      .select(
        (col(qidCol).as("qid") +: col(idCol).as("id") +:
          scoreExpr.as("score") +: keepCols.map(col)): _*)
    val ranged = (minScore, maxScore) match {
      case (None, None) => scored
      case (lo, hi) =>
        val lower = lo.map(col("score") >= _).getOrElse(lit(true))
        val upper = hi.map(col("score") <= _).getOrElse(lit(true))
        scored.filter(lower && upper)
    }
    TopK.perGroup(ranged, "qid", "score", Metric.ascending(metric), k, Seq("id"))
  }
}
