package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prototypicality pruning (Sorscher et al. 2022, "Beyond neural scaling
  * laws"): rank each embedding by its distance to its class centroid and
  * keep only the hardest (farthest) fraction — the SSL-prototypes data-
  * pruning rule that drops the most prototypical examples first.
  *
  * Exact cross-engine arithmetic: embeddings are fixed to milli-units
  * (floor(x·1000) as long), the per-label centroid is carried as the
  * exact integer SUM vector s plus the count n (never the float mean),
  * and the squared distance to the centroid is compared through the
  * scale-invariant surrogate
  *
  *   score(x) = Σ_i (n·x_i − s_i)²   (= n² · ‖x − s/n‖², same ranking)
  *
  * where each term is an exact BIGINT difference squared in doubles in
  * fixed dimension order — the repo's proven oracle-parity class. Ties
  * break on the id.
  *
  * Scale shape: the centroid pass explodes to (label, dim, long) rows —
  * one integer-only shuffle with map-side partial sums, |labels|·dims
  * result rows broadcast back; the score is a pure projection over the
  * original rows (vectors never shuffle); the keep-rank window shuffles
  * (id, label, score) only. A single dominant label can be salted
  * through [[SkewAgg]] if per-label cardinality is extreme.
  */
object ProtoPrune {

  /** Milli-unit fixed-point vector: floor(x·1000) per element. */
  def milliVec(v: Column): Column =
    transform(v, e => floor(e.cast("double") * lit(1000.0)).cast("long"))

  /** Per-label exact centroid state: (label, n, s[dim]) with s the
    * elementwise long sum of the milli vectors.
    */
  def centroidSums(df: DataFrame, labelCol: String, vecCol: String, dims: Int): DataFrame =
    df.select(col(labelCol), posexplode(milliVec(col(vecCol))).as(Seq("__pos", "__v")))
      .groupBy(col(labelCol), col("__pos"))
      .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
      .groupBy(col(labelCol))
      .agg(
        max(col("__n")).as("__n"),
        transform(array_sort(collect_list(struct(col("__pos"), col("__s")))),
          x => x.getField("__s")).as("__sums"))

  /** Keep the hardest `keepNum/keepDen` fraction per label (by centroid
    * distance, farthest first, id tie-break). Returns
    * (idCol, labelCol, proto_score, proto_rank).
    */
  def pruneHardest(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String,
      dims: Int,
      keepNum: Int,
      keepDen: Int): DataFrame = {
    val cents = centroidSums(df, labelCol, vecCol, dims)
    val scored = df
      .select(col(idCol), col(labelCol), milliVec(col(vecCol)).as("__m"))
      .join(broadcast(cents), labelCol)
      .withColumn("__dev",
        zip_with(col("__m"), col("__sums"),
          (a, b) => (col("__n") * a - b).cast("double")))
      // NO round(): every term is an integer-valued double, so the fold
      // is exact (bit-identical to the oracle's list_reduce) while sums
      // stay below 2^53 — and DuckDB's round(x, 6) is itself lossy at
      // >1e12 magnitudes (it cost 1-ulp parity at the 10x replica).
      .withColumn("proto_score",
        aggregate(col("__dev"), lit(0.0), (acc, x) => acc + x * x))
    val w = Window.partitionBy(col(labelCol))
      .orderBy(col("proto_score").desc, col(idCol))
    scored
      .withColumn("proto_rank", row_number().over(w))
      // keep ceil(n * num/den) per label in pure integer arithmetic
      .filter(col("proto_rank") * keepDen <= col("__n") * keepNum + lit(keepDen - 1))
      .select(col(idCol), col(labelCol), col("proto_score"),
        col("proto_rank").cast("long").as("proto_rank"))
  }
}
