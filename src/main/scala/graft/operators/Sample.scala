package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the "take an exact fraction of
  * every stratum" curation step (per-language/per-source corpus
  * balancing, eval-set carving). Complements [[Mix]] (rate-based
  * mixture sampling, no per-group exactness guarantee): here every
  * group contributes EXACTLY ceil(frac·|group|) rows, chosen by a
  * content-independent deterministic hash order, so the sample is
  * reproducible across runs, engines and partitionings.
  *
  * Scale design: the rank shuffle carries (group, id, hash) triplets
  * only — the payload never moves; selected ids rejoin the corpus with
  * a semi-join (AQE broadcasts the keep side when small). Group counts
  * come from a partial-aggregated count (map-side combine), and the
  * per-group ranking is the one unavoidable shuffle of an exact-quota
  * contract. The hash is the md5-prefix integer both engines compute
  * identically (TextOps.tokenHash60's scheme), so the DuckDB oracle
  * reproduces membership exactly.
  */
object Sample {

  /** Exactly ceil(frac·|group|) rows per group, smallest
    * hash(id) first (ties impossible for distinct ids; hash collisions
    * fall back to ascending id). All input columns are preserved.
    */
  def stratifiedExact(
      df: DataFrame, groupCol: String, idCol: String,
      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1] (got $frac)")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val triplets = df.select(col(groupCol), col(idCol)).withColumn("__h", h)
    val counts = triplets.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
    val keep = triplets
      .join(counts, Seq(groupCol))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol))
          .orderBy(col("__h").asc, col(idCol).asc)))
      .filter(col("__rn") <= ceil(lit(frac) * col("__n")))
      .select(col(groupCol), col(idCol))
    df.join(keep, Seq(groupCol, idCol), "left_semi")
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** Keep the top ceil(frac·|group|) rows of every group by DESCENDING
    * `score` (ties: ascending id) — per-domain quality filtering ("keep
    * the best quarter of every source/language"), the rank-based exact
    * form of quantile thresholding. Same triplet shape as
    * [[stratifiedExact]]: only (group, score, id) cross the rank shuffle,
    * the payload rejoins by semi-join.
    *
    * Scale note: the exact per-group quantile needs the one rank shuffle.
    * When an approximate cut is acceptable at extreme scale, compute a
    * per-group threshold with approx_percentile and filter — no window at
    * all; the exact contract here is what the oracle can check. Callers
    * should pass a DETERMINISTICALLY ROUNDED score (e.g. round(q, 6)) so
    * rank order cannot hinge on last-ulp float noise.
    */
  def topFractionPerGroup(
      df: DataFrame, groupCol: String, idCol: String, score: org.apache.spark.sql.Column,
      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1] (got $frac)")
    val triplets = df.select(col(groupCol), col(idCol), score.as("__s"))
    val counts = triplets.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val keep = triplets
      .join(counts, Seq(groupCol))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol))
          .orderBy(col("__s").desc, col(idCol).asc)))
      .filter(col("__rn") <= ceil(lit(frac) * col("__n")))
      .select(col(groupCol), col(idCol))
    df.join(keep, Seq(groupCol, idCol), "left_semi")
      .select(df.columns.toIndexedSeq.map(col): _*)
  }
}
