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

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * the global k-row sample where a row's inclusion probability is
    * proportional to its weight — corpus subsampling that favors long /
    * high-quality documents without ever materializing a cumulative
    * distribution. Each row draws an exponential key
    * `e = -ln(u(id)) / w` and the k SMALLEST keys win; u(id) is the
    * md5-prefix uniform, so the draw is reproducible across runs,
    * engines and partitionings (no RNG state, no seed plumbing beyond
    * the salt string).
    *
    * Determinism: the key is quantized to exact integers BOTH engines
    * compute identically — a = floor(ln(2^33/(2h+1))·1e9) (ln of a
    * power-of-two-over-odd rational; the libm-parity class verified for
    * the BM25 idf), then key = floor(a·1000 / w) by exact integer
    * division (dividend ≤ 2.3e13 < 2^53, so even the double-division
    * form is exact). Ties break by ascending id.
    *
    * Scale shape: pure per-row projection + global top-k
    * (TakeOrdered, k-bounded) — no shuffle, no window, no collect.
    */
  def weightedTopK(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "ws"): DataFrame = {
    val h = conv(substring(md5(concat(lit(salt + ":"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    val a = floor(log(lit(8589934592.0) / (h * 2 + 1).cast("double")) *
      lit(1e9)).cast("long")
    val num = a * lit(1000L)
    val w = col(weightCol).cast("long")
    val key = ((num - pmod(num, w)) / w).cast("long")
    df.filter(w > 0)
      .select(col(idCol), w.as("weight"), key.as("key_micro"))
      .orderBy(col("key_micro").asc, col(idCol).asc)
      .limit(k)
  }

  /** Per-group weighted sampling without replacement: [[weightedTopK]]'s
    * exponential-key draw, k rows per GROUP (per-language / per-source
    * weighted subsampling with exact quotas). Same key derivation; the
    * per-group selection is the k-bounded heap aggregate, so the shuffle
    * moves at most k rows per group — never the corpus.
    */
  def weightedTopKPerGroup(
      df: DataFrame, groupCol: String, idCol: String, weightCol: String,
      k: Int, salt: String = "ws"): DataFrame = {
    val h = conv(substring(md5(concat(lit(salt + ":"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    val a = floor(log(lit(8589934592.0) / (h * 2 + 1).cast("double")) *
      lit(1e9)).cast("long")
    val num = a * lit(1000L)
    val w = col(weightCol).cast("long")
    val key = ((num - pmod(num, w)) / w).cast("long")
    val sel = df.filter(w > 0)
      .select(col(groupCol), col(idCol), w.as("weight"), key.as("key_micro"))
    TopK.perGroup(sel, groupCol, "key_micro", ascending = true, k, Seq(idCol))
  }

  /** Leakage-safe train/val/test assignment: every row gets a split
    * label decided by a hash of its GROUP value (site, registered
    * domain, author, …), so all rows of one group land in the same
    * split and near-duplicates sharing a group can never straddle the
    * train/eval boundary — the standard contamination-safe carving rule.
    *
    * `splits` are (label, fraction) pairs; the last label absorbs any
    * remainder. Assignment is exact integer arithmetic on the md5-prefix
    * group hash (micro-unit thresholds), a pure per-row projection — no
    * shuffle, no RNG state, byte-identical across engines/retries.
    */
  def splitByGroupHash(
      df: DataFrame, groupCol: String,
      splits: Seq[(String, Double)], outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "split fractions exceed 1")
    val h32 = conv(substring(md5(col(groupCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    // exact micro-unit position of the group hash in [0, 1e6)
    val u = ((h32 * 1000000L - pmod(h32 * 1000000L, lit(4294967296L))) /
      lit(4294967296L)).cast("long")
    val cuts = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.floor(f * 1e6).toLong
    }.tail
    val assigned = splits.init.zip(cuts.init).foldRight(
      lit(splits.last._1): org.apache.spark.sql.Column) {
      case (((label, _), cut), acc) => when(u < cut, label).otherwise(acc)
    }
    df.withColumn(outCol, assigned)
  }
}
