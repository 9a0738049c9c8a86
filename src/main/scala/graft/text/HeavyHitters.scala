package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters at bounded memory — the
  * boilerplate/hot-term detector a corpus pipeline runs before dedup
  * ("which exact lines/terms appear in > x% of the corpus"). A full
  * `groupBy(item)` materializes one group per DISTINCT item (unbounded
  * state for web-scale vocabularies); this is the classic two-phase
  * sketch-then-verify instead:
  *
  *  1. candidate pass — one [[graft.functions.MgSketch]] aggregation:
  *     every map task keeps ≤ k slots, the shuffle moves one k-bounded
  *     summary per partition, and Misra-Gries guarantees every item with
  *     true frequency > N/(k+1) survives the merge;
  *  2. verify pass — the ≤ k candidates broadcast back over the corpus
  *     for an EXACT recount (state is candidate-bounded, not
  *     vocabulary-bounded), and the true threshold filter runs on the
  *     exact counts.
  *
  * With minFreqRatio ≥ 1/(k+1) the superset guarantee makes the final
  * answer EXACT — sketch order-sensitivity affects only which extra
  * candidates get recounted and discarded — so a plain
  * GROUP BY / HAVING oracle checks it bit-for-bit.
  */
object HeavyHitters {

  /** All items of `itemCol` whose frequency exceeds
    * minFreqRatio · count(itemCol), as (itemCol, cnt). Exact; requires
    * k + 1 ≥ 1/minFreqRatio so the sketch's guarantee covers the
    * threshold.
    */
  def exact(
      df: DataFrame, itemCol: String,
      minFreqRatio: Double, k: Int): DataFrame = {
    require(minFreqRatio > 0.0 && minFreqRatio < 1.0,
      s"minFreqRatio must be in (0,1), got $minFreqRatio")
    require((k + 1).toDouble >= 1.0 / minFreqRatio,
      s"k=$k too small for exactness at ratio=$minFreqRatio " +
        s"(need k+1 >= ${math.ceil(1.0 / minFreqRatio).toLong})")
    val cand = df
      .agg(graft.functions.mg_sketch(col(itemCol), k).as("__s"))
      .select(explode(map_keys(col("__s.items"))).as("__item"))
    verify(df, itemCol, cand, minFreqRatio)
  }

  /** The exact recount phase alone: `cand` is a bounded one-column frame
    * of candidate items (from [[exact]]'s batch sketch, or a STREAMING
    * sketch maintained at ingest — see
    * [[graft.streaming.StreamStats.heavyHitterCandidates]]); any item
    * not in it is assumed to fail the threshold, which the caller
    * guarantees via the sketch's k-vs-ratio precondition.
    */
  def verify(
      df: DataFrame, itemCol: String,
      cand: DataFrame, minFreqRatio: Double): DataFrame = {
    val c = cand.toDF("__item")
    val total = df.agg(count(col(itemCol)).as("__n"))
    df.join(broadcast(c), col(itemCol) === col("__item"), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt").cast("double") >
        lit(minFreqRatio) * col("__n").cast("double"))
      .select(col(itemCol), col("cnt"))
  }
}
