package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: pre-aggregate under a deterministic salt,
  * then merge per group.
  *
  * Scale rationale: a plain `groupBy(key)` over 100 TB with a hot key
  * funnels that key's entire volume through ONE reducer — the classic
  * skew straggler. Salting splits each group into `buckets` sub-groups
  * for the first (map-side-combining) aggregation, so the wide shuffle
  * is uniform; the second aggregation merges only `groups x buckets`
  * partial rows. Sum/count/min/max are associative, so the result is
  * IDENTICAL to the unsalted plan (the q_agg_salted oracle is the plain
  * GROUP BY).
  *
  * The salt must be deterministic (a hash of a high-cardinality column),
  * not `rand()` — retries/speculative tasks must land rows in the same
  * sub-group.
  */
object SkewAgg {

  /** Salted sum+count per group key. `saltFrom` is any high-cardinality
    * column; `buckets` bounds the per-key fan-out (set ~ number of
    * executor slots a hot key should spread over).
    */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      saltFrom: String,
      buckets: Int = 16): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    df.withColumn("__salt", pmod(xxhash64(col(saltFrom)), lit(buckets.toLong)))
      .groupBy((keys :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys: _*)
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("cnt"))
  }
}
