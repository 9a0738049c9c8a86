package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two columns so
  * that rows close in BOTH dimensions land close in the sort order —
  * the data-layout step that makes per-file min/max statistics prune
  * 2-D range queries (time × user, domain × length) instead of only the
  * leading sort column. At 100 TB this is the difference between a
  * full scan and touching a handful of files for a box query.
  *
  * The key is a pure per-row bit expression (statically unrolled adds
  * of disjoint bits — codegen-friendly, no UDF, no shuffle);
  * [[clusterBy]] adds the one range-repartition + in-partition sort a
  * layout rewrite inherently costs.
  */
object ZOrder {

  /** Morton key of two non-negative integer columns at `bits` bits each
    * (bit i of x lands at 2i, bit i of y at 2i+1; max 31 bits per
    * column → 62-bit key). Inputs are masked to `bits` bits, so callers
    * quantize/offset into range first.
    */
  def key2(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31] (got $bits)")
    val xm = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ym = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _) // disjoint bit positions: sum == bitwise OR
  }

  /** Rewrite `df` into `numPartitions` z-ordered range partitions,
    * sorted within each — ready for a stats-pruned parquet write. The
    * z-key is appended as `zCol` so writers/verifiers can assert the
    * layout.
    */
  def clusterBy(
      df: DataFrame, xCol: String, yCol: String, bits: Int,
      numPartitions: Int, zCol: String = "_zkey"): DataFrame = {
    val keyed = df.withColumn(zCol, key2(col(xCol), col(yCol), bits))
    keyed.repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(col(zCol))
  }
}
