package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: points joined to every range [start, end] that
  * contains them, with optional equi-keys. The pipeline staple behind
  * "events inside campaign windows", "reads inside gene intervals",
  * "ticks inside trading halts".
  *
  * Spark plans a bare inequality join as BroadcastNestedLoopJoin (or a
  * cartesian product when neither side fits in memory) — O(|P|·|R|)
  * comparisons that no cluster size rescues at 100 TB. This operator bins
  * the domain instead: a range covers the consecutive bins
  * [bin(start), bin(end)], a point lives in exactly ONE bin, so
  * point-bin = range-bin is a plain equi-join that sees every true match
  * exactly once (bin() is monotone, so start <= p <= end implies
  * bin(start) <= bin(p) <= bin(end)) — no post-join dedup needed. The
  * residual BETWEEN predicate prunes same-bin non-matches.
  *
  * Scale design: one hash Exchange per side on (keys, bin) — sort-merge
  * or AQE-broadcast like any equi-join, never a nested loop (PlanSpec
  * asserts this). The only inflation is the range side's bin fan-out,
  * ~(range length / binWidth) + 1 rows per range: pick binWidth near the
  * TYPICAL range length and the fan-out is a small constant. Binning is
  * exact int64 arithmetic (`div`) — no double rounding at the bin edges.
  */
object RangeJoin {

  /** Inner range join of `points` into `ranges` over long-valued columns
    * (timestamps as epoch micros, positions, etc.).
    *
    * @param on       extra equi-key column names present on both sides
    * @param pointCol long column on `points`
    * @param startCol long column on `ranges` (inclusive lower bound)
    * @param endCol   long column on `ranges` (inclusive upper bound);
    *                 rows with end < start match nothing
    * @param binWidth bin size in the value's units; choose near the
    *                 typical range length (fan-out ≈ len/binWidth + 1)
    */
  def binned(
      points: DataFrame,
      ranges: DataFrame,
      on: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet
      .intersect(ranges.columns.toSet) -- on.toSet
    require(overlap.isEmpty,
      s"non-key columns present on both sides: ${overlap.mkString(", ")}")

    // `div` is exact int64 division — identical (monotone) binning on both
    // sides is all correctness needs; a double `/` could round a bin edge
    val pb = points.withColumn("__bin", expr(s"`$pointCol` div ${binWidth}L"))
    val rb = ranges
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bin", explode(sequence(
        expr(s"`$startCol` div ${binWidth}L"),
        expr(s"`$endCol` div ${binWidth}L"))))

    pb.join(rb, on :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
