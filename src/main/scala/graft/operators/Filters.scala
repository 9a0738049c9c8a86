package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.core.{RangeFilter, TermFilter, TermMode}

/** Request filters -> Catalyst `Column` predicates.
  *
  * The reference evaluates filters through per-field B-tree posting lists
  * OR'd per filter and AND'd across filters
  * (reference table/field_range_index.cc:616-853, 1015-1200). Declaring the
  * same semantics as Column predicates lets Catalyst push them into the
  * parquet scan (PushedFilters) instead of materializing bitmaps.
  */
object Filters {

  /** Range filter with inclusive/exclusive bounds (P2).
    *
    * Integral bounds become long literals: comparing an integer column to a
    * DOUBLE literal makes Catalyst cast the COLUMN side, which blocks
    * parquet predicate pushdown — at 100 TB that is a full scan instead of
    * a stats-pruned one.
    */
  def range(f: RangeFilter): Column = {
    val c = col(f.field)
    def bound(v: Double): Column =
      if (v == math.floor(v) && !v.isInfinite) lit(v.toLong) else lit(v)
    val lo = f.lower.map(v => if (f.includeLower) c >= bound(v) else c > bound(v))
    val hi = f.upper.map(v => if (f.includeUpper) c <= bound(v) else c < bound(v))
    (lo, hi) match {
      case (Some(a), Some(b)) => a && b
      case (Some(a), None)    => a
      case (None, Some(b))    => b
      case (None, None)       => lit(true)
    }
  }

  /** Term filter over either an array-of-tags column (gamma's
    * `\001`-tokenized strings, reference table/field_range_index.cc:554-563)
    * or a plain string column. Union = any-of, All = all-of, NotIn =
    * complement of any-of (reference table/field_range_index.cc:1029-1058).
    */
  def term(f: TermFilter, df: DataFrame): Column = {
    val isArray = df.schema(f.field).dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    }
    val c = col(f.field)
    val vals = f.values.map(lit)
    val anyOf =
      if (isArray) arrays_overlap(c, array(vals: _*))
      else c.isin(f.values: _*)
    f.mode match {
      case TermMode.Union => anyOf
      case TermMode.NotIn => !anyOf
      case TermMode.All =>
        if (isArray) vals.map(v => array_contains(c, v)).reduce(_ && _)
        else vals.map(v => c === v).reduce(_ && _) // degenerate on scalar
    }
  }

  /** AND of all filters in a request (reference ANDs every filter,
    * table/field_range_index.cc:1015-1115) plus the live-doc predicate when
    * a `_deleted` column exists (P7).
    */
  def predicate(
      df: DataFrame,
      terms: Seq[TermFilter],
      ranges: Seq[RangeFilter]): Column = {
    val parts =
      ranges.map(range) ++
        terms.map(term(_, df)) ++
        (if (df.columns.contains("_deleted")) Seq(!col("_deleted")) else Nil)
    if (parts.isEmpty) lit(true) else parts.reduce(_ && _)
  }
}
