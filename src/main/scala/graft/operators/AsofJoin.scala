package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal point-in-time) join: for every left row, the single
  * latest right row whose timestamp is <= (backward, inclusive) or <
  * (backward, strict) the left row's timestamp, within equal join keys.
  * The staple for "attach the most recent prior state" lookups — last
  * view before a click, last quote before a trade, last config before an
  * event — which plain SQL can only express as an inequality join plus a
  * per-left-row argmax.
  *
  * Spark has no as-of join operator; the naive encodings are either a
  * BroadcastNestedLoopJoin on the inequality (O(|L|·|R|) comparisons) or
  * an equi-join on key that inflates to every (left, earlier-right) pair
  * before a window prunes it. This operator is the UNION-AND-SWEEP shape
  * instead: tag both sides, union, and run one running `last(right_payload,
  * ignoreNulls)` window over (key) ordered by (ts, side, tie) — each left
  * row reads the nearest preceding right payload in O(1) per row.
  *
  * Scale design: ONE hash Exchange on the join keys over the union (the
  * same data movement a sort-merge equi-join pays), then a per-partition
  * sort; the running `last` carries O(1) state — no per-row lookback, no
  * intermediate inflation (output is exactly |left| rows). Skewed keys
  * behave like any keyed window (one task per hot key); at 100 TB the
  * move is salting the key and as-of-joining per salt when the right side
  * is replicable.
  *
  * Determinism: among right rows tied on (key, ts) the greatest `rightTie`
  * wins (window order is tie-ascending, `last` takes the final one); left
  * rows never need an intra-order because every left row at a given ts
  * sees the same right prefix.
  */
object AsofJoin {

  /** Backward as-of join (the common direction): latest rightTs <= leftTs. */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightTie: String,
      rightCols: Seq[(String, String)],
      inclusive: Boolean = true): DataFrame =
    asof(left, right, on, leftTs, rightTs, rightTie, rightCols,
      forward = false, inclusive = inclusive, tolerance = None)

  /** Forward as-of join: EARLIEST rightTs >= leftTs — "the next purchase
    * after this click" attribution shape.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightTie: String,
      rightCols: Seq[(String, String)],
      inclusive: Boolean = true): DataFrame =
    asof(left, right, on, leftTs, rightTs, rightTie, rightCols,
      forward = true, inclusive = inclusive, tolerance = None)

  /** General as-of join (the pandas merge_asof surface).
    *
    * @param on        equi-join key column names (present on both sides)
    * @param leftTs    left timestamp/ordering column (any orderable type,
    *                  must match the right column's type)
    * @param rightTs   right timestamp/ordering column
    * @param rightTie  right tie-break column — greatest wins among rows
    *                  tied on (key, ts)
    * @param rightCols (rightColumn, outputName) pairs appended to every
    *                  left row; null when no right row qualifies
    * @param forward   false: latest rightTs <= leftTs; true: earliest
    *                  rightTs >= leftTs
    * @param inclusive false makes the bound strict (< / >)
    * @param tolerance max |leftTs - rightTs| for a match to stand, in
    *                  MICROSECONDS for timestamp columns and raw units for
    *                  numeric ones; the nearest-row match is nulled out
    *                  when it falls beyond the tolerance (merge_asof
    *                  semantics — no fallback to the second-nearest)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightTie: String,
      rightCols: Seq[(String, String)],
      forward: Boolean = false,
      inclusive: Boolean = true,
      tolerance: Option[Long] = None): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equi-key")
    val keyCols = on.map(col)

    // side ordering encodes the bound: inclusive puts right rows BEFORE
    // left rows at equal ts (visible to them), strict puts them after
    val (rightSide, leftSide) = if (inclusive) (0, 1) else (1, 0)

    // the matched right ts rides inside the payload for the tolerance
    // check; __asof_ts is internal and never reaches the output
    val rPayload = struct(
      col(rightTs).as("__asof_ts") +:
        rightCols.map { case (c, o) => col(c).as(o) }: _*)
    val rPrep = right
      .select(keyCols ++ Seq(
        col(rightTs).as("__ts"),
        col(rightTie).as("__tie"),
        rPayload.as("__r")): _*)
      .withColumn("__side", lit(rightSide))
    val rType = rPrep.schema("__r").dataType
    val tieType = rPrep.schema("__tie").dataType

    val lPrep = left
      .select(keyCols ++ Seq(
        col(leftTs).as("__ts"),
        lit(null).cast(tieType).as("__tie"),
        lit(null).cast(rType).as("__r"),
        struct(left.columns.map(col): _*).as("__l")): _*)
      .withColumn("__side", lit(leftSide))

    val union = lPrep.unionByName(rPrep.withColumn(
      "__l", lit(null).cast(lPrep.schema("__l").dataType)))

    // backward sweeps time ascending; forward sweeps descending, so the
    // nearest FUTURE right row is the last one seen before each left row.
    // Ties on (key, ts, side) stay tie-ascending: `last` picks the
    // greatest rightTie in both directions.
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(tsOrder, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // |leftTs - rightTs| as exact int64 — micros for timestamps, raw
    // units for numerics (the double cast a `-` on mixed types would
    // pick could round at the tolerance edge)
    def asLong(c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => unix_micros(c)
      case _ => c.cast("long")
    }
    val tsType = lPrep.schema("__ts").dataType

    val matched = union
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === lit(leftSide))
    val gated = tolerance match {
      case None => matched
      case Some(tol) =>
        matched.withColumn("__m",
          when(col("__m").isNotNull &&
            abs(asLong(col("__ts"), tsType) -
              asLong(col("__m").getField("__asof_ts"), tsType)) <= lit(tol),
            col("__m")))
    }
    gated.select(col("__l.*") +: rightCols.map { case (_, o) =>
      col("__m").getField(o).as(o)
    }: _*)
  }

  /** Nearest as-of join — the third pandas merge_asof direction: each
    * left row takes the right row whose ts is closest in ABSOLUTE
    * distance (ties between an equally-near earlier and later row go to
    * the earlier/backward one, matching pandas). Same key-tagged
    * union-and-sweep as [[asof]], but the union is swept TWICE — one
    * running-`last` window per direction — over the SAME keyed
    * partitioning, so the plan pays exactly one hashpartitioning
    * Exchange (two Sorts reuse it); the pick between the two candidates
    * is a per-row exact-int64 distance comparison, no further movement.
    *
    * `inclusive=false` excludes exact-ts matches from BOTH directions
    * (pandas `allow_exact_matches=False`). `tolerance` nulls the chosen
    * nearest match when its |delta| exceeds the bound (micros for
    * timestamps, raw units for numerics) — merge_asof semantics: no
    * fallback to the other direction's candidate.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightTie: String,
      rightCols: Seq[(String, String)],
      inclusive: Boolean = true,
      tolerance: Option[Long] = None): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equi-key")
    val keyCols = on.map(col)
    // right-before-left at equal ts makes the exact match visible to the
    // sweep in BOTH directions (side order is direction-independent)
    val (rightSide, leftSide) = if (inclusive) (0, 1) else (1, 0)

    val rPayload = struct(
      col(rightTs).as("__asof_ts") +:
        rightCols.map { case (c, o) => col(c).as(o) }: _*)
    val rPrep = right
      .select(keyCols ++ Seq(
        col(rightTs).as("__ts"),
        col(rightTie).as("__tie"),
        rPayload.as("__r")): _*)
      .withColumn("__side", lit(rightSide))
    val rType = rPrep.schema("__r").dataType
    val tieType = rPrep.schema("__tie").dataType

    val lPrep = left
      .select(keyCols ++ Seq(
        col(leftTs).as("__ts"),
        lit(null).cast(tieType).as("__tie"),
        lit(null).cast(rType).as("__r"),
        struct(left.columns.map(col): _*).as("__l")): _*)
      .withColumn("__side", lit(leftSide))

    val union = lPrep.unionByName(rPrep.withColumn(
      "__l", lit(null).cast(lPrep.schema("__l").dataType)))

    def sweep(forward: Boolean) = Window
      .partitionBy(keyCols: _*)
      .orderBy(if (forward) col("__ts").desc else col("__ts").asc,
        col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def asLong(c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => unix_micros(c)
      case _ => c.cast("long")
    }
    val tsType = lPrep.schema("__ts").dataType
    def delta(m: Column): Column =
      abs(asLong(col("__ts"), tsType) - asLong(m.getField("__asof_ts"), tsType))

    val matched = union
      .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(sweep(forward = false)))
      .withColumn("__mf", last(col("__r"), ignoreNulls = true).over(sweep(forward = true)))
      .filter(col("__side") === lit(leftSide))
      // tie in absolute distance -> backward, per pandas
      .withColumn("__m",
        when(col("__mb").isNull, col("__mf"))
          .when(col("__mf").isNull, col("__mb"))
          .when(delta(col("__mb")) <= delta(col("__mf")), col("__mb"))
          .otherwise(col("__mf")))
    val gated = tolerance match {
      case None => matched
      case Some(tol) =>
        matched.withColumn("__m",
          when(col("__m").isNotNull && delta(col("__m")) <= lit(tol), col("__m")))
    }
    gated.select(col("__l.*") +: rightCols.map { case (_, o) =>
      col("__m").getField(o).as(o)
    }: _*)
  }
}
