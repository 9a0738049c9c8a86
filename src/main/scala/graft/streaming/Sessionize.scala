package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization of an event stream — a training-data pipeline
  * staple (the reference has no session concept; this is part of the
  * beyond-the-reference operator set, like dedup and text scoring).
  *
  * Two shapes with IDENTICAL results on complete data:
  *  - [[batch]]: lag/running-sum window algebra (oracle-checkable SQL);
  *  - [[streaming]]: `flatMapGroupsWithState` with event-time timeouts —
  *    per-key open-session state, sessions emitted closed when the gap
  *    passes or the watermark moves beyond session end + gap.
  *
  * Scale design: batch is two window passes over (key)-partitioned data —
  * one shuffle; streaming state is O(open sessions), one small struct per
  * active key, timed out by the watermark so state never grows unbounded.
  */
object Sessionize {

  case class Event(key: Long, us: Long, tie: Long, value: Double)
  case class SessionState(startUs: Long, endUs: Long, n: Long, sum: Double)
  case class Session(
      key: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, sum_value: Double)

  /** Batch: new session when the gap to the previous event (per key,
    * ordered by time with a deterministic tie-break) exceeds `gapSeconds`.
    * Output one row per (key, session ordinal).
    */
  def batch(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      gapSeconds: Long): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"), col(tieCol))
    // unix_micros only accepts TIMESTAMP (LTZ); a TIMESTAMP_NTZ input
    // (e.g. parquet micros with isAdjustedToUTC=false) is measured from
    // the NTZ epoch instead — same naive micros, session-tz-independent.
    val usExpr = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        expr(s"timestampdiff(MICROSECOND, " +
          s"TIMESTAMP_NTZ '1970-01-01 00:00:00', `$tsCol`)")
      case _ => unix_micros(col(tsCol))
    }
    events
      .withColumn("__us", usExpr)
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col("__us")).as("session_start_us"),
        max(col("__us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sum_value"))
  }

  /** Streaming: one open-session state per key; closed sessions are
    * emitted as soon as a later in-key event exceeds the gap, and the
    * final open session is flushed by an event-time timeout once the
    * watermark passes session end + gap. In-batch events are sorted by
    * (time, tie); cross-batch ordering relies on the watermark as usual.
    */
  def streaming(
      events: Dataset[Event],
      gapSeconds: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    def close(key: Long, s: SessionState): Session =
      Session(key, s.startUs, s.endUs, s.n,
        BigDecimal(s.sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)

    events
      .withColumn("__ts", timestamp_micros(col("us")))
      .withWatermark("__ts", watermarkDelay)
      .as[(Long, Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Long, Double, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut || rows.isEmpty) {
            // watermark passed end+gap: flush the open session
            val out = state.getOption.map(close(key, _))
            state.remove()
            out.iterator
          } else {
            val evs = rows.toArray.sortBy(e => (e._2, e._3))
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur = state.getOption
            evs.foreach { e =>
              cur match {
                case Some(s) if e._2 - s.endUs <= gapUs =>
                  // min on start: a late-but-admitted event (within the
                  // watermark) may PRECEDE the open session's start; the
                  // session must cover every event it counts
                  cur = Some(SessionState(math.min(s.startUs, e._2),
                    math.max(s.endUs, e._2), s.n + 1, s.sum + e._4))
                case Some(s) =>
                  closed += close(key, s)
                  cur = Some(SessionState(e._2, e._2, 1, e._4))
                case None =>
                  cur = Some(SessionState(e._2, e._2, 1, e._4))
              }
            }
            state.update(cur.get)
            state.setTimeoutTimestamp((cur.get.endUs + gapUs) / 1000L + 1L)
            closed.iterator
          }
      }
  }
}
