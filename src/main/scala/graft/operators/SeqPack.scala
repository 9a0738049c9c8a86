package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-sequence packing (beyond-reference LLM-pipeline op): lay the
  * corpus out as one token stream in `idCol` order and chunk it into
  * fixed-`budget` sequences — GPT-style concat-and-chunk. Each doc gets
  * its global `start_offset`, the `pack_id` (= start_offset / budget) of
  * the sequence its first token lands in, and the `pack_offset` within it;
  * a doc longer than the remaining room simply spans into the next
  * sequence(s), exactly like the flattened-stream formulation.
  *
  * Scale design: the textbook global running sum (`sum OVER (ORDER BY
  * id)`) collapses Spark into ONE partition — a non-starter at 100 TB.
  * This is instead the classic distributed scan: range-partition by id
  * (materialized ONCE so both passes see the same partitioning — range
  * boundaries are sampled, so re-planning could silently change them
  * between passes), then (1) per-partition weight totals -> exclusive
  * prefix base per partition (numPartitions rows on the driver), and
  * (2) one map pass adding base + local running sum. O(data) work, two
  * distributed passes, nothing driver-side beyond the partition totals.
  */
object SeqPack {

  /** Appends `start_offset`, `pack_id`, `pack_offset` to `df`. `weightCol`
    * is the doc's token (or other unit) count — non-negative, cast to
    * long. The result is deterministic in (`idCol` total order, weights)
    * and independent of the partition count.
    *
    * `reliable = true` materializes the range-partitioned pass to the
    * cluster's checkpoint directory (`sparkContext.setCheckpointDir`)
    * instead of executor-local storage: a localCheckpoint dies with its
    * executor, and on a 1000-executor run losing ONE executor between the
    * two passes would otherwise recompute that partition under a possibly
    * different sampled range partitioning — exactly the silent-drift this
    * operator freezes the partition id to prevent. Local mode keeps the
    * cheap default.
    */
  def assign(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      budget: Long,
      numPartitions: Int = 0,
      reliable: Boolean = false): DataFrame = {
    require(budget > 0, s"budget must be positive (got $budget)")
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // the range-partition id is FROZEN INTO THE DATA at materialization:
    // a task-side TaskContext.getPartitionId() would lie as soon as a
    // downstream coalesce() merges several range partitions into one task
    // (each merged chunk would claim partition 0 and take the wrong base)
    val pidCol = "__sp_pid"
    require(!df.columns.contains(pidCol), s"column $pidCol is reserved")
    if (reliable) require(spark.sparkContext.getCheckpointDir.isDefined,
      "SeqPack.assign(reliable=true) needs sparkContext.setCheckpointDir " +
        "(a fault-tolerant location both passes can re-read)")
    val staged = df.repartitionByRange(n, col(idCol))
      .sortWithinPartitions(idCol)
      .withColumn(pidCol, spark_partition_id())
    val parted =
      if (reliable) staged.checkpoint(eager = true)
      else staged.localCheckpoint(true)

    // pass 1: per-partition totals — numPartitions rows, driver-side scan
    val totals = parted
      .groupBy(pidCol).agg(sum(col(weightCol).cast("long")).as("t"))
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    val base = new Array[Long](n)
    var acc = 0L
    (0 until n).foreach { p => base(p) = acc; acc += totals.getOrElse(p, 0L) }

    // pass 2: partition base + local running sum; pid transitions (several
    // range partitions streaming through one coalesced task) re-seed the
    // running offset from the next partition's base
    val bc = spark.sparkContext.broadcast(base)
    val wIdx = parted.schema.fieldIndex(weightCol)
    val pidIdx = parted.schema.fieldIndex(pidCol)
    val outSchema = org.apache.spark.sql.types.StructType(
      parted.schema.filterNot(_.name == pidCol))
      .add("start_offset", LongType, nullable = false)
      .add("pack_id", LongType, nullable = false)
      .add("pack_offset", LongType, nullable = false)
    val b = budget
    parted.mapPartitions { rows =>
      var curPid = -1
      var off = 0L
      rows.map { r =>
        val pid = r.getInt(pidIdx)
        if (pid != curPid) { curPid = pid; off = bc.value(pid) }
        val w = r.get(wIdx) match {
          case null       => 0L
          case x: Number  => x.longValue()
          case other      => throw new IllegalArgumentException(
            s"non-numeric weight $other")
        }
        if (w < 0) throw new IllegalArgumentException(s"negative weight $w")
        val start = off
        off += w
        Row.fromSeq(r.toSeq.patch(pidIdx, Nil, 1) :+ start :+ (start / b) :+ (start % b))
      }
    }(Encoders.row(outSchema))
  }
}
