package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful exact dedup of a DOCUMENT STREAM — the ingest-time half of the
  * batch dedup family (dedup/Dedup.scala): a digest is admitted the first
  * microbatch it appears in and suppressed forever after. This is the
  * standing de-duplication stage of a training-data ingestion pipeline
  * (dedupe-before-store), where the batch operators are the
  * dedupe-at-rest pass.
  *
  * Scale design: state is ONE small entry per distinct digest keyed by the
  * digest itself, so the state store partitions by digest hash and grows
  * with |distinct docs|, not |stream|; at 100 TB run it on the RocksDB
  * state store provider and feed digests, never raw text, through the
  * shuffle. For time-bounded streams prefer [[withinWatermark]], which
  * drops state once the watermark passes (bounded memory, the usual
  * trade: re-admits a dup that arrives later than the delay).
  */
object StreamDedup {

  /** One row per first-seen digest: `(digest, keeper, ...carried cols)`.
    *
    * Deterministic keeper contract: within the FIRST microbatch containing
    * a digest, the minimum id wins (the group iterator sees the whole
    * batch's group, so this is exact per batch). When upstream delivers
    * batches in ascending id order — an ingest log replay — the keeper is
    * the GLOBAL minimum id, i.e. exactly the batch operator's
    * `Dedup.exactGroups` keeper.
    *
    * Built on `flatMapGroupsWithState` rather than the built-in
    * `dropDuplicates` because the latter keeps an ARBITRARY row per key
    * within a batch; a dedup stage whose keeper changes run to run cannot
    * be oracle-checked (nor audited in production).
    */
  def firstSeen(stream: DataFrame, idCol: String, textCol: String): Dataset[(String, Long)] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(md5(col(textCol)).as("digest"), col(idCol).cast("long").as("id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (digest: String, rows: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator((digest, rows.map(_._2).min))
          }
      }
  }

  /** Watermark-bounded dedup via the built-in operator: admits the first
    * arrival per digest and drops that digest's state once the event-time
    * watermark passes `delay` — bounded state for unbounded streams.
    */
  def withinWatermark(
      stream: DataFrame, textCol: String,
      eventTimeCol: String, delay: String): DataFrame =
    stream
      .withColumn("digest", md5(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("digest")
}
