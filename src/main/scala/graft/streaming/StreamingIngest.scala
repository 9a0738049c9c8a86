package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.table.GammaTable

/** Structured-Streaming ingestion into a [[GammaTable]]: each microbatch is
  * one upsert transaction, followed by incremental index maintenance in the
  * same batch — mirroring the reference where realtime adds go through the
  * engine write path and a background thread feeds the index on a 1 s
  * cadence (reference search/gamma_engine.cc:619-674, 996-1043). Spark's
  * microbatch IS that cadence, so index maintenance rides `foreachBatch`
  * instead of a thread.
  */
object StreamingIngest {

  /** Start upserting a streaming DataFrame into the table.
    *
    * @param source   streaming DataFrame with the table's schema
    * @param orderCol in-batch last-write-wins order column (R2 duplicate
    *                 resolution); dropped before storage
    * @param indexer  optional incremental indexer refreshed per batch (R5)
    */
  def start(
      source: DataFrame,
      table: GammaTable,
      orderCol: Option[String] = None,
      indexer: Option[IncrementalIndexer] = None,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = source.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          table.addOrUpdate(batch, orderCol)
          indexer.foreach(_.refresh())
        }
      }
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.start()
  }
}
