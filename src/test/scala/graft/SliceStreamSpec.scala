package graft

import org.apache.spark.sql.functions._

/** r15 (verdict #5): an id range with no rows must still produce its
  * slice — one schema-only parquet file, hence one (empty) microbatch
  * under maxFilesPerTrigger=1 — matching the old per-slice writer
  * instead of silently dropping the slice.
  */
class SliceStreamSpec extends GraftSuite {
  import spark.implicits._

  test("empty id range keeps its slice dir and batch count") {
    // ids 0-9 and 20-29: with nSlices=3 (step 10) slice 1 is empty
    val df = ((0L until 10L) ++ (20L until 30L)).toDF("id")
      .withColumn("v", col("id") * 2)
    val src = SparkEntry.sliceStream(spark, df, "id", 3)
    // one data file per slice => one microbatch per slice (the old
    // per-slice writer's shape) under maxFilesPerTrigger=1
    val sink = s"slice_spec_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = src.groupBy().count().writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.batchId >= 0)
    // exactly 3 microbatches: slices 0 and 2 carry 10 rows each, the
    // empty slice 1 still triggers one zero-row batch
    val inputRows = batches.map(_.numInputRows.toLong).toSeq
    assert(inputRows.count(_ > 0L) == 2, s"got $inputRows")
    assert(inputRows.length == 3, s"expected 3 microbatches, got $inputRows")
    assert(spark.table(sink).as[Long].head() == 20L)
  }
}
