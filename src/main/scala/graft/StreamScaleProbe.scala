package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-dedup scale probe over a REAL file-source stream.
  *
  * The per-round stream gates (q_stream_dedup / q_stream_neardup) feed
  * MemoryStream from a driver-side collect — a TEST FEED that caps how far
  * they can scale, which is why the 100x oracle sweep skips them. This
  * probe drives the SAME operators through `spark.readStream.parquet` with
  * `maxFilesPerTrigger` (multiple real microbatches, no driver collect,
  * the production file-ingest shape) and validates each result against its
  * batch twin:
  *   - firstSeen: admitted digest set == corpus distinct digest set,
  *     exactly one admit per digest (keeper identity needs id-ordered
  *     replay, which an unordered file stream does not promise — set
  *     semantics are the arrival-order-independent contract);
  *   - nearDupPairs: verified pair set after the contract's sink distinct
  *     == batch minhashPairs (arrival-order independent by design).
  *
  * Usage: runMain graft.StreamScaleProbe [dir] [maxFilesPerTrigger]
  * Emits one JSON line; exit code 1 on any contract violation.
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val filesPerTrigger = if (args.length > 1) args(1).toInt else 2
    val spark = graft.core.GraftSession.local(32, "graft-streamscale")
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val docsPath = s"$dir/documents.parquet"
    val schema = spark.read.parquet(docsPath).schema
    val batch = spark.read.parquet(docsPath)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val nDocs = batch.count()

    def streamDocs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(docsPath)
      .select(col("doc_id"), col("text"))

    def runStream(name: String)(build: => org.apache.spark.sql.DataFrame)
        : (Long, Double) = {
      val t0 = System.nanoTime()
      val q = build.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val batches = q.recentProgress.map(_.batchId).distinct.length.toLong
      (batches, (System.nanoTime() - t0) / 1e9)
    }

    // 1) exact dedup at ingest
    val (b1, s1) = runStream("ssp_firstseen") {
      graft.streaming.StreamDedup.firstSeen(streamDocs, "doc_id", "text")
        .toDF("digest", "keeper")
    }
    val got1 = spark.table("ssp_firstseen").localCheckpoint(true)
    val want1 = batch.select(md5(col("text")).as("digest")).distinct()
      .localCheckpoint(true)
    val rows1 = got1.count()
    val missing = want1.except(got1.select("digest")).count()
    val extra = got1.select("digest").except(want1).count()
    val dupAdmits = got1.groupBy("digest").count()
      .filter(col("count") > 1).count()
    val ok1 = missing == 0 && extra == 0 && dupAdmits == 0

    // 2) near-dup pairs at ingest vs the batch operator
    val t0b = System.nanoTime()
    val batchPairs = graft.dedup.Dedup
      .minhashPairs(batch, "doc_id", "text", threshold = 0.5)
      .select(col("a"), col("b")).localCheckpoint(true)
    val batchSec = (System.nanoTime() - t0b) / 1e9
    val nBatchPairs = batchPairs.count()
    val (b2, s2) = runStream("ssp_neardup") {
      graft.streaming.StreamDedup
        .nearDupPairs(streamDocs, batch, "doc_id", "text", threshold = 0.5)
    }
    val got2 = spark.table("ssp_neardup").select(col("a"), col("b"))
      .distinct().localCheckpoint(true)
    val nStreamPairs = got2.count()
    val onlyStream = got2.except(batchPairs).count()
    val onlyBatch = batchPairs.except(got2).count()
    val ok2 = onlyStream == 0 && onlyBatch == 0

    // 3) heavy-hitter sketch at ingest (complete-mode O(k) state),
    //    exact recount at rest — result must equal the batch operator
    //    regardless of file arrival order (mergeable-summary bound)
    val item = when(col("doc_id") % 2 === 0,
      concat(lit("host-"), (col("doc_id") % 7).cast("string")))
      .otherwise(concat(lit("host-"), col("doc_id").cast("string"))).as("item")
    val t0c = System.nanoTime()
    val q3 = graft.streaming.StreamStats
      .heavyHitterCandidates(streamDocs.select(item), "item", k = 128)
      .writeStream.format("memory").queryName("ssp_heavy")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination()
    val b3 = q3.recentProgress.map(_.batchId).distinct.length.toLong
    val s3 = (System.nanoTime() - t0c) / 1e9
    val cand = spark.table("ssp_heavy")
      .select(explode(map_keys(col("items"))).as("c")).localCheckpoint(true)
    val nCand = cand.count()
    val itemsDf = batch.select(item)
    val gotHH = graft.text.HeavyHitters
      .verify(itemsDf, "item", cand, minFreqRatio = 0.01)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val wantHH = graft.text.HeavyHitters
      .exact(itemsDf, "item", minFreqRatio = 0.01, k = 128)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val ok3 = gotHH == wantHH && wantHH.nonEmpty

    val line =
      s"""{"dir":"$dir","docs":$nDocs,"files_per_trigger":$filesPerTrigger,""" +
        s""""firstseen":{"batches":$b1,"sec":$s1,"admitted":$rows1,""" +
        s""""missing":$missing,"extra":$extra,"dup_admits":$dupAdmits,"ok":$ok1},""" +
        s""""neardup":{"batches":$b2,"sec":$s2,"pairs":$nStreamPairs,""" +
        s""""batch_pairs":$nBatchPairs,"batch_sec":$batchSec,""" +
        s""""only_stream":$onlyStream,"only_batch":$onlyBatch,"ok":$ok2},""" +
        s""""heavy":{"batches":$b3,"sec":$s3,"candidates":$nCand,""" +
        s""""hitters":${wantHH.size},"ok":$ok3}}"""
    println(line)
    spark.stop()
    if (!(ok1 && ok2 && ok3)) sys.exit(1)
  }
}
