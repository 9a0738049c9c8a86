package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SeqPack

/** Distributed concat-and-chunk packing vs the single-partition window
  * formulation it re-expresses.
  */
class SeqPackSpec extends GraftSuite {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame, budget: Long) = {
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_offset", coalesce(sum(col("w").cast("long")).over(w), lit(0L)))
      .withColumn("pack_id", col("start_offset") / budget cast "long")
      .withColumn("pack_offset", col("start_offset") % budget)
      .select($"id", $"start_offset", $"pack_id", $"pack_offset")
  }

  test("matches the global-window formulation across partition counts") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 500).map(i => (i.toLong, rnd.nextInt(300).toLong)).toDF("id", "w")
    val expect = reference(docs, budget = 512)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    for (np <- Seq(1, 3, 32)) {
      val got = SeqPack.assign(docs, "id", "w", budget = 512, numPartitions = np)
        .select($"id", $"start_offset", $"pack_id", $"pack_offset")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got === expect, s"numPartitions=$np")
    }
  }

  test("reliable checkpoint mode matches and requires a checkpoint dir") {
    val docs = (0 until 200).map(i => (i.toLong, (i % 37).toLong)).toDF("id", "w")
    val expect = reference(docs, budget = 128)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val hadDir = spark.sparkContext.getCheckpointDir
    assert(hadDir.isEmpty)
    val e = intercept[IllegalArgumentException] {
      SeqPack.assign(docs, "id", "w", budget = 128, numPartitions = 4, reliable = true)
    }
    assert(e.getMessage.contains("setCheckpointDir"))
    val dir = java.nio.file.Files.createTempDirectory("graft-seqpack-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val got = SeqPack.assign(docs, "id", "w", budget = 128, numPartitions = 4,
          reliable = true)
        .select($"id", $"start_offset", $"pack_id", $"pack_offset")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got === expect)
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("oversized docs span packs; zero weights stay in place") {
    val docs = Seq((1L, 10L), (2L, 0L), (3L, 250L), (4L, 5L)).toDF("id", "w")
    val got = SeqPack.assign(docs, "id", "w", budget = 100, numPartitions = 2)
      .select($"id", $"start_offset", $"pack_id", $"pack_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 0L, 0L, 0L),
      (2L, 10L, 0L, 10L),   // zero-width doc sits at the running offset
      (3L, 10L, 0L, 10L),   // 250 tokens: spans packs 0..2
      (4L, 260L, 2L, 60L))) // next doc starts after the span
  }

  test("coalesced writes keep partition bases (regression: Verify coalesce(1))") {
    val rnd = new scala.util.Random(11)
    val docs = (0 until 400).map(i => (i.toLong, rnd.nextInt(100).toLong)).toDF("id", "w")
    val expect = reference(docs, budget = 256)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // coalesce(1) merges every range partition into ONE task — the base
    // lookup must follow the row's frozen pid, not the task's id
    val got = SeqPack.assign(docs, "id", "w", budget = 256, numPartitions = 8)
      .coalesce(1)
      .select($"id", $"start_offset", $"pack_id", $"pack_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === expect)
  }

  test("negative weights are rejected") {
    val docs = Seq((1L, -5L)).toDF("id", "w")
    val e = intercept[Exception] {
      SeqPack.assign(docs, "id", "w", budget = 10).collect()
    }
    assert(e.getMessage.contains("negative weight") ||
      e.getCause != null && e.getCause.getMessage.contains("negative weight"))
  }
}
