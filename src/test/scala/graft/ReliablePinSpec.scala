package graft

import org.apache.spark.sql.functions._

/** r15: the `reliable` fault-tolerant-checkpoint option threaded through
  * the r14 pin sites (GateVerdicts, minhashPairs, TextIndex) — option
  * exists, default unchanged, both modes produce identical results, and
  * reliable mode fails fast without a checkpoint dir.
  */
class ReliablePinSpec extends GraftSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "pack my box with five dozen liquor jugs"),
    (4L, "pack my box with five dozen liquor mugs"),
    (5L, "completely unrelated text about spark optimization")
  ).toDF("id", "text")

  test("reliable=true fails fast without a checkpoint dir") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val approx = Seq((0L, 1L), (0L, 2L)).toDF("qid", "id")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.GateVerdicts.knnVerdict(
        spark, approx, approx, k = 2, recallFloorMilli = 900, reliable = true)
    }
    assert(e1.getMessage.contains("setCheckpointDir"))
    val e2 = intercept[IllegalArgumentException] {
      graft.dedup.Dedup.minhashPairs(docs, "id", "text", 0.4, reliable = true)
    }
    assert(e2.getMessage.contains("setCheckpointDir"))
    val e3 = intercept[IllegalArgumentException] {
      graft.text.TextIndex.build(docs, "id", "text", reliable = true)
    }
    assert(e3.getMessage.contains("setCheckpointDir"))
  }

  test("reliable mode matches the default on every threaded site") {
    val dir = java.nio.file.Files.createTempDirectory("graft_reliable").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      // minhashPairs
      val p0 = graft.dedup.Dedup.minhashPairs(docs, "id", "text", 0.4)
        .collect().toSet
      val p1 = graft.dedup.Dedup.minhashPairs(docs, "id", "text", 0.4,
        reliable = true).collect().toSet
      assert(p0 == p1 && p0.nonEmpty)
      // GateVerdicts
      val approx = Seq((0L, 1L), (0L, 2L)).toDF("qid", "id")
      val v0 = graft.operators.GateVerdicts.knnVerdict(
        spark, approx, approx, k = 2, recallFloorMilli = 900).collect().toSet
      val v1 = graft.operators.GateVerdicts.knnVerdict(
        spark, approx, approx, k = 2, recallFloorMilli = 900,
        reliable = true).collect().toSet
      assert(v0 == v1)
      // TextIndex stats pin + positional postings pin
      val ix0 = graft.text.TextIndex.build(docs, "id", "text")
      val ix1 = graft.text.TextIndex.build(docs, "id", "text", reliable = true)
      val q = Seq((0L, "quick brown fox")).toDF("qid", "qtext")
      val b0 = graft.text.TextIndex.bm25(ix0, q, "qid", "qtext", 3).collect().toSet
      val b1 = graft.text.TextIndex.bm25(ix1, q, "qid", "qtext", 3).collect().toSet
      assert(b0 == b1 && b0.nonEmpty)
      val ph = Seq((0L, "quick brown fox")).toDF("qid", "qphrase")
      val s0 = graft.text.TextIndex.phraseSearch(docs, "id", "text", ph,
        "qid", "qphrase", 3).collect().toSet
      val s1 = graft.text.TextIndex.phraseSearch(docs, "id", "text", ph,
        "qid", "qphrase", 3, reliable = true).collect().toSet
      assert(s0 == s1 && s0.nonEmpty)
      val x0 = graft.text.TextIndex.proximitySearch(docs, "id", "text", ph,
        "qid", "qphrase", 4, 3).collect().toSet
      val x1 = graft.text.TextIndex.proximitySearch(docs, "id", "text", ph,
        "qid", "qphrase", 4, 3, reliable = true).collect().toSet
      assert(x0 == x1 && x0.nonEmpty)
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("sharedToks frames are shape-asserted (fail fast on a mismatch)") {
    val bad = Seq((1L, "not a toks array")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.dedup.Dedup.minhashPairs(docs, "id", "text", 0.4,
        sharedToks = Some(bad))
    }
    assert(e.getMessage.contains("withShingles"))
    val e2 = intercept[IllegalArgumentException] {
      graft.dedup.Dedup.ngramJaccardPairs(docs, "id", "text", 0.4,
        sharedToks = Some(bad))
    }
    assert(e2.getMessage.contains("withShingles"))
  }
}
