package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Content-defined chunking: the boundary rule is local, so chunkings
  * re-synchronize after edits — the property that makes chunk-level
  * dedup shift-robust where fixed-size chunking is not.
  */
class CdcChunkSpec extends GraftSuite {
  import spark.implicits._

  private val vocab = Seq("scan", "sort", "merge", "hash", "join", "row",
    "key", "data", "fast", "slow", "table", "query", "batch", "window")
  private def salad(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
  }

  private def chunksOf(rows: Seq[(Long, String)]) =
    TextOps.cdcChunks(rows.toDF("doc_id", "text"), "doc_id", "text",
      window = 3, mask = 8)

  test("chunks tile the document: n_tok sums to the token count") {
    val text = salad(1, 200)
    val out = chunksOf(Seq((1L, text)))
      .agg(sum("n_tok"), count(lit(1))).as[(Long, Long)].head()
    assert(out._1 === 200L)
    assert(out._2 > 5L, "mask=8 over 200 tokens must cut several chunks")
  }

  test("prefix insertion re-synchronizes: the tail chunking is identical") {
    val text = salad(2, 300)
    val base = chunksOf(Seq((1L, text)))
      .orderBy("chunk_idx").select("chunk_hash").as[Long].collect().toSeq
    val shifted = chunksOf(Seq((2L, "inserted prefix goes here " + text)))
      .orderBy("chunk_idx").select("chunk_hash").as[Long].collect().toSeq
    // every base boundary inside the doc persists under a prefix shift,
    // so base chunks after the first boundary are a SUFFIX of the
    // shifted chunking
    val tail = base.drop(1)
    assert(tail.nonEmpty)
    assert(shifted.takeRight(tail.length) === tail,
      s"tail not preserved: base=$base shifted=$shifted")
    // while a fixed-size chunking of the shifted doc shares (almost) no
    // chunk hashes with the base — quantify the contrast
    def fixedHashes(t: String): Seq[String] =
      t.split(" ").grouped(8).map(_.mkString(" ")).toSeq
    val f1 = fixedHashes(text)
    val f2 = fixedHashes("inserted prefix goes here " + text).toSet
    val fixedShared = f1.count(f2)
    assert(fixedShared <= 1, s"fixed chunking unexpectedly aligned: $fixedShared")
    val cdcShared = base.count(shifted.toSet)
    assert(cdcShared >= base.length - 1)
  }

  test("edit in the middle only disturbs a bounded neighborhood") {
    val words = salad(3, 300).split(" ")
    val edited = (words.take(150) ++ Seq("EDITED", "TOKENS") ++ words.drop(152)).mkString(" ")
    val base = chunksOf(Seq((1L, words.mkString(" "))))
      .select("chunk_hash").as[Long].collect().toSet
    val ed = chunksOf(Seq((2L, edited)))
      .select("chunk_hash").as[Long].collect().toSet
    // shared mass stays high: only chunks overlapping the edit window change
    val lost = (base -- ed).size
    assert(lost <= 3, s"edit disturbed $lost chunks of ${base.size}")
  }

  test("near-dup pairs: shared-suffix docs pair; boilerplate chunks can't") {
    val shared = salad(8, 80)
    val boiler = "common footer text repeated in every doc"
    val rows = (1L to 12L).map { i =>
      (i, salad(100 + i.toInt, 60) + " " + boiler +
        (if (i <= 2) " " + shared else ""))
    }
    val pairs = TextOps.cdcNearDupPairs(chunksOf(rows), "doc_id",
        minShared = 3, maxDf = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"shared-suffix pair missing: $pairs")
    // the 12-doc boilerplate chunk exceeds maxDf=5 and cannot create pairs
    // among the other 10 docs
    assert(pairs.forall { case (a, b) => a <= 2 && b <= 2 },
      s"boilerplate leaked pairs: $pairs")
  }

  test("dup-chunk report finds planted shared chunks across docs") {
    val shared = salad(4, 60)
    val rows = Seq(
      (1L, salad(5, 80) + " " + shared),
      (2L, salad(6, 90) + " " + shared),
      (3L, salad(7, 70)))
    val dup = TextOps.cdcDupChunks(chunksOf(rows), "doc_id")
      .select("n_docs").as[Long].collect()
    assert(dup.nonEmpty, "planted shared suffix must yield duplicated chunks")
    assert(dup.forall(_ >= 2))
  }
}
