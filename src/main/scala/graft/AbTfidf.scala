package graft

import org.apache.spark.sql.functions._

/** A/B measurement for q_tfidf_keywords' per-doc top-k shape at scale
  * (round-8 verdict item: the ObjectHashAggregate sort-based fallback was
  * the slowest flagship gate at 1000x — 80 s for 250M postings / 5M
  * groups; this tool measures the heap aggregate against the pure
  * sort-shape TopK.perGroupSorted on the same scored postings and checks
  * the results are identical).
  *
  * Usage: runMain graft.AbTfidf [sfDir] [k] [reps]
  * Emits one JSON line with per-shape seconds (median of reps).
  */
object AbTfidf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf10"
    val k = if (args.length > 1) args(1).toInt else 3
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = graft.core.GraftSession.local(32, "graft-ab-tfidf")
    spark.sparkContext.setLogLevel("WARN")

    val d = graft.core.Tables.load(spark, dir, "documents")
    val ix = graft.text.TextIndex.build(d, "doc_id", "text", maxDfRatio = 0.98)
    // same scored frame topKeywords builds, checkpointed so both shapes
    // measure ONLY the top-k, not the postings build
    val dfCap = math.floor(ix.maxDfRatio * ix.nDocs).toLong
    val idf = floor(log(lit(ix.nDocs.toDouble) / col("__df").cast("double")) *
      lit(1e6)).cast("long")
    val w = ix.termStats.filter(col("__df") <= dfCap)
      .select(col("__term"), idf.as("__idf"))
    // materialize to a temp parquet, not localCheckpoint: 250M cached
    // deserialized rows OOM an 80g heap at 1000x; a disk spill isolates
    // the top-k measurement just as well
    val tmp = java.nio.file.Files.createTempDirectory("graft_ab_tfidf").toString
    ix.postings
      .join(broadcast(w), "__term")
      .select(col("__doc").as("id"), col("__term").as("term"),
        (col("__tf") * col("__idf")).as("score_micro"))
      .write.mode("overwrite").parquet(tmp)
    val scored = spark.read.parquet(tmp)
    val nScored = scored.count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    val heap = (0 until reps).map { _ =>
      time(graft.operators.TopK
        .perGroup(scored, "id", "score_micro", ascending = false, k, Seq("term"))
        .count())
    }
    val sorted = (0 until reps).map { _ =>
      time(graft.operators.TopK
        .perGroupSorted(scored, "id", "score_micro", ascending = false, k, Seq("term"))
        .count())
    }
    // exactness: both shapes must agree row-for-row
    val a = graft.operators.TopK
      .perGroup(scored, "id", "score_micro", ascending = false, k, Seq("term"))
    val b = graft.operators.TopK
      .perGroupSorted(scored, "id", "score_micro", ascending = false, k, Seq("term"))
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()

    println(
      s"""{"dir":"$dir","k":$k,"scored_rows":$nScored,""" +
        s""""heap_sec":${median(heap.map(_._1))},""" +
        s""""sorted_sec":${median(sorted.map(_._1))},""" +
        s""""rows":${heap.head._2},"diff_rows":$diff}""")
    spark.stop()
  }
}
