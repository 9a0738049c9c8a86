package graft

/** ngram-Jaccard LSH scale probe (not part of the driver contract): runs
  * the MinHash-banded arm of q_ngram_jaccard_lsh — the documented scale
  * path for the operator whose EXACT AllPairs verify shuffle exceeds a
  * single host's disk at the 1000x replica — and reports wall seconds,
  * candidate and verified-pair counts as one JSON line. Recall of the
  * banded arm is adjudicated where the exact arm is still computable
  * (the 100x replica runs the full verdict gate, oracle-checked); this
  * probe supplies the 1000x decade timing point on top of that.
  *
  * Env knobs (defaults match the gate): GRAFT_LSH_NUMHASHES=32,
  * GRAFT_LSH_BANDS=16, GRAFT_LSH_THRESHOLD=0.4.
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf100"
    val spark = graft.core.GraftSession.local(32, "graft-dedupprobe")
    spark.sparkContext.setLogLevel("WARN")
    val numHashes = sys.env.getOrElse("GRAFT_LSH_NUMHASHES", "32").toInt
    val bands = sys.env.getOrElse("GRAFT_LSH_BANDS", "16").toInt
    val threshold = sys.env.getOrElse("GRAFT_LSH_THRESHOLD", "0.4").toDouble
    val out = new StringBuilder("{")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[dedupprobe] $name%-24s $sec%8.2f s")
      out.append(f""""${name}_sec":$sec%.3f,""")
      r
    }

    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val n = time("docs_count")(docs.count())
    val cands = time("lsh_candidates") {
      graft.dedup.Dedup.minhashCandidates(
        docs, "doc_id", "text", numHashes, bands).count()
    }
    val pairs = time("lsh_verified_pairs") {
      graft.dedup.Dedup.minhashPairs(
        docs, "doc_id", "text", threshold, numHashes, bands).count()
    }
    out.append(s""""docs":$n,"candidates":$cands,"pairs":$pairs,""")
    out.append(s""""num_hashes":$numHashes,"bands":$bands,"threshold":$threshold,""")
    out.append(s""""sf":"$sfDir"}""")
    println(out.toString)
    spark.stop()
  }
}
