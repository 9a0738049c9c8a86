package graft

/** Scratch tuning main (not part of the driver contract): sweeps the
  * Gaussian-fixture sigma and IVFPQ nprobe to find an operating point where
  * the gated recall@10 sits in the 0.95–0.99 band — saturated-at-1.0 gate
  * points cannot measure drift (r6 verdict Missing #3 / task #6). In-memory
  * only: the file loop does not change recall, so tuning skips it.
  */
object RecallTune {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def truthOf(df: org.apache.spark.sql.DataFrame,
        queries: Seq[(Long, Array[Float])], k: Int): Map[Long, Set[Long]] = {
      val q = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
      graft.operators.Knn.flatSearch(df, "vec_id", "embedding",
          q, "qid", "qvec", k, graft.core.Metric.L2)
        .select(col("qid"), col("id")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    }
    def recallAt(idx: graft.index.AnnIndex, queries: Seq[(Long, Array[Float])],
        k: Int, nprobe: Int, t: Map[Long, Set[Long]]): Double = {
      val got = idx.search(queries, k, Some(nprobe))
        .select(col("qid"), col("id")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val per = t.map { case (q, s) =>
        got.getOrElse(q, Set.empty).count(s).toDouble / s.size
      }
      per.sum / per.size
    }
    val sigmas = sys.env.getOrElse("TUNE_SIGMAS", "1.2,1.6").split(",").map(_.toDouble)
    sigmas.foreach { sigma =>
      val fix = graft.index.GaussianFixture
        .mixtureOfGaussians(spark, 100000L, 64, 128, sigma = sigma, seed = 7L)
        .localCheckpoint(true)
      val fq = fix.filter(col("vec_id") < 50)
        .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)
      val t10 = truthOf(fix, fq, 10)
      val t1 = truthOf(fix, fq, 1)
      val fidx = graft.index.IndexRegistry.build(
        "IVFPQ", spark, fix, "vec_id", "embedding",
        graft.index.IndexParams(ncentroids = 128, nsubvector = 32, recallNum = 100))
      Seq(2, 3, 5, 8).foreach { np =>
        val r10 = recallAt(fidx, fq, 10, np, t10)
        val r1 = recallAt(fidx, fq, 1, np, t1)
        System.err.println(f"[tune] sigma=$sigma%.2f np=$np%2d r@1=$r1%.4f r@10=$r10%.4f")
      }
      val hidx = graft.index.IndexRegistry.build(
        "HNSW", spark, fix, "vec_id", "embedding", graft.index.IndexParams())
      val h10 = recallAt(hidx, fq, 10, 64, t10)
      System.err.println(f"[tune] sigma=$sigma%.2f HNSW ef=64 r@10=$h10%.4f")
    }
    spark.stop()
  }
}
