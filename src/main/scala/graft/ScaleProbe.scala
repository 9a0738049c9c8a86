package graft

import org.apache.spark.sql.functions.col

/** Index scale probe (not part of the driver contract): build + search the
  * ANN models on a 1M-row clustered fixture — one decade above the bench
  * gate's 100k — at the reference's published SIFT1M operating point
  * (ncentroids=1024, nprobe=40 ≈ 4% probe, recall@1 0.9814 / recall@10
  * 0.9902, benchs/README.md:82-128). Reports per-stage seconds, recall,
  * and QPS as one JSON line, so build/search scaling and recall stability
  * have a measured data point instead of a plan-shape argument.
  *
  * SCALE_N overrides the row count (default 1,000,000); SCALE_HNSW=1 adds
  * the graph model (its build is the slowest of the family at this size).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32, "graft-scaleprobe")
    import spark.implicits._
    val n = sys.env.getOrElse("SCALE_N", "1000000").toLong
    val out = new StringBuilder(s"""{"scale_n":$n""")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[scaleprobe] $name%-26s $sec%8.2f s")
      out.append(f""","$name":$sec%.3f""")
      r
    }

    val fix = time("fixture_materialize") {
      graft.index.GaussianFixture
        .mixtureOfGaussians(spark, n, 64, 128, sigma = 0.8, seed = 7L)
        .localCheckpoint(true)
    }
    val fq = fix.filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val qDf = fq.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")

    def flatTop(k: Int): Map[Long, Set[Long]] =
      graft.operators.Knn.flatSearch(fix, "vec_id", "embedding",
          qDf, "qid", "qvec", k, graft.core.Metric.L2)
        .select(col("qid"), col("id")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val t1 = time("flat_truth_k1")(flatTop(1))
    val t10 = time("flat_truth_k10")(flatTop(10))

    def recallOf(got: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, s) =>
        got.getOrElse(q, Set.empty).count(s).toDouble / s.size
      }
      per.sum / per.size
    }
    def searchMap(idx: graft.index.AnnIndex, k: Int, nprobe: Int): Map[Long, Set[Long]] =
      idx.search(fq, k, Some(nprobe))
        .select(col("qid"), col("id")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // SCALE_ONLY=hnsw: skip the IVF family (e.g. re-running the graph
    // model alone with a larger SPARK_DRIVER_MEM — 32 concurrent segment
    // graphs at 10M rows need ~6 GB beyond the checkpointed fixture)
    val hnswOnly = sys.env.get("SCALE_ONLY").contains("hnsw")
    if (!hnswOnly) {
    // IVFPQ at the baseline's SIFT1M shape: 1024 coarse cells, nprobe=40
    val pq = time("ivfpq_build_nc1024") {
      val ix = graft.index.IndexRegistry.build(
        "IVFPQ", spark, fix, "vec_id", "embedding",
        graft.index.IndexParams(ncentroids = 1024, nsubvector = 32, recallNum = 100))
      ix.search(fq.take(1), 1, Some(1)).count() // force any lazy state
      ix
    }
    val pq1 = time("ivfpq_search_np40_k1")(searchMap(pq, 1, 40))
    val pq10 = time("ivfpq_search_np40_k10")(searchMap(pq, 10, 40))
    val r1 = recallOf(pq1, t1); val r10 = recallOf(pq10, t10)
    out.append(f""","ivfpq_recall_at_1":$r1%.4f,"ivfpq_recall_at_10":$r10%.4f""")
    System.err.println(f"[scaleprobe] ivfpq recall@1=$r1%.4f recall@10=$r10%.4f " +
      "(nc=1024 np=40, baseline 0.9814/0.9902)")
    // QPS at the same point (warm + timed, the reference perf harness's
    // completed-searches/elapsed)
    val qps = {
      searchMap(pq, 10, 40)
      val t0 = System.nanoTime(); searchMap(pq, 10, 40)
      fq.size.toDouble / ((System.nanoTime() - t0) / 1e9)
    }
    out.append(f""","ivfpq_qps_batch50_k10":$qps%.1f""")
    System.err.println(f"[scaleprobe] ivfpq qps=$qps%.1f")

    // IVFFLAT, same coarse shape (exact distances inside probed lists)
    val ivf = time("ivfflat_build_nc1024") {
      graft.index.IndexRegistry.build("IVFFLAT", spark, fix, "vec_id", "embedding",
        graft.index.IndexParams(ncentroids = 1024))
    }
    val ivf10 = time("ivfflat_search_np40_k10")(searchMap(ivf, 10, 40))
    out.append(f""","ivfflat_recall_at_10":${recallOf(ivf10, t10)}%.4f""")

    // BINARYIVF over 128-bit signatures of the same corpus
    val binFix = fix.select(col("vec_id"),
      org.apache.spark.sql.functions.unhex(
        org.apache.spark.sql.functions.md5(col("vec_id").cast("string"))).as("code"))
      .localCheckpoint(true)
    val bin = time("binaryivf_build_nc1024") {
      graft.index.IndexRegistry.build("BINARYIVF", spark, binFix, "vec_id", "code",
        graft.index.IndexParams(ncentroids = 1024, metric = graft.core.Metric.Hamming))
    }
    val bq = binFix.filter(col("vec_id") < 50)
      .select(col("vec_id"), col("code")).as[(Long, Array[Byte])].collect()
      .map { case (i, b) => (i, graft.index.BinaryIvfIndex.bytesToFloats(b)) }.toSeq
    time("binaryivf_search_np40_k10") {
      bin.search(bq, 10, Some(40)).count()
    }
    }

    if (sys.env.get("SCALE_HNSW").contains("1")) {
      val h = time("hnsw_build") {
        graft.index.IndexRegistry.build("HNSW", spark, fix, "vec_id", "embedding",
          graft.index.IndexParams())
      }
      // ef sweep on the SAME graphs: characterizes the beam-width recall
      // curve at this segment size (ef rides the nprobe override)
      Seq(64, 128, 256).foreach { ef =>
        val h10 = time(s"hnsw_search_ef${ef}_k10")(searchMap(h, 10, ef))
        out.append(f""","hnsw_recall_at_10_ef$ef":${recallOf(h10, t10)}%.4f""")
        System.err.println(
          f"[scaleprobe] hnsw recall@10=${recallOf(h10, t10)}%.4f (ef=$ef)")
      }
    }

    out.append("}")
    println(out.toString)
    val dest = sys.env.getOrElse("SCALE_PROBE_OUT", "/tmp/scale_probe.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(dest),
      (out.toString + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[scaleprobe] write failed: $e") }
    spark.stop()
  }
}
