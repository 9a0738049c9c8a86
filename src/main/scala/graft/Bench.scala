package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  * Runs every SparkEntry query once after a session warmup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)

    // JVM/codegen warmup so the first measured query isn't charged for it
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.core.Tables.names.foreach { n =>
      try graft.core.Tables.load(spark, sfDir, n).limit(1).collect()
      catch { case _: Throwable => }
    }

    // Local-iteration filter; the driver sets no env so it always runs all.
    val only = sys.env.get("GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1L
      }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $sec%8.2f s rows=$n")
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // BASELINE recall gate (reference benchs/README.md SIFT1M rows:
    // recall@1 0.9814 / recall@10 0.9902 at ncentroids=1024, nprobe=40,
    // nbytes=64) measured on the documented proxy — this SF's embeddings
    // with knobs scaled to the table: ncentroids=64 (~n/1000 like the
    // SIFT1M row), nsubvector=32 -> dsub=2 floats/subquantizer (the
    // granularity of the reference's nbytes=64 at d=128), recall_num=100
    // as shipped, nprobe=56. The synthetic embeddings are near-uniform —
    // HARDER for IVF than clustered SIFT (list containment is weaker), so
    // meeting the rows costs a deeper probe than SIFT's 40/1024; the
    // probe depth is part of the emitted config. 50 queries vs FLAT
    // ground truth, emitted in the bench line so a recall regression
    // fails the round, not just a spec.
    val recallJson = try {
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
      val queries = emb.filter(col("vec_id") < 50)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().toSeq
      val idx = graft.index.IndexRegistry.build(
        "IVFPQ", spark, emb, "vec_id", "embedding",
        graft.index.IndexParams(ncentroids = 64, nsubvector = 32, recallNum = 100))
      def truth(k: Int): Map[Long, Set[Long]] = {
        val q = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
        graft.operators.Knn.flatSearch(emb, "vec_id", "embedding",
            q, "qid", "qvec", k, graft.core.Metric.L2)
          .select(col("qid"), col("id")).as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      }
      // ground truth computed ONCE per k; every recall point reuses it
      val t1 = truth(1); val t10 = truth(10)
      def recallAt(k: Int, nprobe: Int, t: Map[Long, Set[Long]]): Double = {
        val got = idx.search(queries, k, Some(nprobe))
          .select(col("qid"), col("id")).as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val per = t.map { case (q, s) =>
          got.getOrElse(q, Set.empty).count(s).toDouble / s.size
        }
        per.sum / per.size
      }
      val r1 = recallAt(1, 56, t1); val r10 = recallAt(10, 56, t10)
      // the baseline's sweep finding (benchs/README.md:30-40): recall
      // plateaus as nprobe grows — emitted so probe-depth regressions are
      // visible round over round (56 reuses the headline measurement)
      val sweep = Seq(4, 16).map(np => np -> recallAt(10, np, t10)) :+ (56 -> r10)
      // QPS in the baseline harness's sense (completed searches / elapsed,
      // tools/perf.cc:235-240) for the probed index vs exact FLAT over the
      // same 50-query batch — the indexed:exact throughput ratio is the
      // machine-independent number
      def qpsOf(f: => Unit): Double = {
        f // warm
        val t0 = System.nanoTime(); f
        queries.size.toDouble / ((System.nanoTime() - t0) / 1e9)
      }
      val qpsIdx = qpsOf {
        idx.search(queries, 10, Some(56)).select(col("qid"), col("id")).collect()
      }
      val qpsFlat = qpsOf {
        val q = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
        graft.operators.Knn.flatSearch(emb, "vec_id", "embedding",
          q, "qid", "qvec", 10, graft.core.Metric.L2)
          .select(col("qid"), col("id")).collect()
      }
      // the gate VERDICT rides in the JSON: within 2pp of the published
      // SIFT1M rows on the (harder, near-uniform) proxy embeddings
      val ok = r1 >= 0.9814 - 0.02 && r10 >= 0.9902 - 0.02
      System.err.println(f"[bench] recall@1=$r1%.4f recall@10=$r10%.4f ok=$ok " +
        f"qps(ivfpq)=$qpsIdx%.1f qps(flat)=$qpsFlat%.1f " +
        "(proxy knobs ncentroids=64 nprobe=56 m=32)")
      val sweepJson = sweep.map { case (np, r) => s""""$np":$r""" }.mkString("{", ",", "}")
      s""","recall":{"recall_at_1":$r1,"recall_at_10":$r10,"recall_ok":$ok,""" +
        s""""baseline_recall_at_1":0.9814,"baseline_recall_at_10":0.9902,""" +
        s""""sweep_recall_at_10_by_nprobe":$sweepJson,""" +
        s""""config":"IVFPQ ncentroids=64 nprobe=56 nsubvector=32 recall_num=100 vs FLAT ground truth, 50 queries, near-uniform proxy embeddings; ok = within 0.02 of baseline rows"},""" +
        s""""qps":{"ivfpq_batch50_k10":$qpsIdx,"flat_batch50_k10":$qpsFlat}"""
    } catch {
      case e: Throwable =>
        // a crashed gate must be VISIBLE in the emitted line (recall_ok
        // false + the error), not a silently missing key
        System.err.println(s"[bench] recall gate FAILED: ${e.getMessage}")
        // strip the WHOLE control class + quote/backslash: any U+0000-001F
        // raw inside a quoted JSON string makes the line unparseable
        val msg = String.valueOf(e.getMessage).replaceAll("[\\p{Cntrl}\"\\\\]", " ").take(200)
        s""","recall":{"recall_ok":false,"error":"$msg"}"""
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$recallJson}""")
    spark.stop()
  }
}
