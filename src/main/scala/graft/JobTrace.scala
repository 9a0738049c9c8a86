package graft

/** Scratch diagnostic main (not part of the driver contract): replays the
  * persisted-table lifecycle once and prints EVERY Spark job's call site,
  * grouped by lifecycle stage — the attribution layer under Prof's
  * jobs-per-stage counts. Delete-or-keep freely; nothing depends on it.
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    @volatile var stage = "init"
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val cs = js.stageInfos.map(_.name).distinct.mkString(" | ")
        val eid = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id"))).getOrElse("-")
        System.err.println(s"[trace] $stage :: job ${js.jobId} :: exec $eid :: $cs")
      }
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            val head = s.physicalPlanDescription.linesIterator
              .filter(_.nonEmpty).take(4).mkString(" / ")
            System.err.println(s"[trace] $stage :: EXEC ${s.executionId} :: $head")
          case _ =>
        }
    })
    def in[T](s: String)(f: => T): T = { stage = s; val r = f; Thread.sleep(150); r }

    val docs0 = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("string").as("_id"),
        unhex(md5(col("text"))).as("code"), col("lang"))
    docs0.count() // warm scan outside the traced window
    val root = java.nio.file.Files.createTempDirectory("graft_trace_bin").toString
    val tbl = in("create") {
      graft.table.GammaTable.create(spark, root, "binivf", "_id", docs0,
        Seq(graft.table.VectorFieldDef("code", 128, metric = "Hamming",
          retrievalType = "BINARYIVF")), nBuckets = 8)
    }
    val ix = in("buildIndex") {
      tbl.buildIndex("code",
        graft.index.IndexParams(metric = graft.core.Metric.Hamming, ncentroids = 4),
        persist = true, retrievalType = "BINARYIVF")
    }
    val delta = tbl.docs.filter(col("_id").cast("long") % 7 === 3)
      .select(col("_id"), unhex(md5(concat(col("_id"), lit("v2")))).as("code"), col("lang"))
    in("addOrUpdate") { tbl.addOrUpdate(delta) }
    in("refresh") { ix.refresh() }
    in("deleteByQuery") { tbl.deleteByQuery(col("lang") === "de") }
    val qbytes = docs0.filter(col("_id") === "0").select("code")
      .as[Array[Byte]].head()
    val reloaded = in("load") { graft.table.GammaTable.load(spark, root) }
    in("search") {
      reloaded.search(graft.core.SearchRequest(
          topn = 10,
          vecQueries = Seq(graft.core.VecQuery("code",
            graft.index.BinaryIvfIndex.bytesToFloats(qbytes), nprobe = Some(4))),
          metric = graft.core.Metric.Hamming)).collect()
    }
    spark.stop()
  }
}
