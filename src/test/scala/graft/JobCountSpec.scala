package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.core.{Metric, SearchRequest, VecQuery}
import graft.index.IndexParams
import graft.table.{GammaTable, VectorFieldDef}

/** Regression guard for driver round-trips on the serving path. Every
  * Spark job costs ~100 ms scheduler latency regardless of data size, so
  * manifest reads and schema derivation must stay job-free: the table
  * manifest carries the at-rest data schema and the index manifest the
  * lists schema (both captured at write time), and manifest JSON parses
  * through a local relation instead of spark.read.json.
  */
class JobCountSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_jobs").toString

  /** Count jobs started while `f` runs (listener bus is async: settle by
    * polling until the count is stable).
    */
  private val lastJobSites = new java.util.concurrent.ConcurrentLinkedQueue[String]

  private def jobsDuring[T](f: => T): (T, Int) = {
    val n = new AtomicInteger(0)
    lastJobSites.clear()
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        lastJobSites.add(
          desc + " @ " + js.stageInfos.map(_.name).distinct.mkString(" | "))
        n.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = f
      var prev = -1
      var cur = n.get()
      var spins = 0
      while (cur != prev && spins < 50) {
        Thread.sleep(100); prev = cur; cur = n.get(); spins += 1
      }
      (r, cur)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def docTable() = {
    val emb = spark.read.parquet(s"$sf0/embeddings.parquet")
    spark.read.parquet(s"$sf0/part.parquet")
      .filter($"p_partkey" < 400)
      .join(emb, $"p_partkey" === $"vec_id")
      .select($"p_partkey".cast("string").as("_id"), $"p_size",
        $"embedding".as("vec"))
  }

  test("table load and schema derivation launch zero Spark jobs") {
    val root = tmp()
    val t = GammaTable.create(spark, root, "jc", "_id", docTable(),
      Seq(VectorFieldDef("vec", 64)), nBuckets = 4)
    assert(t.meta.dataSchema != null, "commit must record the at-rest schema")

    val (loaded, loadJobs) = jobsDuring(GammaTable.load(spark, root))
    assert(loadJobs === 0, s"manifest-only load ran $loadJobs jobs")

    // schema of the at-rest scan comes from the manifest, not a footer job
    val (schema, schemaJobs) = jobsDuring(loaded.docs.schema)
    assert(schemaJobs === 0, s"schema derivation ran $schemaJobs jobs")
    assert(schema.fieldNames.contains("vec") && schema.fieldNames.contains("p_size"))

    // and the data read through the manifest schema is the data written
    assert(loaded.docs.count() === t.docs.count())
  }

  test("persisted-index restore skips footer inference on lists and state") {
    val root = tmp()
    val t = GammaTable.create(spark, root, "jci", "_id", docTable(),
      Seq(VectorFieldDef("vec", 64)), nBuckets = 4)
    t.buildIndex("vec", IndexParams(metric = Metric.L2, ncentroids = 4),
      persist = true)

    val (loaded, loadJobs) = jobsDuring(GammaTable.load(spark, root))
    // restore reads manifests (0 jobs) + coarse centroids (1 collect);
    // anything above that is a reintroduced inference/head job
    assert(loadJobs <= 2,
      s"index restore ran $loadJobs jobs: ${lastJobSites.toArray.mkString("; ")}")

    val hits = loaded.search(SearchRequest(topn = 5,
      vecQueries = Seq(VecQuery("vec",
        docTable().select("vec").as[Array[Float]].head()))))
    assert(hits.count() === 5)
  }

  test("commit path job counts stay bounded (AQE off for the fixed-shape write)") {
    // Regression guard for the r8 commit-cost work: the write action runs
    // WITHOUT adaptive execution (fixed-shape plan), so each commit is
    // stats-pass jobs + broadcast builds + ONE write job — not one job
    // per AQE query stage. Bounds are the measured counts + 1 slack.
    val root = tmp()
    val input = docTable() // parquet schema inference happens here, not in the window
    val (t, createJobs) = jobsDuring {
      GammaTable.create(spark, root, "jcc", "_id", input, Nil, nBuckets = 4)
    }
    assert(createJobs <= 5,
      s"create ran $createJobs jobs: ${lastJobSites.toArray.mkString("; ")}")

    val delta = t.docs.filter(col("_id").cast("long") % 5 === 0)
      .select(col("_id"), (col("p_size") + 1).as("p_size"), col("vec"))
      .localCheckpoint(true)
    val (_, upsertJobs) = jobsDuring(t.addOrUpdate(delta))
    assert(upsertJobs <= 9,
      s"addOrUpdate ran $upsertJobs jobs: ${lastJobSites.toArray.mkString("; ")}")

    val (_, delJobs) = jobsDuring(t.deleteByQuery(col("p_size").between(10, 12)))
    assert(delJobs <= 7,
      s"deleteByQuery ran $delJobs jobs: ${lastJobSites.toArray.mkString("; ")}")

    // the AQE toggle must be restored after every commit
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
  }

  test("heavy-hitters sketch-then-verify stays job-bounded") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 20000).select(
      when(col("id") % 3 =!= 0, concat(lit("hot-"), (col("id") % 5).cast("string")))
        .otherwise(concat(lit("t-"), col("id").cast("string"))).as("item"))
      .localCheckpoint(true)
    val ((_, n)) = jobsDuring {
      graft.text.HeavyHitters.exact(df, "item", minFreqRatio = 0.08, k = 16)
        .collect()
    }
    // one sketch agg + the recount (plus bounded broadcast-build jobs):
    // a regression past this bound means a new corpus pass crept in
    assert(n <= 6, s"heavy hitters ran $n jobs (bound 6)")
  }
}
