package graft

import org.apache.spark.sql.functions._

import graft.text.HeavyHitters

/** Misra-Gries sketch guarantees + the exact two-phase heavy hitters. */
class HeavyHittersSpec extends GraftSuite {
  import spark.implicits._

  // Zipf-ish stream: item j appears ~ n/(j+1) times, plus a singleton tail
  private def skewed(n: Int) = spark.range(0, n).select(
    when(col("id") % 3 =!= 0, concat(lit("hot-"), (col("id") % 5).cast("string")))
      .otherwise(concat(lit("tail-"), col("id").cast("string"))).as("item"))

  test("mg sketch keeps every item above the seen/(k+1) guarantee") {
    val df = skewed(9000)
    val row = df.agg(graft.functions.mg_sketch(col("item"), 16).as("s"))
      .select(col("s.items"), col("s.seen")).head()
    val items = row.getMap[String, Long](0)
    val seen = row.getLong(1)
    assert(seen === 9000)
    val truth = df.groupBy("item").count().as[(String, Long)].collect().toMap
    val bound = seen.toDouble / (16 + 1)
    for ((item, c) <- truth if c > bound)
      assert(items.contains(item), s"$item (freq $c > $bound) missing from sketch")
    // estimates never overcount
    for ((item, est) <- items)
      assert(est <= truth(item), s"$item est $est > true ${truth(item)}")
  }

  test("exact() equals the full groupBy/HAVING answer despite a tiny sketch") {
    val df = skewed(9000)
    val got = HeavyHitters.exact(df, "item", minFreqRatio = 0.08, k = 16)
      .as[(String, Long)].collect().toMap
    val n = df.count()
    val want = df.groupBy("item").count()
      .filter(col("count").cast("double") > lit(0.08) * n.toDouble)
      .as[(String, Long)].collect().toMap
    assert(got === want)
    assert(want.nonEmpty, "fixture must produce at least one heavy hitter")
  }

  test("exact() is invariant to input partitioning") {
    val df = skewed(5000)
    val a = HeavyHitters.exact(df, "item", 0.08, 16).as[(String, Long)].collect().toSet
    val b = HeavyHitters.exact(df.repartition(17), "item", 0.08, 16)
      .as[(String, Long)].collect().toSet
    assert(a === b)
  }

  test("exact() rejects a k too small for the requested ratio") {
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.exact(skewed(100), "item", minFreqRatio = 0.01, k = 16)
    }
    assert(e.getMessage.contains("too small"))
  }

  test("streaming sketch + batch verify equals batch exact, any arrival order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val df = skewed(6000)
    val want = HeavyHitters.exact(df, "item", 0.08, 16)
      .as[(String, Long)].collect().toSet
    val rows = df.as[String].collect()
    for (order <- Seq(rows, rows.reverse)) {
      val sink = s"hh_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val stream = MemoryStream[String]
      val q = graft.streaming.StreamStats.heavyHitterCandidates(
          stream.toDF().toDF("item"), "item", k = 16)
        .writeStream.format("memory").queryName(sink).outputMode("complete").start()
      try {
        order.grouped(1500).foreach { b =>
          stream.addData(b.toSeq); q.processAllAvailable()
        }
      } finally q.stop()
      val cand = spark.table(sink).select(explode(map_keys(col("items"))).as("c"))
      val got = HeavyHitters.verify(df, "item", cand, 0.08)
        .as[(String, Long)].collect().toSet
      assert(got === want, s"order=${order.headOption}")
    }
  }

  // -------------------------- boilerplate removal built on the sketch

  // 200 distinct 12-word docs; a 4-word banner heads every other one
  private def banner = "click here to subscribe"
  private def boilerDocs = spark.range(0, 200).select(
    col("id").as("doc_id"),
    concat_ws(" ", (0 until 12).map(j =>
      concat(lit(s"w$j"), (col("id") * (j + 3) % 97).cast("string"))): _*).as("orig"))
    .withColumn("text",
      when(col("doc_id") % 2 === 0, concat(lit(banner + " "), col("orig")))
        .otherwise(col("orig")))

  test("removeBoilerplateSpans strips the banner and restores originals") {
    val cleaned = graft.text.TextOps.removeBoilerplateSpans(
      boilerDocs, "doc_id", "text", spanWords = 4, minDocFreqRatio = 0.25, k = 1024)
    val bad = cleaned.filter(col("text") =!= col("orig"))
    assert(bad.count() === 0)
    // the returned rebuild is a pure projection: no Exchange at all
    val p = cleaned.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("removeBoilerplateSpans guards exactness against an undersized k") {
    val e = intercept[IllegalArgumentException] {
      graft.text.TextOps.removeBoilerplateSpans(
        boilerDocs, "doc_id", "text", spanWords = 4,
        minDocFreqRatio = 0.001, k = 4)
    }
    assert(e.getMessage.contains("too small"))
  }
}
