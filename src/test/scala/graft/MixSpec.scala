package graft

import org.apache.spark.sql.functions._

import graft.operators.Mix

class MixSpec extends GraftSuite {
  import spark.implicits._

  test("uniform is deterministic and roughly uniform") {
    val ids = (0L until 20000L).toDF("id")
    val u = ids.select(Mix.uniform($"id").as("u"))
    val (mn, mx, mean) = u.agg(min("u"), max("u"), avg("u"))
      .as[(Double, Double, Double)].head()
    assert(mn >= 0.0 && mx < 1.0)
    assert(math.abs(mean - 0.5) < 0.02)
    // same expression twice -> identical rows (no RNG state)
    assert(u.collect().toSeq === ids.select(Mix.uniform($"id").as("u")).collect().toSeq)
  }

  test("per-group fractions are respected") {
    val docs = (0L until 30000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("id", "lang")
    val kept = Mix.sampleByFraction(docs, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.1))
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(byLang("en") / 10000.0 - 0.5) < 0.05)
    assert(math.abs(byLang("de") / 20000.0 - 0.1) < 0.05)
    // fraction 1.0 (default) keeps everything
    val all = Mix.sampleByFraction(docs, "id", "lang", Map("en" -> 0.0))
    assert(all.filter($"lang" === "en").count() === 0L)
    assert(all.filter($"lang" === "de").count() === 20000L)
  }

  test("the sampling filter stays a scan-level filter (no shuffle)") {
    val docs = (0L until 100L).map(i => (i, "en")).toDF("id", "lang")
    val plan = Mix.sampleByFraction(docs, "id", "lang", Map("en" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
