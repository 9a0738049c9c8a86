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

  // Regression (caught by the 100x oracle sweep): the old `(id / M) % M`
  // limb ran through Spark's DOUBLE division and wrapped the 2^32 fold for
  // ~1 in 1e5 ids (doc_id 415338: exact 0.9999977 vs computed 1.4e-6). The
  // uniform must match exact int64 arithmetic BITWISE for every id.
  test("uniform matches exact integer arithmetic bitwise") {
    def ref(id: Long): Double =
      (((id & 1048575L) * 2654435761L + ((id >>> 20) & 1048575L) * 40503L)
        % 4294967296L).toDouble / 4294967296.0
    val ids = ((0L until 4096L) ++
      Seq(415338L, 1048575L, 1048576L, (1L << 40) + 12345L, (1L << 52) + 7L))
      .toDF("id")
    val got = ids.select($"id", Mix.uniform($"id").as("u"))
      .as[(Long, Double)].collect()
    got.foreach { case (id, u) =>
      assert(u === ref(id), s"id=$id spark=$u ref=${ref(id)}")
    }
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
