package graft

import graft.operators.Quantiles

/** Exact histogram quantiles vs a driver-side sort. */
class QuantilesSpec extends GraftSuite {
  import spark.implicits._

  test("matches the sorted-rank definition on random grouped data") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map { i =>
      val g = s"g${i % 3}"
      (g, (rnd.nextGaussian() * 100).toLong.max(-300).min(300))
    }
    val pms = Seq(1, 250, 500, 900, 990, 1000)
    val got = Quantiles.exactPermille(rows.toDF("g", "v"), "g", "v", pms)
      .as[(String, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val byG = rows.groupBy(_._1)
    for ((g, rs) <- byG; pm <- pms) {
      val sorted = rs.map(_._2).sorted
      val r = (sorted.length.toLong * pm + 999) / 1000 // ceil rank, 1-based
      val want = sorted((r - 1).toInt.max(0))
      assert(got((g, pm)) === want, s"group $g pm $pm")
    }
  }

  test("single-value and single-row groups") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 9L)).toDF("g", "v")
    val got = Quantiles.exactPermille(df, "g", "v", Seq(500, 1000))
      .as[(String, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", 500)) === 5L && got(("a", 1000)) === 5L)
    assert(got(("b", 500)) === 9L && got(("b", 1000)) === 9L)
  }
}
