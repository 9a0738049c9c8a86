package graft

import org.apache.spark.sql.functions._

import graft.sketch.Sketches

/** Mergeable sketch properties: HLL accuracy on both estimator branches,
  * register max-merge == direct union (the distributed-rollup property),
  * KMV exactness below k and bounded error above, theta-style Jaccard
  * error, and the Count-Min over-estimate invariant.
  */
class SketchesSpec extends GraftSuite {
  import spark.implicits._

  private def keyed(n: Int, grp: String) =
    (0 until n).map(i => (grp, s"k$grp$i")).toDF("g", "k")

  test("HLL linear-counting branch: small cardinality within 4%") {
    val est = Sketches.hllDistinct(keyed(500, "a"), Seq("g"), col("k"))
      .select("n_est", "n_exact").as[(Long, Long)].head()
    assert(est._2 === 500L)
    assert(math.abs(est._1 - 500.0) / 500.0 < 0.04, s"got ${est._1}")
  }

  test("HLL raw branch: 50k distinct within 4% (sigma ~ 1.04/sqrt(4096))") {
    val est = Sketches.hllDistinct(keyed(50000, "a"), Seq("g"), col("k"))
      .select("n_est", "n_exact").as[(Long, Long)].head()
    assert(est._2 === 50000L)
    assert(math.abs(est._1 - 50000.0) / 50000.0 < 0.04, s"got ${est._1}")
  }

  test("HLL duplicates don't move the estimate (distinct semantics)") {
    val once = Sketches.hllDistinct(keyed(2000, "a"), Seq("g"), col("k"))
      .select("n_est").as[Long].head()
    val dup = keyed(2000, "a").union(keyed(2000, "a")).union(keyed(1000, "a"))
    val thrice = Sketches.hllDistinct(dup, Seq("g"), col("k"))
      .select("n_est").as[Long].head()
    assert(once === thrice)
  }

  test("HLL union by register max-merge == HLL of the concatenated rows") {
    // groups overlap: a = 0..2999, b = 2000..4999 (keys shared across groups)
    val a = (0 until 3000).map(i => ("a", s"u$i")).toDF("g", "k")
    val b = (2000 until 5000).map(i => ("b", s"u$i")).toDF("g", "k")
    val merged = Sketches.hllUnionPairs(a.union(b), "g", col("k"))
      .select("union_est", "union_exact").as[(Long, Long)].head()
    val direct = Sketches.hllDistinct(
      a.union(b).withColumn("g", lit("all")), Seq("g"), col("k"))
      .select("n_est").as[Long].head()
    assert(merged._1 === direct, "register merge must equal direct sketch")
    assert(merged._2 === 5000L)
    assert(math.abs(merged._1 - 5000.0) / 5000.0 < 0.04)
  }

  test("KMV is exact below k and within 15% above (k=256)") {
    val small = Sketches.kmvDistinct(keyed(100, "a"), "g", col("k"), k = 256)
      .select("n_est", "n_exact").as[(Long, Long)].head()
    assert(small._1 === 100L && small._2 === 100L)
    val big = Sketches.kmvDistinct(keyed(20000, "a"), "g", col("k"), k = 256)
      .select("n_est", "n_exact").as[(Long, Long)].head()
    assert(big._2 === 20000L)
    assert(math.abs(big._1 - 20000.0) / 20000.0 < 0.15, s"got ${big._1}")
  }

  test("KMV Jaccard estimate tracks the exact Jaccard within 0.1") {
    // |A| = |B| = 4000, |A ∩ B| = 2000 → J = 2000/6000 = 1/3
    val a = (0 until 4000).map(i => ("a", s"u$i")).toDF("g", "k")
    val b = (2000 until 6000).map(i => ("b", s"u$i")).toDF("g", "k")
    val r = Sketches.kmvJaccardPairs(a.union(b), "g", col("k"), k = 256)
      .select("j_est", "j_exact").as[(Double, Double)].head()
    assert(math.abs(r._2 - 1.0 / 3.0) < 0.001)
    assert(math.abs(r._1 - r._2) < 0.1, s"got ${r._1} vs ${r._2}")
  }

  test("sketch shuffles are state-bounded: partial agg before the exchange, no keys over the wire") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec        => nodes(q.plan)
      case r: ReusedExchangeExec    => nodes(r.child)
      case _                        => p.children.flatMap(nodes)
    })
    val big = keyed(20000, "a")
    // HLL registers: the exchange must carry (group, idx, partial-max rho)
    // — 3 small columns, at most m rows per partition — never the key
    val reg = graft.sketch.Sketches.hllRegisters(big, Seq("g"), col("k"))
    reg.count()
    val shuffles = nodes(reg.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.nonEmpty)
    shuffles.foreach { s =>
      assert(!s.output.exists(_.name == "k"),
        s"raw key crosses the register exchange: ${s.output.map(_.name)}")
    }
    // and a partial HashAggregate sits below the exchange (map-side max)
    val p = reg.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    // CMS cells: same property — the exchange carries (row, col, count)
    val cells = graft.sketch.Sketches.cmsCells(big, col("k"), d = 4, w = 512)
    cells.count()
    nodes(cells.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }
      .foreach { s =>
        assert(!s.output.exists(_.name == "__k"),
          s"raw key crosses the cell exchange: ${s.output.map(_.name)}")
      }
    // Bloom words: the exchange carries (word idx, partial bit_or word) —
    // ≤ m/32 rows per partition after map-side combine, keys never move
    val words = graft.sketch.Sketches.bloomWords(big, col("k"), mBits = 1 << 14, k = 4)
    words.count()
    nodes(words.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }
      .foreach { s =>
        assert(!s.output.exists(a => a.name == "__k" || a.name == "k" || a.name == "__b"),
          s"raw key/bit crosses the word exchange: ${s.output.map(_.name)}")
      }
    assert(words.queryExecution.executedPlan.toString.contains("HashAggregate"))
  }

  test("CMS estimate >= exact for every key; grid bounded at d*w cells") {
    // zipf-ish: key i appears (1000 / (i + 1)) times over 200 keys
    val rows = (0 until 200).flatMap(i => Seq.fill(1000 / (i + 1))(s"key$i"))
      .toDF("k")
    val cells = Sketches.cmsCells(rows, col("k"), d = 4, w = 64)
    assert(cells.count() <= 4L * 64)
    val exact = rows.groupBy(col("k")).agg(count(lit(1)).as("exact"))
    val est = Sketches.cmsEstimate(cells, exact.select(col("k")), col("k"), d = 4, w = 64)
    val joined = exact.join(est, exact("k").cast("string") === est("__k"))
      .select(col("exact").cast("long"), col("cms_est").cast("long"))
      .as[(Long, Long)].collect()
    assert(joined.length === 200)
    assert(joined.forall { case (ex, e) => e >= ex }, "CMS must never under-estimate")
    // the heaviest key's estimate is tight (its cells dominate collisions)
    val top = exact.orderBy(col("exact").desc).limit(1)
    val topEst = Sketches.cmsEstimate(cells, top.select(col("k")), col("k"), d = 4, w = 64)
      .select(col("cms_est")).as[Long].head()
    assert(topEst - 1000L <= 100L, s"heavy key estimate $topEst vs 1000")
  }

  test("Bloom: no false negatives; FP rate near (1-e^{-kn/m})^k on misses") {
    val m = 1 << 14 // 16384 bits → kn/m ≈ 0.49 at n=2000, k=4
    val inserted = (0 until 2000).map(i => s"in$i").toDF("k")
    val words = Sketches.bloomWords(inserted, col("k"), m, k = 4)
    // the word table is bit-packed: at most m/32 rows
    assert(words.count() <= m / 32)
    val hits = Sketches.bloomMightContain(words, inserted, col("k"), m, k = 4)
    assert(hits.filter(!col("maybe")).count() === 0L, "false negative")
    val misses = (0 until 4000).map(i => s"out$i").toDF("k")
    val fp = Sketches.bloomMightContain(words, misses, col("k"), m, k = 4)
      .filter(col("maybe")).count()
    // theoretical ≈ 2.3%; allow [0, 6%) — deterministic hash, fixed data
    assert(fp < 240, s"FP rate ${fp / 4000.0} too high")
  }

  test("Bloom merge: bit_or of two filters == filter of the union") {
    val m = 1 << 12
    val a = (0 until 500).map(i => s"a$i").toDF("k")
    val b = (250 until 900).map(i => s"a$i").toDF("k") // overlapping
    val merged = Sketches.bloomWords(a, col("k"), m, k = 3)
      .union(Sketches.bloomWords(b, col("k"), m, k = 3))
      .groupBy(col("__w")).agg(expr("bit_or(__word)").as("__word"))
    val direct = Sketches.bloomWords(a.union(b), col("k"), m, k = 3)
    assert(merged.as[(Int, Long)].collect().toSet ===
      direct.as[(Int, Long)].collect().toSet)
  }
}
