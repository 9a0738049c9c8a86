package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.{LangModel, TextIndex, TextOps}

/** BM25 lexical retrieval, RRF hybrid fusion, token-window chunking and
  * bigram-LM scoring — correctness against naive reference shapes plus
  * the plan-level scale contracts (broadcast query side, shuffle-free
  * chunking).
  */
class TextIndexSpec extends GraftSuite {
  import spark.implicits._

  private lazy val docs = graft.core.Tables.load(spark, sf0, "documents")

  // ---------------------------------------------------------------- BM25

  /** Naive BM25 on the same quantized-contribution formula: window
    * row_number over every (query, doc) score — the semantics bm25()
    * must reproduce with its broadcast/heap shape.
    */
  private def naiveBm25(
      d: DataFrame, q: DataFrame, k: Int,
      maxDfRatio: Double = 0.5): DataFrame = {
    val rows = d.select(col("doc_id"), TextOps.tokens(col("text")).as("w")).collect()
    val n = rows.length
    val docToks = rows.map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val avgdl = docToks.values.map(_.size).sum.toDouble / n
    val dfm = docToks.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
      .filter { case (_, df) => df <= math.floor(maxDfRatio * n).toLong }
    val qrows = q.collect().map(r => r.getLong(0) -> r.getString(1))
    val scored = for {
      (qid, qtext) <- qrows.toSeq
      (doc, toks) <- docToks
      terms = qtext.split(" ").distinct.filter(dfm.contains)
      if terms.exists(toks.contains)
    } yield {
      val dl = toks.size
      val s = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0L
        else {
          val df = dfm(t)
          val idf = math.log(1.0 + ((n - df).toDouble + 0.5) / (df.toDouble + 0.5))
          val norm = (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl.toDouble) / avgdl))
          math.floor((idf * norm) * 1e6).toLong
        }
      }.sum
      (qid, doc, s)
    }
    scored.toDF("qid", "id", "score_micro")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("score_micro").desc, col("id").asc)))
      .filter(col("rn") <= k).drop("rn")
  }

  private lazy val queries = docs.filter(col("doc_id") % 7 === 0)
    .select(col("doc_id").as("qid"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("qtext"))

  test("bm25 equals the naive quantized-window reference") {
    // 0.98: the synthetic corpus has a tiny vocabulary, so most words
    // appear in >50% of docs — the gate uses the same ratio
    val ix = TextIndex.build(docs, "doc_id", "text", maxDfRatio = 0.98)
    val got = TextIndex.bm25(ix, queries, "qid", "qtext", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = naiveBm25(docs, queries, k = 5, maxDfRatio = 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("maxDfRatio drops ubiquitous terms at query time") {
    val d = Seq(
      (1L, "common alpha"), (2L, "common beta"), (3L, "common gamma"),
      (4L, "common delta")).toDF("doc_id", "text")
    val ix = TextIndex.build(d, "doc_id", "text", maxDfRatio = 0.5)
    // stats stay RAW (append-mergeable); the cap applies at query time:
    // a query of ONLY the ubiquitous term (4/4 docs > 0.5) matches nothing
    val q = Seq((0L, "common")).toDF("qid", "qtext")
    assert(TextIndex.bm25(ix, q, "qid", "qtext", k = 3).count() == 0)
    // a rarer term still matches
    val q2 = Seq((0L, "alpha")).toDF("qid", "qtext")
    assert(TextIndex.bm25(ix, q2, "qid", "qtext", k = 3).count() == 1)
  }

  test("appendDelta == build on the full corpus (O(delta) maintenance)") {
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val inc = TextIndex.appendDelta(
      TextIndex.build(half1, "doc_id", "text", maxDfRatio = 0.98),
      half2, "doc_id", "text")
    val full = TextIndex.build(docs, "doc_id", "text", maxDfRatio = 0.98)
    assert(inc.nDocs == full.nDocs && inc.dlSum == full.dlSum)
    def hits(ix: TextIndex.BuiltIndex) =
      TextIndex.bm25(ix, queries, "qid", "qtext", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(identity).toSeq
    val (a, b) = (hits(inc), hits(full))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("bm25 query path broadcasts the query side (no sort-merge join)") {
    val ix = TextIndex.build(docs, "doc_id", "text")
    val p = TextIndex.bm25(ix, queries, "qid", "qtext", k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  // ----------------------------------------------------------------- RRF

  test("rrfFuse: hand-checked integer fusion with full-outer semantics") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("qid", "id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 13L, 2)).toDF("qid", "id", "rank")
    val got = TextIndex.rrfFuse(a, b, k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    def c(r: Int): Long = math.floor(1e9 / (60.0 + r)).toLong
    assert(got == Map(
      10L -> c(1), 11L -> (c(2) + c(1)), 12L -> c(3), 13L -> c(2)))
  }

  test("hybrid rrf is deterministic across runs") {
    val ix = TextIndex.build(docs, "doc_id", "text")
    def run(): Seq[(Long, Long, Long)] = {
      val ta = TextIndex.rankHits(
        TextIndex.bm25(ix, queries, "qid", "qtext", k = 10),
        "qid", "id", "score_micro", ascending = false)
      val e = graft.core.Tables.load(spark, sf0, "embeddings")
      val qv = e.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val va = TextIndex.rankHits(
        graft.operators.Knn.flatSearch(e, "vec_id", "embedding",
          qv, "qid", "qvec", k = 10, metric = graft.core.Metric.Cosine),
        "qid", "id", "score", ascending = false)
      TextIndex.rrfFuse(ta, va, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(identity).toSeq
    }
    val r1 = run(); val r2 = run()
    assert(r1 == r2)
    assert(r1.nonEmpty)
  }

  // ------------------------------------------------------------- chunking

  test("chunk: stripping the overlap reconstructs every document") {
    val maxT = 12; val ov = 4; val stride = maxT - ov
    val out = TextOps.chunk(docs, "doc_id", "text", maxT, ov)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val orig = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.keySet == orig.keySet)
    out.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_._2)
      // chunk 0 whole + each later chunk minus its `ov`-token overlap
      val rebuilt = (sorted.head._4.split(" ").toSeq ++
        sorted.tail.toSeq.flatMap(c => c._4.split(" ").drop(ov).toSeq)).mkString(" ")
      assert(rebuilt == orig(id), s"doc $id")
      // every chunk except the last is exactly maxT tokens; token counts
      // in the n_tokens column match the text
      sorted.init.foreach(c => assert(c._3 == maxT))
      sorted.foreach(c => assert(c._4.split(" ").length == c._3))
      // consecutive chunks agree on their shared overlap
      sorted.sliding(2).foreach {
        case Array(p, c) =>
          assert(p._4.split(" ").takeRight(ov).sameElements(
            c._4.split(" ").take(ov)))
        case _ =>
      }
    }
  }

  test("chunk: short docs yield exactly one chunk; plan has no Exchange") {
    val d = Seq((1L, "a b c"), (2L, (1 to 40).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.chunk(d, "doc_id", "text", maxTokens = 32, overlap = 8)
    val byDoc = out.collect().groupBy(_.getLong(0))
    assert(byDoc(1L).length == 1 && byDoc(1L).head.getLong(2) == 3)
    assert(byDoc(2L).length == 2)
    val p = TextOps.chunk(docs, "doc_id", "text", 32, 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  // ------------------------------------------------------------ bigram LM

  test("bigram LM: hand-computed scores on a tiny corpus") {
    val d = Seq(
      (1L, "a b a b"), // bigrams: "a b" x2, "b a" x1
      (2L, "a b c"),   // "a b", "b c"
      (3L, "z")        // no bigrams
    ).toDF("doc_id", "text")
    val m = LangModel.train(d, "text", maxBigrams = 100)
    val mm = m.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // c2: "a b"->3, "b a"->1, "b c"->1; c1 heads: a->3, b->2
    assert(mm == Map(
      "a b" -> (3L, 3L), "b a" -> (1L, 2L), "b c" -> (1L, 2L)))
    def lp(c2: Long, c1: Long): Long =
      math.floor(math.log(c2.toDouble / c1.toDouble) * 1e6).toLong
    val got = LangModel.score(d, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val d1 = (lp(3, 3) * 2 + lp(1, 2)).toDouble / 3
    val d2 = (lp(3, 3) + lp(1, 2)).toDouble / 2
    assert(got(1L) == ((3L, 3L,
      BigDecimal(d1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(2L) == ((2L, 2L,
      BigDecimal(d2).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(3L) == ((0L, 0L, 0.0)))
  }

  test("bigram LM: the maxBigrams cut is deterministic (count desc, gram asc)") {
    val d = Seq((1L, "a b"), (2L, "a c"), (3L, "a b")).toDF("doc_id", "text")
    // counts: "a b"->2, "a c"->1 — cap 1 keeps "a b" only
    val m1 = LangModel.train(d, "text", maxBigrams = 1)
      .select("gram").as[String].collect().toSeq
    assert(m1 == Seq("a b"))
    // equal counts tie-break by gram ascending
    val d2 = Seq((1L, "b z"), (2L, "a z")).toDF("doc_id", "text")
    val m2 = LangModel.train(d2, "text", maxBigrams = 1)
      .select("gram").as[String].collect().toSeq
    assert(m2 == Seq("a z"))
  }

  // ---------------------------------------------------- stratified sampling

  test("stratifiedExact: exact per-group quotas, deterministic, payload-preserving") {
    val d = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    val s1 = graft.operators.Sample.stratifiedExact(d, "lang", "doc_id", 0.2)
    val s2 = graft.operators.Sample.stratifiedExact(d, "lang", "doc_id", 0.2)
    val got = s1.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == s2.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq)
    // exact quota per group
    val totals = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val picked = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (g, n) =>
      assert(picked.getOrElse(g, 0L) == math.ceil(0.2 * n).toLong, s"group $g")
    }
    // selected rows carry the original payload columns
    assert(s1.columns.toSeq == Seq("doc_id", "lang", "n_chars"))
    // frac=1.0 keeps everything; frac=0.0 keeps nothing
    assert(graft.operators.Sample.stratifiedExact(d, "lang", "doc_id", 1.0).count() == d.count())
    assert(graft.operators.Sample.stratifiedExact(d, "lang", "doc_id", 0.0).count() == 0)
  }

  // ------------------------------------------------------- JL projection

  test("signProject: deterministic, shuffle-free, JL distance-preserving") {
    val e = graft.core.Tables.load(spark, sf0, "embeddings")
    val p = graft.operators.Project.signProject(e, "vec_id", "embedding", 64, 16)
    // plan: pure projection
    assert(!p.queryExecution.executedPlan.toString.contains("Exchange"))
    val got = p.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val got2 = graft.operators.Project.signProject(e, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(got.keySet == got2.keySet)
    got.foreach { case (k, v) => assert(v.sameElements(got2(k))) }
    // matches a driver-side reference projection
    val orig = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val ref = orig.view.mapValues { v =>
      (0 until 16).map { j =>
        val s = (0 until 64).map(i => v(i) * graft.operators.Project.sign(i, j)).sum
        BigDecimal(s / 4.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toArray
    }.toMap
    got.foreach { case (k, v) =>
      v.zip(ref(k)).foreach { case (a, b) => assert(math.abs(a - b) < 2e-6, s"id $k") }
    }
    // JL property: projected pairwise L2 within a loose distortion band of
    // the original (k=16 -> rough preservation, not exactness)
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(12)
    val ratios = for {
      Seq(a, b) <- ids.combinations(2).toSeq
      o = d2(orig(a), orig(b)) if o > 1e-9
    } yield d2(got(a), got(b)) / o
    assert(ratios.nonEmpty)
    // mean ratio near 1 (unbiased), individual ratios within [0.2, 2.5]
    val mean = ratios.sum / ratios.size
    assert(mean > 0.6 && mean < 1.5, s"mean distortion $mean")
    ratios.foreach(r => assert(r > 0.2 && r < 2.5, s"ratio $r"))
  }

  test("bigram LM scoring plan: model side broadcasts, corpus never sorts") {
    val m = LangModel.train(docs, "text", maxBigrams = 512)
    val p = LangModel.score(docs, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("bm25f: a title hit outranks the same hit buried in the body") {
    import graft.text.TextIndex
    import graft.text.TextIndex.FieldSpec
    val docs = Seq(
      (1L, "quantum computing basics", "intro words only here"),
      (2L, "unrelated title words", "quantum computing appears in body text"),
      (3L, "other filler title", "more filler body content here")
    ).toDF("doc_id", "title", "body")
    val ix = TextIndex.buildF(docs, "doc_id",
      Seq(FieldSpec("title", 2.0, 0.75), FieldSpec("body", 1.0, 0.4)),
      maxDfRatio = 0.98)
    val q = Seq((9L, "quantum computing")).toDF("qid", "qtext")
    val hits = TextIndex.bm25f(ix, q, "qid", "qtext", k = 3)
      .orderBy(col("score_micro").desc).select("id").as[Long].collect()
    assert(hits.head === 1L, s"title match must rank first, got ${hits.toSeq}")
    assert(hits.contains(2L))
    assert(!hits.contains(3L) ||
      hits.indexOf(3L) > hits.indexOf(2L))
  }

  test("bm25f is invariant to corpus repartitioning") {
    import graft.text.TextIndex
    import graft.text.TextIndex.FieldSpec
    val docs = spark.range(0, 500).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 4).map(j => concat(lit("t"), (col("id") * (j + 2) % 23).cast("string"))): _*).as("title"),
      concat_ws(" ", (0 until 12).map(j => concat(lit("w"), (col("id") * (j + 5) % 41).cast("string"))): _*).as("body"))
    val q = spark.range(0, 5).select(col("id").as("qid"),
      concat_ws(" ", concat(lit("t"), (col("id") * 2 % 23).cast("string")),
        concat(lit("w"), (col("id") * 5 % 41).cast("string"))).as("qtext"))
    def run(d: org.apache.spark.sql.DataFrame) = {
      val ix = TextIndex.buildF(d, "doc_id",
        Seq(FieldSpec("title", 2.0, 0.75), FieldSpec("body", 1.0, 0.4)), 0.98)
      TextIndex.bm25f(ix, q, "qid", "qtext", k = 10)
        .as[(Long, Long, Long)].collect().toSet
    }
    assert(run(docs) === run(docs.repartition(17)))
  }

  test("phraseSearch counts overlapping occurrences and ranks by count") {
    import graft.text.TextIndex
    val docs = Seq(
      (1L, "a b a b a"), // "a b a" at positions 0 and 2 (overlapping)
      (2L, "a b a x y"), // once
      (3L, "b a b a x")  // once, at 1
    ).toDF("doc_id", "text")
    val q = Seq((9L, "a b a")).toDF("qid", "qtext")
    val got = TextIndex.phraseSearch(docs, "doc_id", "text", q, "qid", "qtext", 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((9L, 1L, 2L), (9L, 2L, 1L), (9L, 3L, 1L)))
  }

  test("phraseSearch: repeated phrase words need ALL offsets at one anchor") {
    import graft.text.TextIndex
    val docs = Seq(
      (1L, "x a a y"),   // "a a" once
      (2L, "x a b a y"), // a's present but never adjacent: no match
      (3L, "a a a")      // twice (overlapping)
    ).toDF("doc_id", "text")
    val q = Seq((7L, "a a")).toDF("qid", "qtext")
    val got = TextIndex.phraseSearch(docs, "doc_id", "text", q, "qid", "qtext", 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((7L, 1L, 1L), (7L, 3L, 2L)))
  }

  test("phraseSearch is invariant to corpus repartitioning") {
    import graft.text.TextIndex
    val docs = spark.read.parquet(s"$sf0/documents.parquet")
    val q = docs.filter(col("doc_id") % 101 === 0).select(
      col("doc_id").as("qid"),
      concat_ws(" ", slice(split(col("text"), " "), 5, 3)).as("qtext"))
    def run(d: org.apache.spark.sql.DataFrame) =
      TextIndex.phraseSearch(d, "doc_id", "text", q, "qid", "qtext", 10)
        .as[(Long, Long, Long)].collect().toSet
    val base = run(docs)
    assert(base.nonEmpty)
    assert(run(docs.repartition(13)) === base)
  }

  test("phrase/proximity: shuffle rows stay seed-bounded on a stopword-dense corpus") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    // 200 docs, each 50 tokens of the ubiquitous "the" plus one unique
    // marker uNNN at position 10. Queries pair the unique marker with
    // "the": the replaced anchor-vote algebra shuffled one row per
    // (query × "the"-posting) ≈ Q·10k = 400k votes; rarest-term seeding
    // shuffles the matched postings ONCE (~10k) plus Q seed pairs.
    val docs = (0 until 200).map { i =>
      val toks = Array.fill(50)("the"); toks(10) = s"u$i"
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val qs = (0 until 40).map(i => (i.toLong, s"u$i the")).toDF("qid", "qtext")
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffled.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(l)
    val (phr, prox) = try {
      val a = TextIndex.phraseSearch(docs, "doc_id", "text", qs, "qid", "qtext", 10)
        .as[(Long, Long, Long)].collect().toSet
      val b = TextIndex.proximitySearch(docs, "doc_id", "text", qs, "qid", "qtext", 12, 10)
        .as[(Long, Long, Long)].collect().toSet
      // listener events are async; give the bus a moment to drain
      Thread.sleep(1000)
      (a, b)
    } finally spark.sparkContext.removeSparkListener(l)
    // "uI the" occurs exactly once per doc i (u at 10, the at 11)
    assert(phr === (0 until 40).map(i => (i.toLong, i.toLong, 1L)).toSet)
    // proximity window 12 over {uI, the}: starts covering position 10
    // and some "the" — all of [0..10] qualify (u at 10 within 12 of any)
    assert(prox === (0 until 40).map(i => (i.toLong, i.toLong, 11L)).toSet)
    // corpus postings = 200·50 = 10k; both searches together must stay
    // within a few corpus passes — the vote algebra would exceed 800k
    val total = shuffled.get()
    assert(total < 80000L, s"shuffle records = $total (fan-out regression?)")
  }

  test("proximitySearch: window boundary is exact, duplicate terms collapse") {
    import graft.text.TextIndex
    val docs = Seq(
      (1L, "x a y y b z"),     // a(1)..b(4): within any window ≥ 4
      (2L, "a x x x b"),       // a(0)..b(4): needs window ≥ 5
      (3L, "a x x x x b"),     // a(0)..b(5): needs window ≥ 6 — out at 5
      (4L, "b a c")            // order-free: window covers both
    ).toDF("doc_id", "text")
    val q = Seq((7L, "a b a")).toDF("qid", "qtext") // duplicate 'a' collapses
    // window 5: doc2's only covering start is 0; doc3 excluded
    val w5 = TextIndex.proximitySearch(docs, "doc_id", "text", q, "qid", "qtext", 5, 10)
      .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(w5 === Map(1L -> 2L, 2L -> 1L, 4L -> 1L))
    // window 6 admits doc3
    val w6 = TextIndex.proximitySearch(docs, "doc_id", "text", q, "qid", "qtext", 6, 10)
      .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(w6.keySet === Set(1L, 2L, 3L, 4L))
  }

  test("topKeywords: rare terms outrank common ones; df cap drops ubiquitous") {
    import graft.text.TextIndex
    val docs = Seq(
      (1L, "common rare common stopword"),
      (2L, "common stopword stopword"),
      (3L, "common other stopword"),
      (4L, "stopword alone")).toDF("doc_id", "text")
    // stopword is in 4/4 docs: dropped at maxDfRatio < 1.0
    val ix = TextIndex.build(docs, "doc_id", "text", maxDfRatio = 0.9)
    val got = TextIndex.topKeywords(ix, k = 2)
      .as[(Long, String, Long)].collect().groupBy(_._1)
    assert(got(1L).map(_._2).toSet === Set("rare", "common"))
    // rare (df=1) outranks common (df=3) for doc 1 despite tf 1 vs 2
    val d1 = got(1L).sortBy(-_._3).map(_._2).toSeq
    assert(d1.head === "rare", d1.toString)
    assert(got.values.flatten.forall(_._2 != "stopword"))
  }

  test("removeDocs equals a rebuild over the remaining corpus, bit-for-bit") {
    import graft.text.TextIndex
    val docs = spark.range(0, 300).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit("w"), (col("id") * (j + 3) % 37).cast("string"))): _*).as("text"))
    val full = TextIndex.build(docs, "doc_id", "text", maxDfRatio = 0.98)
    val removed = TextIndex.removeDocs(
      full, docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
    val rebuilt = TextIndex.build(
      docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", maxDfRatio = 0.98)
    val q = spark.range(0, 4).select(col("id").as("qid"),
      concat_ws(" ", concat(lit("w"), (col("id") * 3 % 37).cast("string")),
        concat(lit("w"), (col("id") * 7 % 37).cast("string"))).as("qtext"))
    def run(ix: TextIndex.BuiltIndex) =
      TextIndex.bm25(ix, q, "qid", "qtext", k = 10)
        .as[(Long, Long, Long)].collect().toSet
    assert(removed.nDocs === rebuilt.nDocs)
    assert(removed.dlSum === rebuilt.dlSum)
    assert(run(removed) === run(rebuilt))
    // no deleted doc can ever surface
    assert(run(removed).forall(_._2 % 3 != 0))
  }
}
