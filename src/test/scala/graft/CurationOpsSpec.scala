package graft

import org.apache.spark.sql.functions._

import graft.operators.{Mix, Sample}
import graft.text.{Bpe, Dsir}

/** Round-8 curation operators: BPE tokenizer training, DSIR importance
  * weighting, temperature mixing, leakage-safe splits — each against an
  * independent driver-side Scala reference.
  */
class CurationOpsSpec extends GraftSuite {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "low lower lowest low low"),
    (2L, "new newer newest new low"),
    (3L, "wide wider widest new newer"),
    (4L, "low new wide wide")).toDF("doc_id", "text")

  // ------------------------------------------------------------ BPE

  private def refPairCounts(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.split(" ")).filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }

  test("bpe pairCounts matches a sliding-window reference") {
    val want = refPairCounts(corpus.select("text").as[String].collect().toSeq)
    val got = Bpe.pairCounts(corpus, "text", k = 1000)
      .as[(String, Long)].collect().toMap
    assert(got === want)
  }

  /** Reference sequential BPE over a word-frequency map. */
  private def refBpe(words0: Map[String, Long], n: Int): Seq[(String, String)] = {
    var words = words0.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty || counts.values.max < 2) done = true
      else {
        // greatest count; ties by ascending pair key (a + sep + b)
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a + "\u0001" + b) }._1
        merges += best
        words = words.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          for (s <- syms) {
            if (out.nonEmpty && out.last == best._1 && s == best._2) {
              out(out.size - 1) = best._1 + best._2
            } else out += s
          }
          (out.toVector, f)
        }
      }
    }
    merges.toSeq
  }

  test("bpe train reproduces the sequential reference merge list") {
    val wf = corpus.select("text").as[String].collect()
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val want = refBpe(wf, 8)
    val (got, _) = Bpe.train(corpus, "text", nMerges = 8)
    assert(got === want)
  }

  test("bpe applyMerge is left-to-right non-overlapping") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq("b", "a", "a"))
      .toDF("s")
    val got = df.select(Bpe.applyMerge(col("s"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got === Seq(Seq("aa", "a"), Seq("aa", "aa"), Seq("b", "aa")))
  }

  test("bpe segment concatenates back to the original words") {
    val (merges, _) = Bpe.train(corpus, "text", nMerges = 6)
    assert(merges.nonEmpty)
    val out = Bpe.segment(corpus, "text", merges, "toks")
      .select(col("doc_id"), concat_ws("", col("toks")).as("joined"),
        regexp_replace(col("text"), " ", "").as("orig"))
      .filter(col("joined") =!= col("orig"))
    assert(out.count() === 0)
  }

  // ------------------------------------------------------------ DSIR

  private def md5Bucket(s: String, buckets: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  test("dsir score matches an integer-arithmetic Scala reference") {
    val B = 64
    val docs = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
    def gramsOf(t: String): Seq[String] = {
      val w = t.split(" ", -1).toSeq
      w ++ (if (w.size >= 2) w.sliding(2).map(_.mkString(" ")).toSeq else Nil)
    }
    val target = docs.filter(_._1 % 2 == 0) // doc_ids 2, 4
    val tCounts = target.flatMap(d => gramsOf(d._2)).map(md5Bucket(_, B))
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val rCounts = docs.flatMap(d => gramsOf(d._2)).map(md5Bucket(_, B))
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val nt = tCounts.values.sum; val nr = rCounts.values.sum
    def lnMicro(num: Long, den: Long): Long =
      math.floor(math.log(num.toDouble / den.toDouble) * 1e6).toLong
    def lr(b: Long): Long =
      lnMicro(tCounts.getOrElse(b, 0L) + 1, nt + B) -
        lnMicro(rCounts.getOrElse(b, 0L) + 1, nr + B)
    val want = docs.map { case (id, t) =>
      val g = gramsOf(t)
      (id, g.size.toLong, g.map(x => lr(md5Bucket(x, B))).sum)
    }.toSet

    val m = Dsir.model(corpus.filter(col("doc_id") % 2 === 0), corpus, "text", B)
    assert(m.count() === B, "model must be dense over all buckets")
    val got = Dsir.score(corpus, "doc_id", "text", m, B)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("dsir modelFromSlice equals the two-corpus model bit-for-bit") {
    val B = 64
    val a = graft.text.Dsir.model(
      corpus.filter(col("doc_id") % 2 === 0), corpus, "text", B)
      .as[(Long, Long)].collect().toMap
    val b = graft.text.Dsir.modelFromSlice(
      corpus, "text", col("doc_id") % 2 === 0, B)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  // ------------------------------------- temperature mixing / splits

  test("temperature sampling: rates are exact, kept count tracks target") {
    val df = spark.range(0, 10000).select(col("id").as("doc_id"),
      when(col("id") % 10 === 0, "rare").otherwise("common").as("src"))
    val out = Mix.temperatureSample(df, "doc_id", "src", targetRows = 2000)
    val rates = out.select("src", "keep_rate_micro").distinct()
      .as[(String, Long)].collect().toMap
    // Scala reference of the exact integer derivation
    def ref(): Map[String, Long] = {
      val n = Map("rare" -> 1000L, "common" -> 9000L); val tot = 10000L
      val w = n.map { case (k, v) =>
        k -> math.floor(math.sqrt(v.toDouble / tot) * 1e6).toLong }
      val wtot = w.values.sum
      n.map { case (k, v) =>
        k -> math.min(1000000L, 2000L * (w(k) * 1000000L / wtot) / v) }
    }
    assert(rates === ref())
    // rare keeps a ~3x higher rate than proportional; total lands near 2000
    assert(rates("rare") > rates("common"))
    val kept = out.count()
    assert(kept > 1500 && kept < 2500, s"kept=$kept")
    // pure function of id: stable under repartition
    val again = Mix.temperatureSample(df.repartition(13), "doc_id", "src", 2000)
    assert(again.select("doc_id").exceptAll(out.select("doc_id")).isEmpty)
  }

  test("mmr rerank diversifies: near-duplicate of pick 1 is demoted") {
    import graft.operators.Mmr
    // q = e1 direction; id 2 duplicates id 1 exactly, id 3 is diverse.
    // At lambda=0.4: dup scores 0.4·1 − 0.6·1 = −0.2, diverse scores
    // 0.4·0.6 − 0.6·0.6 = −0.12 → the duplicate is demoted to rank 3.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f)),
      (9L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val cands = Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("qid", "id")
    val got = Mmr.rerank(cands, "qid", "id", vecs, "vec_id", "embedding",
        k = 3, lambda = 0.4)
      .orderBy("mmr_rank").select("id").as[Long].collect().toSeq
    // pure relevance order would be 1, 2, 3; MMR demotes the duplicate 2
    assert(got === Seq(1L, 3L, 2L))
  }

  test("mmr picks are distinct, ranked 1..k, first pick is argmax relevance") {
    import graft.operators.Mmr
    val vecs = spark.range(0, 200).select(col("id").as("vec_id"),
      array((0 until 8).map(d =>
        sin(col("id") * (d + 1)).cast("float")): _*).as("embedding"))
    val cands = spark.range(0, 200).select(lit(7L).as("qid"), col("id"))
    val out = Mmr.rerank(cands, "qid", "id", vecs, "vec_id", "embedding",
      k = 5, lambda = 0.5).collect()
    assert(out.length === 5)
    assert(out.map(_.getLong(1)).distinct.length === 5)
    assert(out.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // rank 1 must be the pure-relevance argmax (query id 7 itself)
    val r1 = out.find(_.getLong(2) == 1L).get.getLong(1)
    assert(r1 === 7L)
  }

  test("group-hash split: groups never straddle splits, labels exhaustive") {
    val df = spark.range(0, 5000).select(col("id").as("doc_id"),
      (col("id") % 97).cast("string").as("grp"))
    val out = Sample.splitByGroupHash(df, "grp",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // every group maps to exactly one split
    assert(out.select("grp", "split").distinct().groupBy("grp").count()
      .filter(col("count") > 1).count() === 0)
    val bySplit = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))
    // zero-shuffle projection
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("weightedTopK: exactly k rows, deterministic across partitioning") {
    val df = spark.range(0, 2000).select(
      col("id").as("doc_id"), (col("id") % 37 + 1).as("w"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Sample.weightedTopK(d, "doc_id", "w", k = 50)
        .as[(Long, Long, Long)].collect().toSeq
    val base = run(df)
    assert(base.size === 50)
    assert(run(df.repartition(17)) === base)
    // keys come out sorted ascending (smallest exponential key wins)
    assert(base.map(_._3) === base.map(_._3).sorted)
  }

  test("weightedTopK favors heavy rows; zero weights never selected") {
    // 1000 light rows (w=1) + 20 heavy rows (w=1000): heavy mass is
    // 20000/21000 ≈ 95%, so nearly all heavies should make top-50 of the
    // deterministic draw; zero-weight rows are excluded outright
    val light = spark.range(0, 1000).select(col("id").as("doc_id"), lit(1L).as("w"))
    val heavy = spark.range(1000, 1020).select(col("id").as("doc_id"), lit(1000L).as("w"))
    val zero = spark.range(2000, 2010).select(col("id").as("doc_id"), lit(0L).as("w"))
    val got = Sample.weightedTopK(light.union(heavy).union(zero), "doc_id", "w", k = 50)
      .as[(Long, Long, Long)].collect()
    val heavies = got.count(r => r._1 >= 1000 && r._1 < 1020)
    assert(heavies >= 15, s"only $heavies of 20 heavy rows selected")
    assert(got.forall(_._1 < 2000))
  }

  test("weightedTopK: sampling WITHOUT replacement (distinct ids)") {
    val df = spark.range(0, 100).select(col("id").as("doc_id"), lit(5L).as("w"))
    val got = Sample.weightedTopK(df, "doc_id", "w", k = 40).as[(Long, Long, Long)].collect()
    assert(got.map(_._1).distinct.length === 40)
  }

  test("weightedTopKPerGroup: exact per-group quotas, same keys as global") {
    val df = spark.range(0, 900).select(
      col("id").as("doc_id"), (col("id") % 3).cast("string").as("grp"),
      (col("id") % 23 + 1).as("w"))
    val got = Sample.weightedTopKPerGroup(df, "grp", "doc_id", "w", k = 10)
      .as[(String, Long, Long, Long)].collect()
    assert(got.groupBy(_._1).view.mapValues(_.length).toMap ===
      Map("0" -> 10, "1" -> 10, "2" -> 10))
    // deterministic across partitioning
    val again = Sample.weightedTopKPerGroup(df.repartition(13), "grp", "doc_id", "w", k = 10)
      .as[(String, Long, Long, Long)].collect()
    assert(again.toSet === got.toSet)
    // a single-group input degenerates to the global draw
    val one = df.withColumn("grp", lit("all"))
    val grouped = Sample.weightedTopKPerGroup(one, "grp", "doc_id", "w", k = 25)
      .as[(String, Long, Long, Long)].collect().map(r => (r._2, r._3, r._4)).toSet
    val global = Sample.weightedTopK(df, "doc_id", "w", k = 25)
      .as[(Long, Long, Long)].collect().toSet
    assert(grouped === global)
  }
}
