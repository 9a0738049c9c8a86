package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{RangeFilter, TermFilter, TermMode}
import graft.operators.Filters
import graft.table.Crud

/** Property tests from SURVEY.md §5 (seeded-random trials): filter algebra
  * (NOT-IN complement, AND/OR conjunction semantics of the reference's
  * MultiRangeQueryResults::Has, range_query_result.h:169-179), upsert
  * idempotence, docid-merge == inner join.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val vocab = Seq("a", "b", "c", "d", "e")

  private def trials(n: Int)(body: scala.util.Random => Unit): Unit =
    (1 to n).foreach(i => body(new scala.util.Random(42L + i)))

  private def rowsOf(rng: scala.util.Random) =
    (0 until 40).map(i => (i, rng.nextInt(101), Seq.fill(3)(vocab(rng.nextInt(5)))))
      .toDF("id", "x", "tags")

  test("property: NOT-IN is the exact complement of union term filter") {
    trials(8) { rng =>
      val df = rowsOf(rng)
      val vals = Seq.fill(1 + rng.nextInt(3))(vocab(rng.nextInt(5))).distinct
      val in = df.filter(Filters.term(TermFilter("tags", vals), df))
        .select("id").as[Int].collect().toSet
      val out = df.filter(Filters.term(TermFilter("tags", vals, TermMode.NotIn), df))
        .select("id").as[Int].collect().toSet
      assert((in & out).isEmpty)
      assert(in.size + out.size === 40)
    }
  }

  test("property: All-mode term filter == intersection of single-value filters") {
    trials(6) { rng =>
      val df = rowsOf(rng)
      val vals = Seq.fill(2)(vocab(rng.nextInt(3))).distinct
      val all = df.filter(Filters.term(TermFilter("tags", vals, TermMode.All), df))
        .select("id").as[Int].collect().toSet
      val byIntersection = vals
        .map(v => df.filter(Filters.term(TermFilter("tags", Seq(v)), df))
          .select("id").as[Int].collect().toSet)
        .reduce(_ & _)
      assert(all === byIntersection)
    }
  }

  test("property: range filter conjunction == Has() AND semantics") {
    trials(6) { rng =>
      val df = rowsOf(rng)
      val lo = rng.nextInt(51); val hi = 50 + rng.nextInt(51)
      val conj = df.filter(Filters.predicate(df, Nil,
          Seq(RangeFilter("x", Some(lo), None), RangeFilter("x", None, Some(hi)))))
        .select("id").as[Int].collect().toSet
      val single = df.filter(Filters.range(RangeFilter("x", Some(lo), Some(hi))))
        .select("id").as[Int].collect().toSet
      assert(conj === single)
    }
  }

  test("property: upsert is idempotent and last-write-wins") {
    trials(5) { rng =>
      val kvs = (0 until 20).map(_ => (rng.nextInt(9), rng.nextInt(1000)))
      val base = Seq((0, -1), (1, -1)).toDF("k", "v")
      val delta = kvs.zipWithIndex.map { case ((k, v), seq) => (k, v, seq.toLong) }
        .toDF("k", "v", "seq")
      val once = Crud.upsert(base, delta, "k", Some("seq"))
      val twice = Crud.upsert(once, delta, "k", Some("seq"))
      val a = once.as[(Int, Int)].collect().toSet
      val b = twice.as[(Int, Int)].collect().toSet
      assert(a === b)
      val expect = kvs.zipWithIndex.groupBy(_._1._1).view
        .mapValues(_.maxBy(_._2)._1._2).toMap
      expect.foreach { case (k, v) => assert(a.contains((k, v))) }
    }
  }

  test("property: multi-list docid merge == inner join on id (J1)") {
    trials(6) { rng =>
      val as = Seq.fill(30)(rng.nextInt(16))
      val bs = Seq.fill(30)(rng.nextInt(16))
      val la = as.distinct.map(i => (i.toLong, i * 1.5)).toDF("id", "score_a")
      val lb = bs.distinct.map(i => (i.toLong, i * 0.5)).toDF("id", "score_b")
      val merged = la.join(lb, Seq("id"))
        .withColumn("score", col("score_a") + col("score_b"))
        .select("id").as[Long].collect().toSet
      assert(merged === (as.toSet & bs.toSet).map(_.toLong))
    }
  }

  test("property: AllPairs prefix filtering loses no pair with J >= t") {
    // the lemma ngramJaccardPairs relies on: with globally-sorted distinct
    // token sets, J(x,y) >= t implies the smallest COMMON token lies within
    // the first |x| - ceil(t|x|) + 1 tokens of x AND the first
    // |y| - ceil(t|y|) + 1 tokens of y, so an equi-join on prefix tokens
    // produces every qualifying candidate pair
    trials(20) { rng =>
      val t = Seq(0.3, 0.4, 0.5, 0.7)(rng.nextInt(4))
      val sets = (0 until 15).map { _ =>
        (0 until (3 + rng.nextInt(20))).map(_ => rng.nextInt(40).toLong)
          .distinct.sorted.toArray
      }
      // the lemma holds for ANY fixed total order over tokens (Bayardo
      // WWW'07 §3) — r11's df-ascending prefix relies on exactly this, so
      // check value order AND a random permutation order per trial
      val perm = rng.shuffle((0 until 40).toList).zipWithIndex.toMap
      val orders: Seq[Long => Long] =
        Seq(identity[Long], x => perm(x.toInt).toLong)
      for (ord <- orders) {
        def prefix(x: Array[Long]): Set[Long] = {
          val sorted = x.sortBy(ord)
          sorted.take(math.max(1, x.length - math.ceil(t * x.length).toInt + 1)).toSet
        }
        for (i <- sets.indices; j <- sets.indices if i < j) {
          val (a, b) = (sets(i), sets(j))
          val inter = a.toSet & b.toSet
          val jac = inter.size.toDouble / (a.length + b.length - inter.size)
          if (jac >= t)
            assert((prefix(a) & prefix(b)).nonEmpty,
              s"J=$jac >= $t but prefixes disjoint: ${a.toSeq} vs ${b.toSeq}")
        }
      }
    }
  }

  test("property: driver-side bucket routing equals the Column hash") {
    // get(key)'s job-free routing must agree with the bucket column every
    // write stamps — a disagreement would make point lookups miss
    trials(3) { rng =>
      val keys = (0 until 30).map(_ => rng.alphanumeric.take(8).mkString) ++
        (0 until 10).map(_ => rng.nextLong().toString)
      val n = 1 + rng.nextInt(64)
      val viaColumn = keys.toDF("k")
        .select(col("k"), graft.table.GammaTable.bucketOf(col("k"), n).as("b"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      keys.foreach { k =>
        assert(graft.table.GammaTable.bucketOfValue(k, n) === viaColumn(k),
          s"driver/Column bucket disagreement for key $k nBuckets=$n")
      }
    }
    // long-typed keys route identically too
    val longs = Seq(0L, -1L, 42L, Long.MaxValue, Long.MinValue + 1)
    val viaCol = longs.toDF("k")
      .select(col("k"), graft.table.GammaTable.bucketOf(col("k"), 16).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    longs.foreach { k =>
      assert(graft.table.GammaTable.bucketOfValue(k, 16) === viaCol(k))
    }
  }

  test("property: chunk reconstructs the doc for any (maxTokens, overlap)") {
    trials(8) { rng =>
      val maxT = 2 + rng.nextInt(30)
      val ov = rng.nextInt(maxT) // 0 <= ov < maxT
      val docs = (0 until 25).map { i =>
        (i.toLong, (0 until (1 + rng.nextInt(90))).map(j => s"w${rng.nextInt(40)}")
          .mkString(" "))
      }.toDF("doc_id", "text")
      val chunks = graft.text.TextOps.chunk(docs, "doc_id", "text", maxT, ov)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1)
      val orig = docs.as[(Long, String)].collect().toMap
      assert(chunks.keySet == orig.keySet)
      chunks.foreach { case (id, cs) =>
        val sorted = cs.sortBy(_._2)
        val rebuilt = (sorted.head._4.split(" ").toSeq ++
          sorted.tail.toSeq.flatMap(c => c._4.split(" ").drop(ov).toSeq)).mkString(" ")
        assert(rebuilt == orig(id), s"maxT=$maxT ov=$ov doc=$id")
        sorted.foreach(c => assert(c._3 <= maxT && c._3 >= 1))
      }
    }
  }

  test("property: stratified sample hits its exact quota for any frac") {
    trials(6) { rng =>
      val frac = rng.nextDouble()
      val df = (0 until 120)
        .map(i => (i.toLong, s"g${rng.nextInt(5)}", rng.nextInt(100)))
        .toDF("id", "g", "x")
      val out = graft.operators.Sample.stratifiedExact(df, "g", "id", frac)
      val want = df.groupBy("g").count().collect()
        .map(r => r.getString(0) -> math.ceil(frac * r.getLong(1)).toLong).toMap
      val got = out.groupBy("g").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      want.foreach { case (g, n) =>
        assert(got.getOrElse(g, 0L) == n, s"frac=$frac group=$g")
      }
      // membership is a subset of the input and monotone in frac: every
      // selected id is also selected at any larger fraction
      val bigger = graft.operators.Sample
        .stratifiedExact(df, "g", "id", math.min(1.0, frac + 0.3))
        .select("id").as[Long].collect().toSet
      val small = out.select("id").as[Long].collect().toSet
      assert(small.subsetOf(bigger), s"frac=$frac not monotone")
    }
  }

  test("property: bm25 ranking is invariant to corpus partitioning") {
    trials(4) { rng =>
      val vocabW = (0 until 12).map(i => s"t$i")
      val docs = (0 until 60).map { i =>
        (i.toLong, (0 until (3 + rng.nextInt(20)))
          .map(_ => vocabW(rng.nextInt(vocabW.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val q = (0 until 4).map(i =>
        (i.toLong, (0 until 3).map(_ => vocabW(rng.nextInt(vocabW.size)))
          .mkString(" "))).toDF("qid", "qtext")
      def run(d: org.apache.spark.sql.DataFrame) = {
        val ix = graft.text.TextIndex.build(d, "doc_id", "text", maxDfRatio = 0.98)
        graft.text.TextIndex.bm25(ix, q, "qid", "qtext", k = 5)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(identity).toSeq
      }
      assert(run(docs) == run(docs.repartition(7)),
        "bm25 results changed under repartitioning")
    }
  }

  test("property: bpe train matches a sequential reference on random corpora") {
    trials(5) { rng =>
      val docs = (0 until 12).map { i =>
        (i.toLong, Seq.fill(4 + rng.nextInt(8))(
          Seq.fill(2 + rng.nextInt(4))(('a' + rng.nextInt(4)).toChar).mkString)
          .mkString(" "))
      }.toDF("doc_id", "text")
      val wf = docs.select("text").as[String].collect()
        .flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
      // sequential reference (same contract as CurationOpsSpec.refBpe)
      var words = wf.map { case (w, f) => (w.map(_.toString).toVector, f) }
      val want = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (!done && want.size < 6) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((sy, f) <- words; i <- 0 until sy.size - 1)
          counts((sy(i), sy(i + 1))) = counts.getOrElse((sy(i), sy(i + 1)), 0L) + f
        if (counts.isEmpty || counts.values.max < 2) done = true
        else {
          val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a + "\u0001" + b) }._1
          want += best
          words = words.map { case (sy, f) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            for (x <- sy) {
              if (out.nonEmpty && out.last == best._1 && x == best._2)
                out(out.size - 1) = best._1 + best._2
              else out += x
            }
            (out.toVector, f)
          }
        }
      }
      val (got, _) = graft.text.Bpe.train(docs, "text", nMerges = 6)
      assert(got === want.toSeq)
    }
  }

  test("property: dedupSubstrings matches a naive reference on random corpora") {
    trials(5) { rng =>
      val n = 3
      // small vocab forces real cross-doc window duplication
      val docs = (0 until 15).map { i =>
        (i.toLong, Seq.fill(5 + rng.nextInt(10))(
          s"w${rng.nextInt(4)}").mkString(" "))
      }.toDF("doc_id", "text")
      val rows = docs.as[(Long, String)].collect().sortBy(_._1)
      // naive reference: windows, first-occurrence winners, covered removal
      val wins = rows.flatMap { case (id, t) =>
        val ws = t.split(" ", -1)
        (0 to ws.length - n).map(p => (ws.slice(p, p + n).mkString(" "), id, p))
      }
      val winners = wins.groupBy(_._1).collect {
        case (w, occ) if occ.length > 1 => w -> occ.map(o => (o._2, o._3)).min
      }
      val want = rows.map { case (id, t) =>
        val ws = t.split(" ", -1)
        val losers = (0 to ws.length - n).filter { p =>
          val w = ws.slice(p, p + n).mkString(" ")
          winners.get(w).exists(_ != ((id, p)))
        }
        id -> ws.indices.filterNot(i => losers.exists(p => i >= p && i < p + n))
          .map(ws).mkString(" ")
      }.toMap
      val got = graft.text.TextOps.dedupSubstrings(docs, "doc_id", "text", n)
        .as[(Long, String)].collect().toMap
      assert(got === want)
    }
  }

  test("property: phraseSearch matches a naive scan on random corpora") {
    trials(6) { rng =>
      val voc = Seq("a", "b", "c")
      val rows = (0L until 25L).map(i =>
        (i, Seq.fill(3 + rng.nextInt(10))(voc(rng.nextInt(3))).mkString(" ")))
      val docs = rows.toDF("doc_id", "text").repartition(1 + rng.nextInt(5))
      val phrase = Seq.fill(2 + rng.nextInt(2))(voc(rng.nextInt(3))).mkString(" ")
      val q = Seq((0L, phrase)).toDF("qid", "qtext")
      val got = graft.text.TextIndex
        .phraseSearch(docs, "doc_id", "text", q, "qid", "qtext", k = 100)
        .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
      val ph = phrase.split(" ")
      val want = rows.flatMap { case (id, t) =>
        val ws = t.split(" ")
        val n = (0 to ws.length - ph.length)
          .count(p => ws.slice(p, p + ph.length).sameElements(ph))
        if (n > 0) Some(id -> n.toLong) else None
      }.toMap
      assert(got === want, s"phrase='$phrase'")
    }
  }

  test("property: proximitySearch matches a naive window scan") {
    trials(6) { rng =>
      val voc = Seq("a", "b", "c", "d")
      val rows = (0L until 25L).map(i =>
        (i, Seq.fill(4 + rng.nextInt(12))(voc(rng.nextInt(4))).mkString(" ")))
      val docs = rows.toDF("doc_id", "text").repartition(1 + rng.nextInt(5))
      val w = 2 + rng.nextInt(5)
      val terms = Seq.fill(1 + rng.nextInt(3))(voc(rng.nextInt(4))).distinct
      val q = Seq((0L, terms.mkString(" "))).toDF("qid", "qtext")
      val got = graft.text.TextIndex
        .proximitySearch(docs, "doc_id", "text", q, "qid", "qtext", w, k = 100)
        .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
      val want = rows.flatMap { case (id, t) =>
        val ws = t.split(" ")
        val n = ws.indices.count { s =>
          val win = ws.slice(s, s + w).toSet
          terms.forall(win.contains)
        }
        if (n > 0) Some(id -> n.toLong) else None
      }.toMap
      assert(got === want, s"terms=$terms w=$w")
    }
  }

  test("property: zorder key equals a bit-twiddling scala reference") {
    trials(6) { rng =>
      val bits = 4 + rng.nextInt(10)
      val pts = (0 until 60).map(_ =>
        (rng.nextInt(1 << bits).toLong, rng.nextInt(1 << bits).toLong))
      val df = pts.toDF("x", "y")
      val got = df.select(col("x"), col("y"),
        graft.operators.ZOrder.key2(col("x"), col("y"), bits).as("z"))
        .as[(Long, Long, Long)].collect()
      got.foreach { case (x, y, z) =>
        var want = 0L
        (0 until bits).foreach { i =>
          want |= ((x >> i) & 1L) << (2 * i)
          want |= ((y >> i) & 1L) << (2 * i + 1)
        }
        assert(z === want, s"($x,$y) bits=$bits")
      }
    }
  }

  test("property: weightedTopK equals a scala reference draw") {
    trials(5) { rng =>
      val rows = (0L until 120L).map(i => (i, 1L + rng.nextInt(500)))
      val df = rows.toDF("doc_id", "w").repartition(1 + rng.nextInt(4))
      val k = 10 + rng.nextInt(30)
      val got = graft.operators.Sample.weightedTopK(df, "doc_id", "w", k)
        .as[(Long, Long, Long)].collect().toSeq
      // scala reference: identical md5/ln/integer-division key chain
      val md = java.security.MessageDigest.getInstance("MD5")
      val want = rows.map { case (id, w) =>
        val hex = md.digest(s"ws:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        val h = java.lang.Long.parseLong(hex, 16)
        val a = math.floor(math.log(8589934592.0 / (2 * h + 1).toDouble) * 1e9).toLong
        val num = a * 1000L
        (id, w, (num - (num % w)) / w)
      }.sortBy(t => (t._3, t._1)).take(k)
      assert(got === want)
    }
  }

  test("property: gamma SQL bucket pruning is conservative under random filters") {
    // pruneBuckets may only drop buckets a filter PROVABLY excludes: for
    // every random (bucketStats, filter set), every row that satisfies
    // the filters must live in a kept bucket. Rows are synthesized to
    // match the stats that advertise them, so a pruning bug (dropping a
    // bucket whose [min,max] still overlaps) shows as a lost row.
    import org.apache.spark.sql.sources._
    trials(24) { rng =>
      val nB = 1 + rng.nextInt(8)
      // per-bucket value ranges for one numeric column "x"
      val ranges = (0 until nB).map { b =>
        val lo = rng.nextInt(100); b.toLong -> (lo, lo + rng.nextInt(50))
      }.toMap
      val rows = ranges.toSeq.flatMap { case (b, (lo, hi)) =>
        Seq((b, lo), (b, hi), (b, (lo + hi) / 2))
      }
      val meta = graft.table.TableMeta(
        "p", "_id", nB, 0L, 1L,
        bucketVersions = (0 until nB).map(b => b.toString -> 1L).toMap,
        vectorFields = Nil, indexStatus = "UNINDEXED",
        bucketStats = ranges.map { case (b, (lo, hi)) =>
          b.toString -> Map("x" -> Seq(lo.toDouble, hi.toDouble))
        })
      val v = rng.nextInt(160) - 10
      val filters: Array[Filter] = rng.nextInt(6) match {
        case 0 => Array(EqualTo("x", v))
        case 1 => Array(GreaterThan("x", v))
        case 2 => Array(LessThanOrEqual("x", v))
        case 3 => Array(GreaterThanOrEqual("x", v), LessThan("x", v + rng.nextInt(40)))
        case 4 => Array(In("x", Array(v, v + 7, v + 23).map(_.asInstanceOf[Any])))
        case 5 => Array(And(GreaterThan("x", v), LessThan("x", v + 25)))
      }
      def eval(f: Filter, x: Int): Boolean = f match {
        case EqualTo(_, w) => x == w.asInstanceOf[Int]
        case GreaterThan(_, w) => x > w.asInstanceOf[Int]
        case GreaterThanOrEqual(_, w) => x >= w.asInstanceOf[Int]
        case LessThan(_, w) => x < w.asInstanceOf[Int]
        case LessThanOrEqual(_, w) => x <= w.asInstanceOf[Int]
        case In(_, vs) => vs.exists(_.asInstanceOf[Int] == x)
        case And(l, r) => eval(l, x) && eval(r, x)
        case other => fail(s"unexpected $other")
      }
      val kept = graft.sources.GammaSql.pruneBuckets(meta, filters).toSet
      rows.foreach { case (b, x) =>
        if (filters.forall(eval(_, x)))
          assert(kept(b), s"bucket $b (x=$x, range=${ranges(b)}) pruned " +
            s"but row matches ${filters.mkString(",")}")
      }
    }
  }

  test("property: every snapshot equals replaying the op prefix (time travel)") {
    // random interleavings of upserts and deletes; after the run, each
    // retained manifest version must serve EXACTLY the state a sequential
    // scala replay of the first k ops produces — the whole time-travel
    // contract in one invariant (manifest history + MVCC file retention +
    // snapshot scan all have to be right for any version to match)
    trials(3) { rng =>
      val root = java.nio.file.Files.createTempDirectory("graft_ttprop").toString
      def randBatch(): Seq[(String, Int)] =
        (0 until 1 + rng.nextInt(12)).map(_ => (s"k${rng.nextInt(20)}", rng.nextInt(1000)))
      val expect = scala.collection.mutable.Map.empty[String, Int] // replayed truth
      val states = scala.collection.mutable.Map.empty[Long, Map[String, Int]]

      // in-batch last-wins mirrors addOrUpdate's dedupLastWins(orderCol)
      def lastWins(b: Seq[(String, Int)]): Map[String, Int] = b.zipWithIndex
        .groupBy(_._1._1).map { case (k, g) => k -> g.maxBy(_._2)._1._2 }
      // create() takes no orderCol (arbitrary in-batch winner), so the
      // initial batch is pre-deduped; later batches exercise orderCol
      val first = lastWins(randBatch())
      first.foreach { case (k, v) => expect(k) = v }
      val t = graft.table.GammaTable.create(spark, root, "ttprop", "_id",
        first.toSeq.toDF("_id", "v"), nBuckets = 4)
      states(t.meta.version) = expect.toMap

      (1 to 6).foreach { _ =>
        if (rng.nextBoolean()) {
          val b = randBatch()
          lastWins(b).foreach { case (k, v) => expect(k) = v }
          t.addOrUpdate(
            b.zipWithIndex.map { case ((k, v), i) => (k, v, i) }
              .toDF("_id", "v", "_seq"), orderCol = Some("_seq"))
        } else {
          val cut = rng.nextInt(1000)
          expect.filterInPlace((_, v) => v < cut)
          t.deleteByQuery(col("v") >= cut)
        }
        states(t.meta.version) = expect.toMap
      }

      states.foreach { case (ver, want) =>
        val got = spark.read.format("gamma").option("versionAsOf", ver).load(root)
          .select("_id", "v").as[(String, Int)].collect().toMap
        assert(got === want, s"version $ver")
      }
      // and the CURRENT read equals the final snapshot
      val cur = spark.read.format("gamma").load(root)
        .select("_id", "v").as[(String, Int)].collect().toMap
      assert(cur === expect.toMap)

      // change-feed invariant: applying ANY window's net events
      // (upsert = put, delete = remove) to the window-start snapshot
      // yields the window-end snapshot — stamps, net semantics and
      // window filtering all have to be right for every pair to match
      def applyFeed(base: Map[String, Int], from: Long, to: Long): Map[String, Int] = {
        val events = spark.read.format("gamma")
          .option("changesFrom", from).option("changesTo", to).load(root)
          .select("_id", "v", "_change_type")
          .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        events.foldLeft(base) {
          case (m, (k, v, "upsert")) => m + (k -> v)
          case (m, (k, _, "delete")) => m - k
          case (m, _) => m
        }
      }
      val versions = states.keys.toSeq.sorted
      versions.sliding(2).foreach {
        case Seq(a, b) =>
          assert(applyFeed(states(a), a, b) === states(b), s"window ($a, $b]")
        case _ =>
      }
      // full replay from empty, and one random wider window
      assert(applyFeed(Map.empty, 0, versions.last) === states(versions.last))
      val i = rng.nextInt(versions.length - 1)
      val j = i + 1 + rng.nextInt(versions.length - 1 - i)
      assert(applyFeed(states(versions(i)), versions(i), versions(j)) ===
        states(versions(j)), s"window (${versions(i)}, ${versions(j)}]")
    }
  }
}
