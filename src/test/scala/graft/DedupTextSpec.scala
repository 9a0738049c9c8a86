package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.media.MediaOps
import graft.text.TextOps

class DedupTextSpec extends GraftSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf0/embeddings.parquet")

  test("hammingPairs collapse: identical + near hashes, brute-equal; clusters path identical") {
    // hash pool with PLANTED mass groups (many ids share a hash) and
    // near-neighbors (1-2 bit flips) — the web-corpus shape the unique
    // fixtures can't produce
    val rnd = new scala.util.Random(42)
    val bases = Array.fill(24)(rnd.nextLong())
    val rows = (0L until 400L).map { id =>
      val b = bases(rnd.nextInt(bases.length))
      val h = rnd.nextInt(4) match {
        case 0 | 1 => b                                   // exact dup mass
        case 2 => b ^ (1L << rnd.nextInt(64))             // 1-bit neighbor
        case _ => b ^ (1L << rnd.nextInt(64)) ^ (1L << rnd.nextInt(64))
      }
      (id, h)
    }
    val df = rows.toDF("id", "h")
    val got = Dedup.hammingPairs(df, "id", "h", bits = 64, blocks = 4, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got === want, s"got ${got.size} want ${want.size}")
    // cluster path: identical output to clustering the id-level pairs,
    // on BOTH component engines (driver union-find and star-contraction)
    val viaPairs = Dedup.duplicateClusters(
      Dedup.hammingPairs(df, "id", "h").select("a", "b"))
      .as[(Long, Long)].collect().toMap
    val viaCollapse = Dedup.hammingClusters(df, "id", "h")
      .as[(Long, Long)].collect().toMap
    assert(viaCollapse === viaPairs)
    val viaCollapseDist = Dedup.hammingClusters(df, "id", "h", maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaCollapseDist === viaPairs)
    // an isolated multi-member hash (no cross-hash edge) still clusters
    val lone = Seq((5L, 123L), (9L, 123L), (7L, 1L << 40)).toDF("id", "h")
    assert(Dedup.hammingClusters(lone, "id", "h")
      .as[(Long, Long)].collect().toMap === Map(5L -> 5L, 9L -> 5L))
  }

  test("hammingClusters: one 20k-member identical-fingerprint group costs one node, not 2e8 pairs") {
    // the r13 hazard: identical fingerprints piled into one (block, key)
    // bucket and the join output went quadratic. Collapsed, the blocked
    // join sees ONE node for the whole group and the cluster output is
    // linear in members.
    val df = spark.range(20000).select(col("id"), lit(0x5a5a5a5aL).as("h"))
    val t0 = System.nanoTime()
    val clusters = Dedup.hammingClusters(df, "id", "h")
    assert(clusters.count() === 20000L)
    assert(clusters.agg(countDistinct(col("cluster"))).head().getLong(0) === 1L)
    assert(clusters.agg(min(col("cluster"))).head().getLong(0) === 0L)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 60, f"collapse path took $sec%.1f s on one mass group")
    // the fingerprint-level candidate join sees zero pairs (one node)
    val sigs = df.select(col("id"), col("h").cast("long").as("sh"))
    assert(Dedup.fingerprintPairs(sigs, 64, 4, 3).count() === 0L)
    // and no all-pairs plan anywhere
    val plan = clusters.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("duplicateClusters: chained pairs collapse to min-id components") {
    import spark.implicits._
    // 1-2-3 chained (1,3 never paired directly), 10-11 separate; docs with
    // no near-dup pair (e.g. 20) get NO cluster row — asserted by the
    // exact map equality (the DuckDB oracle omits them too)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = graft.dedup.Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // the distributed label-propagation loop (maxDriverEdges = 0 forces the
    // scale path) must produce the SAME min-label components
    val dist = graft.dedup.Dedup.duplicateClusters(pairs, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist === got)
    // and on a real pair list (string/long mix + larger chains): both paths
    // agree on the minhash pairs of the documents table
    val real = graft.dedup.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
    val a = graft.dedup.Dedup.duplicateClusters(real).as[(Long, Long)].collect().toSet
    val b = graft.dedup.Dedup.duplicateClusters(real, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("star contraction matches union-find on adversarial graph shapes") {
    // long chain (worst case for label propagation: diameter = n), a
    // cycle, star, two merged blobs, and a deterministic random graph —
    // all labeled against the driver union-find ground truth
    val rnd = new scala.util.Random(7)
    val chain = (0L until 60L).sliding(2).map(s => (s(0), s(1))).toSeq
    val cycle = Seq((100L, 101L), (101L, 102L), (102L, 103L), (103L, 100L))
    val star = (201L to 208L).map(v => (200L, v))
    val blobs = Seq.fill(80)((300L + rnd.nextInt(20), 300L + rnd.nextInt(20))) ++
      Seq.fill(80)((400L + rnd.nextInt(20), 400L + rnd.nextInt(20))) ++
      Seq((305L, 405L)) // bridge the blobs
    val pairs = (chain ++ cycle ++ star ++ blobs).toDF("a", "b")
    val want = graft.dedup.Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    val got = graft.dedup.Dedup.duplicateClusters(pairs, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    // chain collapses to min label 0; bridged blobs share one min
    assert(got(59L) === 0L && got(419L) === got(301L))
  }

  test("minhash LSH candidates contain every true high-jaccard pair") {
    val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // at j >= 0.5 with 4 bands of 4 rows the detection probability is ~1;
    // the planted near-dups have j >= 0.5
    assert(brute.nonEmpty)
    assert(brute.subsetOf(lsh) || (brute -- lsh).size <= brute.size / 10,
      s"LSH missed ${(brute -- lsh).size} of ${brute.size} true pairs")
    // verification step means no false positives above threshold
    assert(lsh.subsetOf(brute))
  }

  test("identical texts collapse: simhash distance 0, fingerprint equal, exact group") {
    val dup = docs.limit(3).select($"doc_id" + 100000, $"text")
      .toDF("doc_id", "text")
    val both = docs.select($"doc_id", $"text").unionByName(dup)
    val groups = Dedup.exactGroups(both, "doc_id", "text")
    assert(groups.count() === 3)
    val sh = Dedup.simhashPairs(both, "doc_id", "text", maxHamming = 0)
    val zero = sh.filter($"b" === $"a" + 100000).count()
    assert(zero === 3)
    val fps = both.select(TextOps.fingerprint($"text").as("fp"), $"doc_id")
    val fpDup = fps.groupBy("fp").count().filter($"count" >= 2).count()
    assert(fpDup >= 3)
  }

  test("cosine LSH pairs trade recall for candidate reduction") {
    val brute = Dedup.cosinePairs(emb, "vec_id", "embedding", 0.45)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.cosineLshPairs(emb, "vec_id", "embedding", 0.45)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute)) // verify step: no false positives
    assert(brute.isEmpty || lsh.size.toDouble / brute.size >= 0.3,
      s"LSH recall ${lsh.size}/${brute.size}")
  }

  test("fingerprint is order-sensitive") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val fps = df.select(TextOps.fingerprint($"text")).as[Long].collect()
    assert(fps(0) !== fps(1))
  }

  test("media plumbing: payload, features, frame sampling keep schema + determinism") {
    val m = MediaOps.withPayload(docs.limit(50), "text", kind = "video")
    assert(m.schema("bytes").dataType === org.apache.spark.sql.types.BinaryType)
    val f1 = MediaOps.extractFeaturesStub(m).select("doc_id", "features")
    val f2 = MediaOps.extractFeaturesStub(m.repartition(7)).select("doc_id", "features")
    // deterministic regardless of partitioning
    assert(f1.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSet ===
      f2.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSet)
    val frames = MediaOps.frameSampleStub(m, 4)
    assert(frames.count() === 200)
    assert(frames.groupBy("doc_id").count().select(max("count")).head().getLong(0) === 4)
  }

  test("ngram repetition: 0 for all-unique, rises with repeats, 0 below n words") {
    val docs = Seq(
      (1L, "a b c d e f"),          // 4 unique trigrams
      (2L, "x y x y x y x y"),      // 6 trigrams, 2 distinct
      (3L, "one two"),              // shorter than n
      (4L, "w w w w")               // 2 trigrams, 1 distinct
    ).toDF("id", "text")
    val got = docs.select($"id",
        TextOps.ngramRepetition($"text", 3).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) === 0.0)
    assert(math.abs(got(2L) - (1.0 - 2.0 / 6.0)) < 1e-9)
    assert(got(3L) === 0.0)
    assert(math.abs(got(4L) - 0.5) < 1e-9)
  }

  test("decontamination flags eval-overlapping docs and drops them") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated words appear here today"),
      (3L, "the quick brown fox sat still")).toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox jumps high")).toDF("eid", "etext")
    val hits = Dedup.contaminationHits(train, "doc_id", "text",
        eval, "etext", shingleN = 3, minHits = 2)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "the quick brown","quick brown fox","brown fox jumps";
    // doc 3 shares the first two; doc 2 shares none
    assert(hits === Map(1L -> 3L, 3L -> 2L))
    val kept = Dedup.decontaminate(train, "doc_id", "text", eval, "etext",
      shingleN = 3, minHits = 2).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(2L))
    // shuffle-join path agrees with the broadcast default
    val shuffled = Dedup.contaminationHits(train, "doc_id", "text",
        eval, "etext", shingleN = 3, minHits = 2, broadcastEval = false)
      .as[(Long, Long)].collect().toMap
    assert(shuffled === hits)
  }

  test("quality score bounded in [0,1]") {
    val q = docs.select(TextOps.qualityScore($"text").as("q")).as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("dedupSubstrings removes shifted copies at any alignment") {
    val df = Seq(
      (0L, "aa bb cc dd ee"),
      (1L, "xx yy aa bb cc dd zz"),   // copy of 0's run, shifted by 2
      (2L, "pp qq rr ss tt")).toDF("doc_id", "text")
    val got = graft.text.TextOps.dedupSubstrings(df, "doc_id", "text", 3)
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      0L -> "aa bb cc dd ee",         // winner keeps everything
      1L -> "xx yy zz",               // covered tokens aa..dd stripped
      2L -> "pp qq rr ss tt"))        // untouched
  }

  test("dedupSubstrings: exact duplicate doc empties, winner intact") {
    val df = Seq(
      (5L, "aa bb cc dd"),
      (9L, "aa bb cc dd"),
      (7L, "x")).toDF("doc_id", "text") // shorter than the window: untouched
    val got = graft.text.TextOps.dedupSubstrings(df, "doc_id", "text", 3)
      .as[(Long, String)].collect().toMap
    assert(got === Map(5L -> "aa bb cc dd", 9L -> "", 7L -> "x"))
  }

  test("semanticDedup equals brute-force dedup when clusters are separated") {
    // two tight orthogonal clusters + isolated points: k-means with k=2
    // cannot split a true pair, so SemDeDup must equal the exact path
    val rnd = new scala.util.Random(3)
    def jitter(base: Array[Float]): Seq[Float] =
      base.zipWithIndex.map { case (v, i) => v + (rnd.nextGaussian() * 0.01).toFloat }.toSeq
    val e1 = Array.tabulate(64)(i => if (i < 32) 1.0f else 0.0f)
    val e2 = Array.tabulate(64)(i => if (i >= 32) 1.0f else 0.0f)
    val rows = (0L until 10L).map(i => (i, jitter(e1))) ++
      (10L until 20L).map(i => (i, jitter(e2))) ++
      Seq((20L, Array.tabulate(64)(i => (if (i % 2 == 0) 1.0f else -1.0f)).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val sem = Dedup.semanticDedup(df, "vec_id", "embedding",
      numClusters = 2, threshold = 0.9, sampleSize = 100)
      .select("vec_id").as[Long].collect().toSet
    val bruteLosers = Dedup.duplicateClusters(
        Dedup.cosinePairs(df, "vec_id", "embedding", 0.9).select("a", "b"))
      .filter(col("id") =!= col("cluster")).select("id").as[Long].collect().toSet
    assert(sem === (0L to 20L).toSet -- bruteLosers)
    assert(sem === Set(0L, 10L, 20L)) // one keeper per cluster + the outlier
  }

  test("semanticDedup: losers subset of brute-force losers, recall measured") {
    // k sized to the fixture (~200 vectors): SemDeDup's recall knob is
    // cluster count vs corpus size — k too high splits true pairs
    val sem = Dedup.semanticDedup(emb, "vec_id", "embedding",
      numClusters = 4, threshold = 0.45).select("vec_id").as[Long].collect().toSet
    val all = emb.select("vec_id").as[Long].collect().toSet
    val semLosers = all -- sem
    val bruteLosers = Dedup.duplicateClusters(
        Dedup.cosinePairs(emb, "vec_id", "embedding", 0.45).select("a", "b"))
      .filter(col("id") =!= col("cluster")).select("id").as[Long].collect().toSet
    // within-cluster pairs are a subset of all pairs -> can only UNDER-drop
    assert(semLosers.subsetOf(bruteLosers), (semLosers -- bruteLosers).take(5).toString)
    val recall = semLosers.size.toDouble / bruteLosers.size.max(1)
    info(f"semantic-dedup loser recall vs brute force: $recall%.3f " +
      s"(${semLosers.size}/${bruteLosers.size})")
    assert(recall >= 0.5, f"recall $recall%.3f")
  }

  test("crossMinhashPairs = within-corpus pairs restricted to cross pairs") {
    // within-corpus pairs over the full table, keyed (min, max); the
    // cross operator over the odd/even split must produce exactly the
    // odd-even subset, oriented (new=odd, ref=even) — and nothing
    // from inside either side
    val within = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val expected = within.collect {
      case (a, b, j) if a % 2 != b % 2 =>
        if (a % 2 == 1) (a, b, j) else (b, a, j)
    }
    val cross = Dedup.crossMinhashPairs(
        docs.filter(col("doc_id") % 2 === 1), docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(cross === expected)
    assert(cross.forall { case (a, b, _) => a % 2 == 1 && b % 2 == 0 })
  }

  test("crossMinhashPairs finds planted cross dups, ignores within dups") {
    val newSide = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight again"),
      (3L, "completely different words about storage engines and logs"),
      (5L, "completely different words about storage engines and logs")) // within-new dup
      .toDF("doc_id", "text")
    val refSide = Seq(
      (2L, "the quick brown fox jumps over the lazy dog tonight again"),
      (4L, "unrelated reference text regarding query planners and joins"))
      .toDF("doc_id", "text")
    val got = Dedup.crossMinhashPairs(newSide, refSide, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.map(p => (p._1, p._2)) === Set((1L, 2L)))
    assert(got.head._3 === 1.0)
  }
}
