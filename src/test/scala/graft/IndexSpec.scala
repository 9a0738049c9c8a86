package graft

import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.index.{IndexParams, IndexRegistry, IvfFlatIndex, IvfPqIndex}
import graft.operators.Knn

/** Recall tests in the spirit of the reference benchmark method: ANN
  * results measured against exact (FLAT) ground truth
  * (reference benchs/README.md:5).
  */
class IndexSpec extends GraftSuite {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0/embeddings.parquet")
  private lazy val queries: Seq[(Long, Array[Float])] =
    emb.filter($"vec_id" < 10).select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toSeq

  private def groundTruth(
      k: Int, qs: Seq[(Long, Array[Float])] = queries): Map[Long, Set[Long]] = {
    val q = qs.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
    Knn.flatSearch(emb, "vec_id", "embedding", q, "qid", "qvec", k, Metric.L2)
      .select($"qid", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  private def recallAt(res: org.apache.spark.sql.DataFrame, truth: Map[Long, Set[Long]]): Double = {
    val got = res.select($"qid", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val per = truth.map { case (q, t) => got.getOrElse(q, Set.empty).count(t).toDouble / t.size }
    per.sum / per.size
  }

  test("IVFFLAT with full probes equals exact search") {
    val idx = IndexRegistry.build("IVFFLAT", spark, emb, "vec_id", "embedding",
      IndexParams(ncentroids = 8))
    val res = idx.search(queries, k = 10, nprobe = Some(8))
    assert(recallAt(res, groundTruth(10)) === 1.0)
  }

  test("IVFFLAT partial probes reach recall plateau (reference nprobe sweep)") {
    val idx = IndexRegistry.build("IVFFLAT", spark, emb, "vec_id", "embedding",
      IndexParams(ncentroids = 16))
    val truth = groundTruth(10)
    val r4 = recallAt(idx.search(queries, 10, Some(4)), truth)
    val r8 = recallAt(idx.search(queries, 10, Some(8)), truth)
    // synthetic embeddings are near-uniform (much harder for IVF than the
    // clustered SIFT/VGG sets of BASELINE.md) — plateau shape is what we
    // assert, not absolute SIFT-level recall
    assert(r4 >= 0.6, s"recall@10 with nprobe=4 was $r4")
    assert(r8 >= r4 - 1e-9)
    assert(r8 >= 0.8, s"recall@10 with nprobe=8 was $r8")
  }

  test("IVFPQ with re-rank reaches recall target; ADC-only is weaker but sane") {
    val p = IndexParams(ncentroids = 8, nsubvector = 8, recallNum = 100)
    val idx = IndexRegistry.build("IVFPQ", spark, emb, "vec_id", "embedding", p)
    val truth = groundTruth(10)
    val ranked = recallAt(idx.search(queries, 10, Some(8)), truth)
    assert(ranked >= 0.95, s"IVFPQ(rerank) recall@10 was $ranked")
    val adcOnly = IndexRegistry.build("IVFPQ", spark, emb, "vec_id", "embedding",
      p.copy(hasRank = false)).search(queries, 10, Some(8))
    val adcRecall = recallAt(adcOnly, truth)
    assert(adcRecall >= 0.5, s"IVFPQ(adc) recall@10 was $adcRecall")
  }

  test("filter pushdown into index scan (allowedIds semi-join)") {
    val allowed = emb.filter($"label".isin(1, 3, 5, 7)).select($"vec_id")
    val idx = IndexRegistry.build("IVFFLAT", spark, emb, "vec_id", "embedding",
      IndexParams(ncentroids = 8))
    val res = idx.search(queries, 10, Some(8), allowedIds = Some(allowed))
    val okIds = allowed.as[Long].collect().toSet
    assert(res.select("id").as[Long].collect().forall(okIds))
    // matches exact filtered search
    val q = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
    val exact = Knn.flatSearch(emb.filter($"label".isin(1, 3, 5, 7)),
      "vec_id", "embedding", q, "qid", "qvec", 10, Metric.L2)
    assert(recallAt(res, exact.select($"qid", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap) === 1.0)
  }

  test("BINARYIVF: full probes equal exact hamming search; partial probes sane") {
    val docs = spark.read.parquet(s"$sf0/documents.parquet")
      .select($"doc_id", unhex(md5($"text")).as("code"))
    val idx = graft.index.BinaryIvfIndex.build(spark, docs, "doc_id", "code",
      IndexParams(ncentroids = 8))
    val qs = docs.filter($"doc_id" < 5)
      .select($"doc_id", $"code").as[(Long, Array[Byte])].collect().toSeq
    val full = idx.searchBytes(qs, 10, Some(8)).select($"qid", $"id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact ground truth via brute-force hamming
    val q = qs.map { case (i, c) => (i, c) }.toDF("qid", "qcode")
    val exact = graft.operators.TopK.perGroup(
        docs.crossJoin(broadcast(q)).select($"qid", $"doc_id".as("id"),
          graft.functions.hamming($"code", $"qcode").as("hdist")),
        "qid", "hdist", ascending = true, k = 10, tieBreak = Seq("id"))
      .select($"qid", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(full === exact)
    // self-doc always hits at distance 0 even with partial probes
    val partial = idx.searchBytes(qs, 3, Some(2))
    assert(partial.filter($"qid" === $"id").count() === 5)
  }

  test("score range filters inside the scan, before the top-k heap") {
    // full probes = exact, so the index result must equal flatSearch with
    // the same range: out-of-range near hits must NOT consume the budget
    // (reference IsSimilarScoreValid inside the scan, gamma_common_data.h:96)
    val idx = IndexRegistry.build("IVFFLAT", spark, emb, "vec_id", "embedding",
      IndexParams(ncentroids = 8))
    val res = idx.search(queries, 10, Some(8), minScore = Some(2.0), maxScore = Some(8.0))
    val q = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
    val exact = Knn.flatSearch(emb, "vec_id", "embedding", q, "qid", "qvec", 10,
      Metric.L2, minScore = Some(2.0), maxScore = Some(8.0))
    assert(res.select("qid", "id").collect().toSet === exact.select("qid", "id").collect().toSet)
    val scores = res.select("score").as[Double].collect()
    assert(scores.forall(s => s >= 2.0 && s <= 8.0))
    // and the same through IVFPQ's exact re-rank stage
    val pq = IndexRegistry.build("IVFPQ", spark, emb, "vec_id", "embedding",
      IndexParams(ncentroids = 8, nsubvector = 8, recallNum = 100000))
    val pqRes = pq.search(queries, 10, Some(8), minScore = Some(2.0), maxScore = Some(8.0))
    assert(pqRes.select("qid", "id").collect().toSet ===
      exact.select("qid", "id").collect().toSet)
  }

  test("IVFPQ inner-product: IP LUT ordering and metric-aware probes") {
    val ipTruth = {
      val q = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
      Knn.flatSearch(emb, "vec_id", "embedding", q, "qid", "qvec", 10, Metric.InnerProduct)
        .select($"qid", $"id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    }
    val p = IndexParams(metric = Metric.InnerProduct,
      ncentroids = 8, nsubvector = 8, recallNum = 100000)
    // re-rank path: exhaustive recall_num + full probes = exact
    val ranked = IndexRegistry.build("IVFPQ", spark, emb, "vec_id", "embedding", p)
      .search(queries, 10, Some(8))
    assert(recallAt(ranked, ipTruth) === 1.0)
    // ADC-only path: descending scores, sane recall (was unordered garbage
    // before the IP LUT — the ascending-L2 heap returned the WORST hits)
    val adc = IndexRegistry.build("IVFPQ", spark, emb, "vec_id", "embedding",
      p.copy(hasRank = false)).search(queries, 10, Some(8))
    val adcRecall = recallAt(adc, ipTruth)
    assert(adcRecall >= 0.5, s"IVFPQ(adc,ip) recall@10 was $adcRecall")
    // cosine is rejected without re-rank support
    intercept[IllegalArgumentException] {
      IndexRegistry.build("IVFPQ", spark, emb, "vec_id", "embedding",
        p.copy(metric = Metric.Cosine))
    }
  }

  test("BASELINE recall proxy: IVFPQ meets the reference's recall rows at scaled knobs") {
    // BASELINE.md: Vearch recall@1 = 0.9814 / recall@10 = 0.9902 on SIFT1M
    // at (ncentroids=1024, nprobe=40, nbytes=64). Documented proxy per the
    // port target: the driver's synthetic embeddings (d=64, ~5k rows at
    // sf0.01, near-uniform — HARDER for IVF than clustered SIFT) with
    // knobs scaled to the table (ncentroids=64 ~ sqrt(n)*... , nprobe=40,
    // nsubvector=8 -> 8 subspaces like nbytes/dsub of the reference
    // config, recall_num=100 as shipped). Measured: recall@1 = 1.0,
    // recall@10 = 0.982 over 50 queries (deterministic: seeded k-means,
    // fixed data).
    val qs = emb.filter($"vec_id" < 50).select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val idx = IndexRegistry.build("IVFPQ", spark, emb, "vec_id", "embedding",
      IndexParams(ncentroids = 64, nsubvector = 8, recallNum = 100))
    val r1 = recallAt(idx.search(qs, 1, Some(40)), groundTruth(1, qs))
    val r10 = recallAt(idx.search(qs, 10, Some(40)), groundTruth(10, qs))
    assert(r1 >= 0.98, s"recall@1 $r1 below the 0.9814 baseline row")
    assert(r10 >= 0.95, s"recall@10 $r10 (baseline 0.9902 on easier SIFT)")
  }

  test("OPQ rotation: orthonormal, exact-rerank unchanged, ADC still sane") {
    val p = IndexParams(ncentroids = 8, nsubvector = 8, recallNum = 100000, opq = true)
    val idx = IndexRegistry.build("IVFPQ", spark, emb, "vec_id", "embedding", p)
      .asInstanceOf[IvfPqIndex]
    // rotation is orthonormal: R R^T = I
    val r = idx.rotation.get
    val d = r.length
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(t => r(i)(t) * r(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8, s"RR^T($i,$j)=$dot")
    }
    // exhaustive re-rank in original space -> exact despite rotation
    assert(recallAt(idx.search(queries, 10, Some(8)), groundTruth(10)) === 1.0)
    // ADC-only in rotated space still functions as a recall stage
    val adc = IndexRegistry.build("IVFPQ", spark, emb, "vec_id", "embedding",
      p.copy(hasRank = false, recallNum = 100)).search(queries, 10, Some(8))
    val adcRecall = recallAt(adc, groundTruth(10))
    assert(adcRecall >= 0.5, s"OPQ ADC recall@10 was $adcRecall")
    // rotation survives save/load
    val root = java.nio.file.Files.createTempDirectory("graft_opq").toString
    idx.save(root)
    val re = IvfPqIndex.load(spark, root, emb.select($"vec_id", $"embedding"),
      "vec_id", "embedding", p)
    assert(re.rotation.isDefined)
    assert(re.search(queries, 10, Some(8)).select("qid", "id").collect().toSet ===
      idx.search(queries, 10, Some(8)).select("qid", "id").collect().toSet)
  }

  test("HNSW per-partition graphs: recall floor, filter pushdown, determinism") {
    val p = IndexParams(nlinks = 16, efConstruction = 100, efSearch = 64)
    val idx = IndexRegistry.build("HNSW", spark, emb, "vec_id", "embedding", p)
    val truth = groundTruth(10)
    val r = recallAt(idx.search(queries, 10), truth)
    assert(r >= 0.9, s"HNSW recall@10 was $r")
    // self-doc always found at distance 0
    assert(idx.search(queries, 1).filter($"qid" === $"id").count() === queries.size)
    // filter callback inside the walk (X2): results obey the allowed set
    // AND the beam still fills k — disallowed nodes are traversed through,
    // not allowed to starve the result heap
    val allowed = emb.filter($"label".isin(2, 4)).select($"vec_id")
    val okIds = allowed.as[Long].collect().toSet
    val filtered = idx.search(queries, 10, allowedIds = Some(allowed))
    assert(filtered.select("id").as[Long].collect().forall(okIds))
    assert(filtered.groupBy("qid").count().agg(min("count")).as[Long].head() === 10L)
    // deterministic across two searches (id-derived levels, fixed merge)
    val a = idx.search(queries, 10).select("qid", "id").collect().toSet
    val b = idx.search(queries, 10).select("qid", "id").collect().toSet
    assert(a === b)
    // save/load round trip
    val root = java.nio.file.Files.createTempDirectory("graft_hnsw").toString
    idx.asInstanceOf[graft.index.HnswIndex].save(root)
    val re = graft.index.HnswIndex.load(spark, root, "vec_id", "embedding", p)
    assert(re.search(queries, 10).select("qid", "id").collect().toSet === a)
  }

  test("IP IVFFLAT: one quantizer metric for assignment AND probes (partial nprobe)") {
    // assignment and probe ranking now share the quantizer metric (faiss
    // gives an IP IVF index an IP quantizer for both); partial probes must
    // therefore find the lists that hold the best-IP docs
    val ipTruth = {
      val q = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
      Knn.flatSearch(emb, "vec_id", "embedding", q, "qid", "qvec", 10, Metric.InnerProduct)
        .select($"qid", $"id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    }
    val idx = IndexRegistry.build("IVFFLAT", spark, emb, "vec_id", "embedding",
      IndexParams(metric = Metric.InnerProduct, ncentroids = 16))
    val r4 = recallAt(idx.search(queries, 10, Some(4)), ipTruth)
    val r8 = recallAt(idx.search(queries, 10, Some(8)), ipTruth)
    val r16 = recallAt(idx.search(queries, 10, Some(16)), ipTruth)
    assert(r16 === 1.0, s"full-probe IP recall was $r16")
    assert(r8 >= r4 - 1e-9)
    // near-uniform synthetic data spreads a query's top-IP (large-norm)
    // docs over many lists — the plateau SHAPE is the contract here, like
    // the L2 sweep above (measured r8=0.71 at these knobs)
    assert(r8 >= 0.6, s"IP recall@10 with nprobe=8 was $r8")
  }

  test("HNSW: score range admitted inside the graph walk (P8)") {
    // ef is large relative to the per-partition graph size here, so each
    // graph walk is effectively exhaustive and the index must EQUAL exact
    // search under the same range — out-of-range near hits must not have
    // consumed the per-graph k slots (the bug class fixed for IVF earlier)
    val p = IndexParams(nlinks = 16, efConstruction = 100, efSearch = 64)
    val idx = IndexRegistry.build("HNSW", spark, emb, "vec_id", "embedding", p)
    val res = idx.search(queries, 10, minScore = Some(2.0), maxScore = Some(8.0))
    val q = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
    val exact = Knn.flatSearch(emb, "vec_id", "embedding", q, "qid", "qvec", 10,
      Metric.L2, minScore = Some(2.0), maxScore = Some(8.0))
    assert(res.select("qid", "id").collect().toSet ===
      exact.select("qid", "id").collect().toSet)
    assert(res.select("score").as[Double].collect().forall(s => s >= 2.0 && s <= 8.0))
  }

  test("save/load round-trip preserves results (IVFFLAT)") {
    val root = java.nio.file.Files.createTempDirectory("graft_idx").toString
    val idx = IvfFlatIndex.build(spark, emb, "vec_id", "embedding", IndexParams(ncentroids = 8))
    idx.save(root)
    val re = IvfFlatIndex.load(spark, root, "vec_id", "embedding", IndexParams(ncentroids = 8))
    val a = idx.search(queries, 5, Some(4)).select("qid", "id").collect().toSet
    val b = re.search(queries, 5, Some(4)).select("qid", "id").collect().toSet
    assert(a === b)
  }

  test("AnnIndex.excluding: one delete-bitmap surface across every model") {
    // every registered float model + the binary one must honor the shared
    // exclusion view (the reference's IsValid bitmap inside each scan)
    for (m <- Seq("FLAT", "IVFFLAT", "IVFPQ", "HNSW")) {
      val idx = IndexRegistry.build(m, spark, emb, "vec_id", "embedding",
        IndexParams(ncentroids = 8, nsubvector = 8, recallNum = 100000))
      val full = idx.search(queries, 5, Some(8))
        .select($"id").as[Long].collect().toSet
      val banned = full.take(3).toSeq
      val got = idx.excluding(banned.toDF("vec_id")).search(queries, 5, Some(8))
        .select($"id").as[Long].collect().toSet
      assert(got.intersect(banned.toSet).isEmpty, s"$m returned excluded ids")
      assert(got.nonEmpty, s"$m returned nothing after exclusion")
    }
    val docs = spark.read.parquet(s"$sf0/documents.parquet")
      .select($"doc_id", unhex(md5($"text")).as("code"))
    val bidx = IndexRegistry.build("BINARYIVF", spark, docs, "doc_id", "code",
      IndexParams(ncentroids = 8))
    val bqs = docs.filter($"doc_id" < 3).select($"doc_id", $"code")
      .as[(Long, Array[Byte])].collect().toSeq
      .map { case (i, b) => (i, graft.index.BinaryIvfIndex.bytesToFloats(b)) }
    val bfull = bidx.search(bqs, 5, Some(8)).select($"id").as[Long].collect().toSet
    val bban = bfull.take(3).toSeq
    val bgot = bidx.excluding(bban.toDF("doc_id")).search(bqs, 5, Some(8))
      .select($"id").as[Long].collect().toSet
    assert(bgot.intersect(bban.toSet).isEmpty, "BINARYIVF returned excluded ids")
  }

  test("per-request recall_num/has_rank override (withParams) is real, not vacuous") {
    // starved build: recall_num=10 re-ranks only the top-10 ADC candidates,
    // so the k=10 result inherits ADC's approximation error
    val starved = IndexParams(ncentroids = 8, nsubvector = 8, recallNum = 10)
    val idx = IndexRegistry.build("IVFPQ", spark, emb, "vec_id", "embedding", starved)
    val truth = groundTruth(10)
    val rStarved = recallAt(idx.search(queries, 10, Some(8)), truth)
    // the override must restore exactness with no rebuild (shared quantizers)
    val exhaustive = idx.withParams(starved.copy(recallNum = 1000000))
    val rFull = recallAt(exhaustive.search(queries, 10, Some(8)), truth)
    assert(rFull === 1.0, s"exhaustive recall_num override gave recall $rFull")
    // non-vacuous: the starved default must actually be worse, or the
    // override test proves nothing
    assert(rStarved < 1.0,
      s"recall_num=10 build unexpectedly exact (recall $rStarved) — gate is vacuous")

    // has_rank=false override: scores become ADC values (no exact re-rank);
    // same ids as an index BUILT with hasRank=false
    val adcIdx = idx.withParams(starved.copy(hasRank = false))
    val builtAdc = IndexRegistry.build("IVFPQ", spark, emb, "vec_id", "embedding",
      starved.copy(hasRank = false))
    val a = adcIdx.search(queries, 10, Some(8))
      .select($"qid", $"id", $"score").as[(Long, Long, Double)].collect().sorted
    val b = builtAdc.search(queries, 10, Some(8))
      .select($"qid", $"id", $"score").as[(Long, Long, Double)].collect().sorted
    assert(a.sameElements(b), "has_rank override != hasRank-built index")
  }
}
