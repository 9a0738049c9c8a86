package graft

import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.index.{HnswIndex, IndexParams}
import graft.operators.Knn
import graft.table.GammaTable

/** HNSW exclusion compaction: per-segment graph rewrites fold the standing
  * excluded set into the graphs below the full-rebuild threshold.
  */
class HnswCompactionSpec extends GraftSuite {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0/embeddings.parquet")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-hnswc").toString

  private def queries: Seq[(Long, Array[Float])] =
    emb.filter($"vec_id" < 5).select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toSeq

  test("compacted() rewrites segments without the excluded nodes") {
    val docs = emb.filter($"vec_id" < 60).select($"vec_id", $"embedding")
    // tiny per-partition graphs + ef >= partition size -> effectively exact
    val idx = HnswIndex.build(spark, docs, "vec_id", "embedding",
      IndexParams(nlinks = 16, efConstruction = 100, efSearch = 64))
    val excl = (0L until 10L).toDF("vec_id")
    val compacted = idx.excluding(excl).asInstanceOf[HnswIndex].compacted()
    assert(compacted.excluded.isEmpty)

    val q = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
    val expect = Knn.flatSearch(docs.filter($"vec_id" >= 10), "vec_id", "embedding",
        q, "qid", "qvec", 5, Metric.L2)
      .select($"qid", $"id").as[(Long, Long)].collect().toSet
    val got = compacted.search(queries, 5)
      .select($"qid", $"id").as[(Long, Long)].collect().toSet
    assert(got === expect)
  }

  test("indexer folds exclusions into graph rewrites below the rebuild threshold") {
    val root = tmp()
    val docs = emb.filter($"vec_id" < 100)
      .select($"vec_id".cast("string").as("_id"), $"embedding".as("vec"))
    val t = GammaTable.create(spark, root, "hc", "_id", docs, nBuckets = 4)
    val ix = t.buildIndex("vec",
      IndexParams(nlinks = 16, efConstruction = 100, efSearch = 64),
      persist = true, retrievalType = "HNSW")

    // delete 8% of the table and purge the tombstones: the purged keys
    // become STANDING exclusions (their graph entries survive on disk)
    t.delete((0 until 8).map(_.toString).toDF("_id"))
    t.compact()
    val before = ix.currentIndex.get.asInstanceOf[HnswIndex]
    assert(before.excluded.map(_.count()).getOrElse(0L) === 8L)

    // 8% is under the 20% rebuild trigger but over the 5% compaction tier:
    // refresh rewrites the segments and clears the standing set
    ix.refresh()
    val after = ix.currentIndex.get.asInstanceOf[HnswIndex]
    assert(after.excluded.isEmpty)

    val q = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
    val expect = Knn.flatSearch(t.docs, "_id", "vec", q, "qid", "qvec", 5, Metric.L2)
      .select($"qid", $"id").as[(Long, String)].collect().toSet
    assert(ix.search(queries, 5).select($"qid", $"id")
      .as[(Long, String)].collect().toSet === expect)

    // the compaction persisted: a COLD reload keeps excluding the purged
    // keys (now physically absent from the rewritten graphs)
    val t2 = GammaTable.load(spark, root)
    val ix2 = t2.attachedIndex("vec").get
    val got2 = ix2.search(queries, 5).select($"id").as[String].collect().toSet
    assert(got2.intersect((0 until 8).map(_.toString).toSet).isEmpty)
  }

  test("absolute exclusion cap forces compaction below the ratio tiers") {
    val root = tmp()
    val docs = emb.filter($"vec_id" < 200)
      .select($"vec_id".cast("string").as("_id"), $"embedding".as("vec"))
    val t = GammaTable.create(spark, root, "hcap", "_id", docs, nBuckets = 4)
    val ix = t.buildIndex("vec",
      IndexParams(nlinks = 16, efConstruction = 100, efSearch = 128),
      persist = false, retrievalType = "HNSW")

    // 4 of 200 = 2%: BELOW the 5% ratio compaction tier and the 20%
    // rebuild tier — only the absolute broadcast cap can trigger here
    t.delete((0 until 4).map(_.toString).toDF("_id"))
    t.compact()
    assert(ix.currentIndex.get.asInstanceOf[HnswIndex]
      .excluded.map(_.count()).getOrElse(0L) === 4L)

    spark.conf.set("spark.graft.hnsw.maxExcludedRows", "3")
    try {
      ix.refresh()
      // cap exceeded (4 >= 3): the standing set was folded into the
      // graphs — the search-time broadcast is gone, not grown
      val after = ix.currentIndex.get.asInstanceOf[HnswIndex]
      assert(after.excluded.isEmpty)
      // and recall is unchanged: results equal brute force over survivors
      val q = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
      val expect = Knn.flatSearch(t.docs, "_id", "vec", q, "qid", "qvec",
          5, Metric.L2)
        .select($"qid", $"id").as[(Long, String)].collect().toSet
      assert(ix.search(queries, 5).select($"qid", $"id")
        .as[(Long, String)].collect().toSet === expect)
    } finally spark.conf.unset("spark.graft.hnsw.maxExcludedRows")
  }
}
