package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.index.{IndexParams, Ivf, IvfFlatIndex}
import graft.operators.{Knn, TopK}
import graft.table.GammaTable

/** Incremental ANN-index maintenance over a [[GammaTable]] — the Spark
  * re-expression of the reference's realtime indexing subsystem:
  *
  *  - build once when the table crosses `indexingSize` docs
  *    (reference `indexing_size` gate, search/gamma_engine.cc:744-749),
  *    driving the UNINDEXED -> INDEXING -> INDEXED FSM (R9,
  *    gamma_engine.h:28);
  *  - per refresh, APPEND new vectors to the existing centroids without
  *    retraining (R5 — the reference feeds raw vectors into the trained
  *    index in chunks, gamma_engine.cc:996-1043) and REPLACE re-written
  *    vectors (R6 — the updated-vid queue, vector_manager.cc:355-380);
  *  - at query time, stale/deleted entries are anti-joined out of the
  *    index scan (the reference's bitmap `IsValid` check inside the scan,
  *    T11/X2) and the not-yet-indexed tail is searched exactly and
  *    union-merged (the reference searches index + raw memory tail; V9
  *    brute-force fallback when no index exists).
  *
  * Scale design: each refresh touches only rows with `_version >` the
  * index's build version (an O(delta) filter thanks to version stamping),
  * and the tail stays small as long as refreshes keep pace with ingest —
  * exactly the reference's 1 s indexing cadence contract.
  */
class IncrementalIndexer(
    val table: GammaTable,
    val vecCol: String,
    val params: IndexParams = IndexParams(),
    val indexingSize: Long = 0L) {

  import GammaTable.{DeletedCol, VersionCol}

  private val spark = table.spark
  private val key = table.meta.keyField

  @volatile private var index: Option[IvfFlatIndex] = None
  @volatile private var builtVersion: Long = -1L

  def status: String = table.meta.indexStatus
  def currentIndex: Option[IvfFlatIndex] = index

  /** Build or incrementally extend the index (R5/R6). Call after each
    * ingest microbatch (the streaming wrapper does).
    */
  def refresh(): Unit = synchronized {
    index match {
      case None =>
        if (table.meta.maxDocid >= indexingSize) {
          table.setIndexStatus("INDEXING")
          val built = IvfFlatIndex.build(spark, table.docs, key, vecCol, params)
          index = Some(new IvfFlatIndex(spark, built.data.localCheckpoint(true),
            key, vecCol, built.centers, params))
          builtVersion = table.meta.version
          table.setIndexStatus("INDEXED")
        }
      case Some(idx) =>
        val delta = table.docs.filter(col(VersionCol) > builtVersion)
          .select(col(key), col(vecCol))
        if (!delta.isEmpty) {
          // assign with the EXISTING centroids — no retrain (R5)
          val assigned = Ivf.assignWithCenters(delta, vecCol, idx.centers)
          val newData = idx.data
            .join(delta.select(key), Seq(key), "left_anti") // R6: replace updated
            .unionByName(assigned)
            .localCheckpoint(true)
          index = Some(new IvfFlatIndex(spark, newData, key, vecCol, idx.centers, params))
        }
        builtVersion = table.meta.version
    }
  }

  /** Search merging indexed data + exact scan of the unindexed tail.
    * `allowedIds` pushes a scalar-filter key set into BOTH scans (X2);
    * `minScore`/`maxScore` is the score-range predicate (P8), filtered
    * inside every scan BEFORE its top-k heap (the reference's
    * `IsSimilarScoreValid` callback) so out-of-range hits never consume
    * the candidate budget.
    */
  def search(
      queries: Seq[(Long, Array[Float])],
      k: Int,
      nprobe: Option[Int] = None,
      allowedIds: Option[DataFrame] = None,
      minScore: Option[Double] = None,
      maxScore: Option[Double] = None): DataFrame = {
    import spark.implicits._
    graft.functions.registerAll(spark)
    val qDf = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
    def restrict(df: DataFrame): DataFrame = allowedIds match {
      case Some(ids) =>
        df.join(org.apache.spark.sql.functions.broadcast(ids.toDF(key)), Seq(key), "left_semi")
      case None => df
    }
    index match {
      case None =>
        // V9: brute force while UNINDEXED
        Knn.flatSearch(restrict(table.docs), key, vecCol, qDf, "qid", "qvec", k, params.metric,
          minScore = minScore, maxScore = maxScore)
      case Some(idx) =>
        // ids whose index entry is stale (updated after build) or dead
        val invalid = table.allDocs
          .filter(col(VersionCol) > builtVersion || col(DeletedCol))
          .select(col(key))
        val cleanIdx = new IvfFlatIndex(spark,
          idx.data.join(invalid, Seq(key), "left_anti"), key, vecCol, idx.centers, params)
        val fromIndex = cleanIdx.search(queries, k, nprobe, allowedIds, minScore, maxScore)
        val tail = restrict(table.docs.filter(col(VersionCol) > builtVersion))
        val fromTail = Knn.flatSearch(tail, key, vecCol, qDf, "qid", "qvec", k, params.metric,
          minScore = minScore, maxScore = maxScore)
        TopK.perGroup(fromIndex.unionByName(fromTail), "qid", "score",
          Metric.ascending(params.metric), k, Seq("id"))
    }
  }

}
