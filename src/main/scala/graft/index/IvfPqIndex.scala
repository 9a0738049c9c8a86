package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.operators.{Knn, TopK}

/** IVFPQ (reference V2, index/impl/gamma_index_ivfpq.cc): coarse quantize,
  * product-quantize the residuals, scan probed lists with the ADC LUT, then
  * exact re-rank of the top `recall_num` candidates from raw vectors
  * (reference two-stage rank, gamma_index_ivfpq.cc:642-697).
  *
  * Faithful to faiss conventions the reference relies on: residual encoding
  * (x - coarse_centroid), per-subspace k-means codebooks of 2^nbits entries,
  * asymmetric distance = Σ_j ||r_j - cb_j[code_j]||².
  *
  * Scale design: codes are ~dim·4/nsubvector× smaller than raw vectors, so
  * the probed-list scan reads a fraction of the raw data; the LUT
  * (nprobe x m x ksub doubles per query) is computed driver-side and
  * broadcast; re-rank joins only nq x recall_num rows back to raw vectors.
  */
class IvfPqIndex(
    val spark: SparkSession,
    val codes: DataFrame, // idCol, centroid_id, pq_codes array<int>
    val rawDocs: DataFrame, // idCol, vecCol — re-rank source (UNrotated)
    val idCol: String,
    val vecCol: String,
    val centers: Array[Array[Double]], // in rotated space when OPQ is on
    val codebooks: Array[Array[Array[Double]]], // [m][ksub][dsub]
    val params: IndexParams,
    val rotation: Option[Array[Array[Double]]] = None,
    // per-list code counts (index position = centroid_id), a build-time
    // upper bound feeding adaptive probe widening; None = fixed nprobe
    val listSizes: Option[Array[Long]] = None) extends AnnIndex {

  override def retrievalType: String = "IVFPQ"

  /** Rows actually read by the LAST search's ADC scan — filled by a
    * LongAccumulator once the caller runs an action on the returned frame
    * (-1 before any search). Feedback surface for the indexer's probe-cost
    * bound: the uniform-volume row prediction is calibrated against this
    * (IncrementalIndexer.rowCalibration).
    */
  @transient @volatile private[graft] var lastScanAcc
      : Option[org.apache.spark.util.LongAccumulator] = None
  def lastScannedRows: Long = lastScanAcc.map(_.value.longValue).getOrElse(-1L)

  /** Same index, fresher per-list stats. */
  def withListSizes(s: Option[Array[Long]]): IvfPqIndex =
    new IvfPqIndex(spark, codes, rawDocs, idCol, vecCol, centers, codebooks,
      params, rotation, s)

  // The ADC LUT is exact for L2 and InnerProduct; the reference's kernels
  // implement exactly those two (index/retrieval_model.h:20 declares Cosine
  // but e.g. gamma_index_ivfpq.cc:744-750 dispatches IP|L2 only). Cosine
  // callers normalize vectors upstream and use InnerProduct.
  require(params.metric == Metric.L2 || params.metric == Metric.InnerProduct,
    s"IVFPQ supports L2 and InnerProduct (got ${params.metric}); " +
      "normalize vectors and use InnerProduct for cosine")

  private val m = codebooks.length
  // k-means may return fewer than 2^nbits distinct centers per subspace;
  // the LUT layout pads every subspace to the max so the scan kernel's
  // uniform j*ksub stride (and the pq_adc SQL function's lut.length/m
  // stride) stays valid — padded slots are never referenced
  private val ksub = codebooks.map(_.length).max

  override def search(
      queries: Seq[(Long, Array[Float])],
      k: Int,
      nprobe: Option[Int],
      allowedIds: Option[DataFrame],
      minScore: Option[Double],
      maxScore: Option[Double]): DataFrame = {
    import spark.implicits._
    val asc = Metric.ascending(params.metric)
    val np = math.min(nprobe.getOrElse(params.nprobe), centers.length)
    val sizes = if (Ivf.adaptiveEnabled(spark)) listSizes else None
    val target = Ivf.probeTarget(k, params.recallNum, np, params.nprobe)
    // probes + ADC happen in the (possibly OPQ-rotated) code space; the
    // exact re-rank below stays in the original space, so rotation never
    // touches final scores
    val qProbes = queries.map { case (qid, qv0) =>
      val qv = rotation.map(Opq.rotate(_, qv0)).getOrElse(qv0)
      (qid, qv,
        Ivf.extendByTarget(
          Ivf.rankedCentroids(centers, qv, params.metric), sizes, np, target).toArray)
    }
    val probed = qProbes.flatMap(_._3).distinct.sorted

    val lists = codes.filter(col("centroid_id").isin(probed.toIndexedSeq: _*))
    // broadcast decision is the caller's (selectivity-aware) hint, not ours
    val filtered = allowedIds match {
      case Some(ids) => lists.join(ids.toDF(idCol), Seq(idCol), "left_semi")
      case None      => lists
    }
    // scan-side ADC: broadcast only (queries-by-centroid + quantizers) and
    // build each (query, centroid) LUT lazily WHERE THE CODES LIVE — the
    // reference's per-query sim_table precompute inside the scan
    // (gamma_index_ivfpq.h:561-601). Materializing LUT ROWS driver-side and
    // broadcasting them into a join (the previous shape) is ~m*ksub*8 B per
    // (query, probe) — ~180 MB for a 50-query batch at nprobe=56 — so the
    // DRIVER became the bottleneck as req_num grew. The within-partition
    // sort by centroid bounds the LUT cache to ONE centroid's queries
    // (persisted lists arrive centroid-partitioned already, so the sort is
    // ~free there).
    val byCentroid: Map[Int, Array[(Long, Array[Float])]] = qProbes
      .flatMap { case (qid, qv, ps) => ps.map(c => (c, (qid, qv))) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toArray }
    val bcQ = spark.sparkContext.broadcast(byCentroid)
    val bcQuant = spark.sparkContext.broadcast((centers, codebooks))
    val mL = m; val ksubL = ksub
    val ip = params.metric == Metric.InnerProduct
    val in = filtered.select(col("centroid_id"), col(idCol), col("pq_codes"))
      .sortWithinPartitions(col("centroid_id"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("qid",
        org.apache.spark.sql.types.LongType, nullable = false),
      in.schema(idCol).copy(name = "id"),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val scanAcc = spark.sparkContext.longAccumulator("graft.ivfpq.scannedRows")
    lastScanAcc = Some(scanAcc)
    val adc = in.mapPartitions { rows =>
      val (cs, cbs) = bcQuant.value
      var curCid = Integer.MIN_VALUE
      val luts = scala.collection.mutable.HashMap.empty[Long, Array[Double]]
      rows.flatMap { r =>
        scanAcc.add(1L) // code rows read (once per row, not per query)
        val cid = r.getInt(0)
        if (cid != curCid) { luts.clear(); curCid = cid }
        val qs = bcQ.value.getOrElse(cid, null)
        if (qs == null) Iterator.empty
        else {
          val codeArr = r.getSeq[Int](2)
          val id = r.get(1)
          qs.iterator.map { case (qid, qv) =>
            val lut = luts.getOrElseUpdate(qid,
              IvfPqIndex.lutFor(qv, cs(cid), cbs, ksubL, ip))
            var j = 0; var s = 0.0
            while (j < mL) { s += lut(j * ksubL + codeArr(j)); j += 1 }
            org.apache.spark.sql.Row(qid, id, s)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))

    if (!params.hasRank) {
      // the ADC value IS the returned score — the range predicate applies
      // to it directly, and the heap order follows the metric
      val ranged = AnnIndex.scoreRange(adc, "score", minScore, maxScore)
      return TopK.perGroup(ranged, "qid", "score", asc, k, Seq("id"))
    }
    // stage 1: recall_num candidates by ADC (metric order — ADC scores are
    // approximate, so the range predicate waits for the exact stage);
    // stage 2: exact re-rank with the range filter before the final heap
    val nCand = math.max(params.recallNum, k)
    val cands = TopK.perGroup(adc, "qid", "score", asc, nCand, Seq("id"))
      .select(col("qid"), col("id"))
    val qdf = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
    // stream the raw table, broadcast the candidate set when it is small
    // (nq x recall_num rows — the reference default is 100/query); an
    // exhaustive-recall caller falls back to a shuffle join
    val candsSide =
      if (queries.size.toLong * nCand <= 4000000L) broadcast(cands) else cands
    val exact = rawDocs.select(col(idCol).as("id"), col(vecCol))
      .join(candsSide, Seq("id"))
      .join(broadcast(qdf), Seq("qid"))
      .select(col("qid"), col("id"),
        Knn.score(params.metric, col(vecCol), col("qvec")).as("score"))
    val ranged = AnnIndex.scoreRange(exact, "score", minScore, maxScore)
    TopK.perGroup(ranged, "qid", "score", asc, k, Seq("id"))
  }

  /** Encode a delta batch with the ALREADY-TRAINED quantizers — the
    * reference's incremental re-encode of new/updated vectors through the
    * existing index (R5/R6, vector/vector_manager.cc:355-380): rotate (if
    * OPQ), assign to the nearest coarse centroid, PQ-encode the residual.
    * One kernel pass, no retraining. `keepCols` are carried through
    * (e.g. a version stamp).
    */
  def encodeDelta(delta: DataFrame, keepCols: Seq[String] = Nil): DataFrame =
    IvfPqIndex.encodeAll(delta, idCol, vecCol, centers, codebooks, rotation, keepCols,
      params.metric)

  override def excluding(ids: DataFrame): AnnIndex =
    new IvfPqIndex(spark,
      codes.join(ids.toDF(idCol), Seq(idCol), "left_anti"),
      rawDocs, idCol, vecCol, centers, codebooks, params, rotation, listSizes)

  override def withParams(p: IndexParams): AnnIndex =
    new IvfPqIndex(spark, codes, rawDocs, idCol, vecCol, centers, codebooks,
      p, rotation, listSizes)

  def save(path: String): Unit = {
    codes.write.mode("overwrite").partitionBy("centroid_id").parquet(s"$path/codes")
    saveQuantizers(path)
  }

  /** Persist the trained quantizers only (coarse centroids, PQ codebooks,
    * OPQ rotation) — for callers that manage the code lists themselves
    * (the persisted incremental indexer).
    */
  def saveQuantizers(path: String): Unit = {
    import spark.implicits._
    Ivf.saveCenters(spark, s"$path/centroids", centers)
    codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (v, c) => (j, c, v.toSeq) }
    }.toSeq.toDF("subspace", "code", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    rotation.foreach { r =>
      r.zipWithIndex.map { case (row, i) => (i, row.toSeq) }.toSeq.toDF("i", "r")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/rotation")
    }
  }
}

object IvfPqIndex {

  /** Restore a saved index. `rawDocs` re-supplies the exact re-rank source
    * (the reference reloads raw vectors alongside dumped codes,
    * gamma_engine.cc:1175-1262); the codes read stays lazy, so probe
    * filters prune the partitioned parquet at rest (T4).
    */
  def load(
      spark: SparkSession,
      path: String,
      rawDocs: DataFrame,
      idCol: String,
      vecCol: String,
      params: IndexParams): IvfPqIndex = {
    val codes = spark.read.parquet(s"$path/codes")
    val (centers, codebooks, rotation) = loadQuantizers(spark, path)
    new IvfPqIndex(spark, codes, rawDocs, idCol, vecCol, centers, codebooks, params, rotation)
  }

  /** Counterpart of [[IvfPqIndex.saveQuantizers]]. */
  def loadQuantizers(spark: SparkSession, path: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]], Option[Array[Array[Double]]]) = {
    import org.apache.spark.sql.types._
    val centers = Ivf.loadCenters(spark, s"$path/centroids")
    // explicit schemas: footer inference costs a Spark job per load
    val cbSchema = StructType(Seq(StructField("subspace", IntegerType),
      StructField("code", IntegerType), StructField("center", ArrayType(DoubleType))))
    // driver-side sorts below: orderBy on these tiny frames costs an AQE
    // shuffle job each
    val cbRows = spark.read.schema(cbSchema).parquet(s"$path/codebooks")
      .collect().sortBy(r => (r.getInt(0), r.getInt(1)))
    val codebooks = cbRows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (_, rows) =>
      rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
    }.toArray
    val rotPath = new org.apache.hadoop.fs.Path(s"$path/rotation")
    val fs = rotPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rotation =
      if (fs.exists(rotPath)) {
        val rotSchema = StructType(Seq(StructField("i", IntegerType),
          StructField("r", ArrayType(DoubleType))))
        Some(spark.read.schema(rotSchema).parquet(rotPath.toString).collect()
          .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray))
      } else None
    (centers, codebooks, rotation)
  }

  def build(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      params: IndexParams): IvfPqIndex = {
    // auto centroid sizing needs the FULL count; with explicit ncentroids
    // a BOUNDED count (first 2^nbits+1 rows) answers the remaining use —
    // the tiny-table ksub guard — without scanning the table. ONE count
    // job either way. (Long math: a plain n.toInt would overflow past
    // 2^31 rows and silently collapse every codebook.)
    val ksubCap = 1L << params.nbits
    val counted =
      if (params.ncentroids > 0)
        docs.limit(math.min(ksubCap + 1, Int.MaxValue.toLong).toInt).count()
      else docs.count()
    val ncent =
      if (params.ncentroids > 0) params.ncentroids
      else Ivf.autoNcentroids(counted, -1)
    val m = params.nsubvector
    val ksub = math.min(ksubCap, math.max(2L, counted)).toInt

    // ONE bounded driver-side sample feeds OPQ, coarse, and PQ training —
    // the reference's faiss train() likewise sees a single sampled x and
    // trains every quantizer in memory (gamma_index_ivfpq.cc:272-330);
    // the cluster only runs the encode pass below. Clamps: 256 points per
    // coarse centroid / per PQ codebook entry (retrieval_model.h:303).
    val coarseCap = math.max(39 * ncent, math.min(params.trainSampleRows, 256 * ncent))
    val pqCap = math.min(params.trainSampleRows, 256 * ksub)
    val sampleRaw = LocalKMeans.sampleVecs(docs, vecCol, math.max(coarseCap, pqCap))
    require(sampleRaw.nonEmpty, "cannot build IVFPQ on an empty table")
    val dim = sampleRaw(0).length
    require(dim % m == 0, s"dim $dim not divisible by nsubvector $m")
    val dsub = dim / m

    // OPQ: learn an orthonormal rotation and build the whole code space
    // (coarse + PQ) in rotated coordinates; L2 is rotation-invariant so
    // probes stay geometrically correct and the exact re-rank uses the
    // untouched originals
    // rotation training is driver-side (per-subspace k-means + dim x dim
    // SVD per iteration), so cap the sample — but scale it with
    // trainSampleRows instead of a hardcoded 1024, which for large
    // dim/ksub under-determined the fit badly enough to make OPQ-on
    // worse than OPQ-off (e.g. 4 samples per codebook entry at ksub=256)
    val opqCap = math.min(params.trainSampleRows, 16384)
    val rotation =
      if (!params.opq) None
      else Some(Opq.trainRotation(
        sampleRaw.take(opqCap).map(_.map(_.toDouble)), m, ksub,
        params.opqIters, params.seed))
    val sample = rotation.map(r => sampleRaw.map(Opq.rotate(r, _))).getOrElse(sampleRaw)

    val centers = LocalKMeans.fit(
      sample.take(coarseCap), ncent, maxIter = 12, seed = params.seed, tol = 1e-3)

    // PQ trains on residual = vec - coarse_centroid (faiss by_residual
    // convention), assigned under the quantizer metric — the SAME kernel
    // the encode pass uses, so codes and codebooks agree
    val residuals = sample.take(pqCap).map { v =>
      val c = centers(Ivf.bestCenter(params.metric, centers, v))
      Array.tabulate(dim)(i => (v(i) - c(i)).toFloat)
    }
    // m independent sub-trainings, concurrent on driver cores (reference
    // PQ training via faiss ProductQuantizer, gamma_index_ivfpq.cc:272-330)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val codebooks = (0 until m).map { j =>
      Future {
        val sub = residuals.map(r => java.util.Arrays.copyOfRange(r, j * dsub, (j + 1) * dsub))
        LocalKMeans.fit(sub, ksub, maxIter = 10, seed = params.seed + j, tol = 1e-4)
      }
    }.map(Await.result(_, Duration.Inf)).toArray

    // single distributed pass: rotate + assign + residual-encode per row
    val codesDf = encodeAll(docs, idCol, vecCol, centers, codebooks, rotation,
      Nil, params.metric).localCheckpoint(true)
    new IvfPqIndex(spark, codesDf, docs.select(col(idCol), col(vecCol)),
      idCol, vecCol, centers, codebooks, params, rotation)
  }

  /** Query LUT for one probed centroid, flattened m x ksub
    * (reference sim_table precompute, gamma_index_ivfpq.h:561-601):
    *  - L2: squared sub-distance of the query residual to each codebook
    *    entry, so Σ_j lut[code_j] = ||q - (centroid + code)||² (ascending);
    *  - InnerProduct: dot(q_j, cb_j[c]) + dot(q, centroid)/m, so the sum
    *    telescopes to dot(q, centroid + code) ≈ IP(q, x) (descending).
    * Static (executor-callable): the search kernel builds these scan-side.
    */
  private[index] def lutFor(
      q: Array[Float], centroid: Array[Double],
      codebooks: Array[Array[Array[Double]]], ksub: Int, ip: Boolean): Array[Double] = {
    val m = codebooks.length
    val dsub = centroid.length / m
    val qDotCentroidShare = if (ip) {
      var s = 0.0; var i = 0
      val n = math.min(q.length, centroid.length)
      while (i < n) { s += q(i) * centroid(i); i += 1 }
      s / m
    } else 0.0
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var c = 0
      val kj = codebooks(j).length
      while (c < kj) {
        val cb = codebooks(j)(c)
        var s = 0.0; var i = 0
        if (ip) {
          while (i < dsub) { s += q(base + i) * cb(i); i += 1 }
          s += qDotCentroidShare
        } else {
          while (i < dsub) {
            val r = q(base + i) - centroid(base + i) // query residual component
            val t = r - cb(i)
            s += t * t; i += 1
          }
        }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    out
  }

  /** Single-pass encode of (id, vec, keep...) rows into
    * (id, centroid_id, pq_codes, keep...) with broadcast quantizers:
    * optional OPQ rotation, best-centroid assignment under the index's
    * quantizer metric (strict-< tie break, same as MLlib predict),
    * residual PQ codes.
    */
  private[index] def encodeAll(
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      rotation: Option[Array[Array[Double]]],
      keepCols: Seq[String],
      metric: Metric.Value = Metric.L2): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val in = docs.select((col(idCol) +: col(vecCol) +: keepCols.map(col)): _*)
    val schema = StructType(
      in.schema(idCol) +:
        StructField("centroid_id", IntegerType, nullable = false) +:
        StructField("pq_codes", ArrayType(IntegerType, containsNull = false)) +:
        keepCols.map(in.schema(_)))
    val bc = in.sparkSession.sparkContext.broadcast((centers, codebooks, rotation))
    val m = codebooks.length
    in.mapPartitions { rows =>
      val (cs, cbs, rot) = bc.value
      val dsub = cs.head.length / m
      rows.map { r =>
        val raw = r.getSeq[Float](1).toArray
        val v = rot.map(Opq.rotate(_, raw)).getOrElse(raw)
        val best = Ivf.bestCenter(metric, cs, v)
        val cen = cs(best)
        val codes = Array.tabulate(m) { j =>
          val cb = cbs(j); val base = j * dsub
          var bc2 = 0; var bd = Double.MaxValue; var cc = 0
          while (cc < cb.length) {
            var s = 0.0; var i = 0
            while (i < dsub) {
              val t = (v(base + i) - cen(base + i)) - cb(cc)(i)
              s += t * t; i += 1
            }
            if (s < bd) { bd = s; bc2 = cc }
            cc += 1
          }
          bc2
        }
        Row.fromSeq(r.get(0) +: best +: codes.toSeq +: (2 until r.length).map(r.get))
      }
    }(Encoders.row(schema))
  }

}
