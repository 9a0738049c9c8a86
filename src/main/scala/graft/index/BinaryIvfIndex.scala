package graft.index

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.functions.hamming
import graft.operators.TopK

/** BINARYIVF (reference V6, index/impl/gamma_index_binary_ivf.cc): inverted
  * lists over packed binary codes with Hamming distance.
  *
  * The coarse "quantizer" is k deterministic medoid codes (sampled from the
  * data — the reference trains a binary IVF the same spirit via faiss);
  * docs go to their nearest-medoid list by Hamming, queries probe the
  * `nprobe` nearest lists and scan them with the codegen'd
  * [[graft.functions.HammingDistance]] kernel. Same partition-pruning
  * scale shape as the float IVF family.
  */
class BinaryIvfIndex(
    val spark: SparkSession,
    val data: DataFrame, // idCol, codeCol, centroid_id
    val idCol: String,
    val codeCol: String,
    val centroids: Array[Array[Byte]],
    val params: IndexParams) {

  def retrievalType: String = "BINARYIVF"

  private def hammingOf(a: Array[Byte], b: Array[Byte]): Int = {
    var s = 0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += Integer.bitCount((a(i) ^ b(i)) & 0xff); i += 1 }
    s
  }

  private def probes(q: Array[Byte], nprobe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => (hammingOf(c, q), i) }
      .sorted.take(nprobe).map(_._2).toSeq

  def search(
      queries: Seq[(Long, Array[Byte])],
      k: Int,
      nprobe: Option[Int] = None,
      allowedIds: Option[DataFrame] = None,
      minScore: Option[Double] = None,
      maxScore: Option[Double] = None): DataFrame = {
    import spark.implicits._
    val np = math.min(nprobe.getOrElse(params.nprobe), centroids.length)
    val probeDf = queries.flatMap { case (qid, q) =>
      probes(q, np).map(c => (qid, q, c))
    }.toDF("qid", "qcode", "centroid_id")
    val probed = probeDf.select("centroid_id").distinct().as[Int].collect()
    val lists = data.filter(col("centroid_id").isin(probed.toIndexedSeq: _*))
    // broadcast decision is the caller's (selectivity-aware) hint, not ours
    val filtered = allowedIds match {
      case Some(ids) => lists.join(ids.toDF(idCol), Seq(idCol), "left_semi")
      case None      => lists
    }
    val scored = filtered
      .join(broadcast(probeDf), Seq("centroid_id"))
      .select(col("qid"), col(idCol).as("id"),
        hamming(col(codeCol), col("qcode")).as("hdist"))
    val ranged = AnnIndex.scoreRange(scored, "hdist", minScore, maxScore)
    TopK.perGroup(ranged, "qid", "hdist", ascending = true, k, Seq("id"))
  }
}

object BinaryIvfIndex {

  /** Build: medoids = codes of the k smallest ids (deterministic), then a
    * Hamming nearest-medoid assignment kernel pass.
    */
  def build(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      codeCol: String,
      params: IndexParams): BinaryIvfIndex = {
    // explicit ncentroids skips the full-table count (auto sizing only)
    val k =
      if (params.ncentroids > 0) params.ncentroids
      else Ivf.autoNcentroids(docs.count(), -1)
    val centroids = docs
      .select(col(idCol), col(codeCol)).orderBy(col(idCol)).limit(k)
      .collect().map(_.getAs[Array[Byte]](1))

    val in = docs.select(col(idCol), col(codeCol))
    val schema = StructType(in.schema.fields :+
      StructField("centroid_id", IntegerType, nullable = false))
    val bc = spark.sparkContext.broadcast(centroids)
    val assigned = in.mapPartitions { rows =>
      val cs = bc.value
      rows.map { r =>
        val code = r.getAs[Array[Byte]](1)
        var best = 0; var bestD = Int.MaxValue; var c = 0
        while (c < cs.length) {
          val cc = cs(c)
          var s = 0; var i = 0
          val m = math.min(cc.length, code.length)
          while (i < m) { s += Integer.bitCount((cc(i) ^ code(i)) & 0xff); i += 1 }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        Row.fromSeq(r.toSeq :+ best)
      }
    }(Encoders.row(schema))

    new BinaryIvfIndex(spark, assigned.localCheckpoint(true), idCol, codeCol, centroids, params)
  }
}
