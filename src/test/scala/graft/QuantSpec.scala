package graft

import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.Quant
import graft.operators.Knn

/** INT8 scalar quantization (the reference's third vector value type):
  * error bound, degenerate inputs, and search-quality preservation.
  */
class QuantSpec extends GraftSuite {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0/embeddings.parquet")

  test("int8 roundtrip error is bounded by scale/2 per component") {
    val rows = emb
      .withColumn("q8", Quant.int8Encode($"embedding"))
      .withColumn("dec", Quant.int8Decode($"q8"))
      .select(
        $"q8.scale".as("scale"),
        aggregate(
          zip_with($"dec", $"embedding",
            (a, b) => abs(a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, x) => greatest(acc, x)).as("max_err"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (scale, err) =>
      // round-to-nearest: at most half a quantization step (+ float decode noise)
      assert(err <= scale / 2 + 1e-6, s"err $err exceeds scale/2 ($scale)")
    }
  }

  test("all-zero and single-value vectors quantize without NaN") {
    val df = Seq(
      (1L, Array(0f, 0f, 0f)),
      (2L, Array(5f, 5f, 5f)),
      (3L, Array(-3f, 0f, 3f))).toDF("id", "v")
    val out = df.select($"id",
        Quant.int8Decode(Quant.int8Encode($"v")).as("dec"))
      .as[(Long, Array[Float])].collect().toMap
    assert(out(1L).toSeq === Seq(0f, 0f, 0f))
    assert(out(2L).forall(x => math.abs(x - 5f) < 0.05f))
    assert(out(3L)(0) < -2.9f && out(3L)(2) > 2.9f && out(3L)(1) === 0f)
  }

  test("KNN over int8-decoded vectors preserves float-KNN recall") {
    val dec = emb.select($"vec_id",
      Quant.int8Decode(Quant.int8Encode($"embedding")).as("embedding"))
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq
    val q = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
    def top(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      Knn.flatSearch(df, "vec_id", "embedding", q, "qid", "qvec", 10, Metric.L2)
        .select($"qid", $"id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = top(emb)
    val viaInt8 = top(dec)
    val recall = exact.map { case (qi, t) =>
      viaInt8.getOrElse(qi, Set.empty).count(t).toDouble / t.size
    }.sum / exact.size
    // SQ8 at 64 dims: near-lossless ranking
    assert(recall >= 0.9, s"int8 KNN recall@10 $recall")
  }
}
