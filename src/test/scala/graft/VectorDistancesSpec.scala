package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions._

class VectorDistancesSpec extends GraftSuite {
  import spark.implicits._

  private val a = Array(1.0f, 2.0f, 3.0f)
  private val b = Array(4.0f, 6.0f, 8.0f)

  private def one(colExpr: org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(colExpr.as("v")).head().getDouble(0)

  test("l2_sq matches scalar math") {
    assert(one(l2_sq(col("a"), col("b"))) === (9.0 + 16.0 + 25.0))
  }

  test("inner_product matches scalar math") {
    assert(one(inner_product(col("a"), col("b"))) === (4.0 + 12.0 + 24.0))
  }

  test("cosine_sim matches scalar math") {
    val dot = 40.0
    val na = math.sqrt(1 + 4 + 9); val nb = math.sqrt(16 + 36 + 64)
    assert(math.abs(one(cosine_sim(col("a"), col("b"))) - dot / (na * nb)) < 1e-12)
  }

  test("cosine_sim zero-norm guard") {
    val z = Array(0.0f, 0.0f, 0.0f)
    assert(Seq((z, b)).toDF("a", "b")
      .select(cosine_sim(col("a"), col("b")).as("v")).head().getDouble(0) === 0.0)
  }

  test("hamming over packed binary codes") {
    val x = Array[Byte](0x0f, 0x00)
    val y = Array[Byte](0x00, 0x01)
    val v = Seq((x, y)).toDF("a", "b")
      .select(hamming(col("a"), col("b")).as("v")).head().getInt(0)
    assert(v === 5)
  }

  test("SQL registration works") {
    graft.functions.registerAll(spark)
    Seq((a, b)).toDF("a", "b").createOrReplaceTempView("vd_tmp")
    val r = spark.sql("SELECT l2_sq(a, b) AS v FROM vd_tmp").head().getDouble(0)
    assert(r === 50.0)
  }

  test("pq_adc sums per-subspace LUT lookups and agrees with the scan kernel's stride") {
    // m=2 subspaces, ksub=4: distance = lut[0*4+c0] + lut[1*4+c1]
    val lut = Array(0.0, 1.0, 2.0, 3.0, 10.0, 20.0, 30.0, 40.0)
    val v = Seq((Array(2, 1), lut)).toDF("codes", "lut")
      .select(graft.functions.pq_adc(col("codes"), col("lut")).as("v"))
      .head().getDouble(0)
    assert(v === 2.0 + 20.0)
    // the registered SQL surface computes the same
    graft.functions.registerAll(spark)
    Seq((Array(3, 0), lut)).toDF("codes", "lut").createOrReplaceTempView("adc_tmp")
    val r = spark.sql("SELECT pq_adc(codes, lut) AS v FROM adc_tmp").head().getDouble(0)
    assert(r === 3.0 + 10.0)
  }

  test("null input yields null") {
    val df = Seq((Option(a), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(l2_sq(col("a"), col("b"))).head().isNullAt(0))
  }

  test("interpreted eval agrees with codegen") {
    // force interpreted path by evaluating via expression eval on a row-less context
    val e = graft.functions.L2SqDistance(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a.toSeq,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b.toSeq,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null).asInstanceOf[Double] === 50.0)
  }
}
