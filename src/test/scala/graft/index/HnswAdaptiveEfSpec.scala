package graft.index

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** Skewed-segment recall validation for adaptive per-segment ef — the
  * scenario where a naive proportional beam cut loses recall: ALL true
  * neighbors live in a tiny (fresh-incremental-style) segment while the
  * bulk sits elsewhere. The small-segment floor (beam >= nodes when
  * nodes <= ef) must keep the walk near-exhaustive there.
  */
class HnswAdaptiveEfSpec extends graft.GraftSuite {
  import spark.implicits._

  test("adaptive ef small-segment floor preserves recall under skew") {
    val rng = new java.util.Random(11)
    val dim = 16
    def vec(center: Float, spread: Float) =
      Array.tabulate(dim)(_ => center + spread * rng.nextFloat())
    // 4000 far vectors in one big segment; 60 tightly clustered around the
    // query in a tiny segment — the true top-10 are all in the tiny one
    val big = (1000L until 5000L).map(i => (i, vec(10f, 10f)))
    val small = (0L until 60L).map(i => (i, vec(0f, 0.1f)))
    val q = Array.fill(dim)(0.05f)

    def graphOf(rows: Seq[(Long, Array[Float])]): Array[Byte] = {
      val g = new HnswGraph(16, 100, "L2")
      rows.foreach { case (i, v) => g.add(i, v) }
      HnswIndex.serialize(g)
    }
    val schema = StructType(Seq(StructField("graph", BinaryType, nullable = false)))
    val graphs = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(graphOf(big)), Row(graphOf(small))), 2), schema)
    val params = IndexParams(metric = graft.core.Metric.L2, efSearch = 64)
    val avg = (big.size + small.size) / 2.0 // 2030: small segment is ~3% of avg
    val idx = new HnswIndex(spark, graphs, "id", "v", params)
      .withSegmentAvg(Some(avg))
    val got = idx.search(Seq((0L, q)), 10, None)
      .select($"id").as[Long].collect().toSet
    assert(got.size === 10)
    assert(got.forall(_ < 60), s"adaptive ef missed small-segment neighbors: $got")

    // the floor function itself: small segment -> near-exhaustive beam;
    // mid segment -> proportional; at/above average -> full ef
    assert(HnswIndex.segmentEf(64, 10, 60, avg) === 60)
    assert(HnswIndex.segmentEf(64, 10, 1000, avg) ===
      math.ceil(64.0 * 1000 / avg).toInt)
    assert(HnswIndex.segmentEf(64, 10, 4000, avg) === 64)
  }
}
