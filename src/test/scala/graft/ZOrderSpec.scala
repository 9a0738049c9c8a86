package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Morton keys: bijective interleave, exact inverse, and the property
  * that pays at scale — a 2-D box query touches FEW z-ordered range
  * partitions, where a 1-D layout would touch them all.
  */
class ZOrderSpec extends GraftSuite {
  import spark.implicits._

  test("key2 is the exact bit interleave (bijective on a 64x64 grid)") {
    val grid = spark.range(0, 64).select(col("id").as("x"))
      .crossJoin(spark.range(0, 64).select(col("id").as("y")))
    val keys = grid.select(col("x"), col("y"),
      ZOrder.key2(col("x"), col("y"), bits = 6).as("z"))
      .as[(Long, Long, Long)].collect()
    assert(keys.length === 4096)
    assert(keys.map(_._3).distinct.length === 4096)
    assert(keys.map(_._3).min === 0L && keys.map(_._3).max === 4095L)
    // exact inverse: de-interleaving every key recovers (x, y)
    keys.foreach { case (x, y, z) =>
      var dx = 0L; var dy = 0L
      (0 until 6).foreach { i =>
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(dx === x && dy === y, s"z=$z")
    }
  }

  test("box queries touch few z-ordered partitions (the pruning payoff)") {
    val n = 1 << 16 // 256x256 grid, one row per cell
    val grid = spark.range(0, n).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val parts = 32
    // localCheckpoint pins the layout the way a parquet write would:
    // otherwise Catalyst pushes the test filters BELOW the range
    // repartition and the boundaries get re-sampled over filtered data
    val clustered = ZOrder.clusterBy(grid, "x", "y", bits = 8, parts)
      .withColumn("p", spark_partition_id())
      .localCheckpoint()
    // range partitioning on the z-key: partitions hold disjoint key ranges
    val ranges = clustered.select(col("_zkey"), col("p"))
      .groupBy("p").agg(min("_zkey").as("lo"), max("_zkey").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._3 < b._2, s"overlap: $a vs $b")
      case _ =>
    }
    // a 32x32 box (1/64 of the area): count partitions whose rows match
    // bounds carry slack beyond the ideal because repartitionByRange
    // SAMPLES its boundaries with an rdd.id-dependent seed — under a
    // shared test session the boundaries jitter by a partition or two
    // with suite order (a 296-green run flaked on 9 > 8 here); the claim
    // under test is the CONTRAST vs the 1-D layout touching all 32
    val touched = clustered
      .filter(col("x") >= 64 && col("x") < 96 && col("y") >= 128 && col("y") < 160)
      .select(col("p")).distinct().count()
    assert(touched <= 5, s"box touched $touched of $parts partitions")
    // the case 1-D layouts lose: a y-only strip. Under x-range
    // partitioning it matches rows in EVERY partition; under z-order the
    // strip's fixed top y-bits confine it to ~1/8 of the key space.
    val zStrip = clustered.filter(col("y") >= 128 && col("y") < 160)
      .select(col("p")).distinct().count()
    val xMajorStrip = grid.repartitionByRange(parts, col("x"))
      .withColumn("p", spark_partition_id()).localCheckpoint()
      .filter(col("y") >= 128 && col("y") < 160)
      .select(col("p")).distinct().count()
    assert(zStrip <= 10, s"y-strip touched $zStrip of $parts z partitions")
    assert(xMajorStrip === parts.toLong, s"x-major should touch all: $xMajorStrip")
  }
}
