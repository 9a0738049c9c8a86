package graft

import org.apache.spark.sql.functions._

import graft.operators.ProtoPrune

/** Prototypicality pruning: the integer surrogate must rank exactly like
  * the true mean-centroid distance, keep counts must be per-label ceils,
  * and no vector may cross an Exchange.
  */
class ProtoPruneSpec extends GraftSuite {
  import spark.implicits._

  // two labels with hand-placed points: label 0 clustered at ~(1,0,...),
  // one far outlier; label 1 spread on an axis
  private def fixture = Seq(
    (1L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, 0, Array(1.1f, 0.0f, 0.0f, 0.0f)),
    (3L, 0, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (4L, 0, Array(9.0f, 9.0f, 0.0f, 0.0f)), // outlier → hardest
    (5L, 1, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (6L, 1, Array(0.0f, 2.0f, 0.0f, 0.0f)),
    (7L, 1, Array(0.0f, 3.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "label", "embedding")

  test("surrogate ranking equals true distance-to-mean ranking; ceil keep counts") {
    val kept = ProtoPrune.pruneHardest(fixture, "vec_id", "label", "embedding",
      dims = 4, keepNum = 1, keepDen = 2)
      .select("vec_id", "label", "proto_rank").as[(Long, Int, Long)].collect()
    // label 0: n=4 → keep ceil(2)=2; label 1: n=3 → keep ceil(1.5)=2
    assert(kept.count(_._2 == 0) === 2)
    assert(kept.count(_._2 == 1) === 2)
    // brute-force on the driver: rank by distance to the float mean
    val rows = fixture.as[(Long, Int, Array[Float])].collect()
    val byLabel = rows.groupBy(_._2)
    val expect = byLabel.toSeq.flatMap { case (lab, rs) =>
      val n = rs.length
      val mean = (0 until 4).map(i => rs.map(_._3(i).toDouble).sum / n)
      rs.map { case (id, _, v) =>
        (lab, id, (0 until 4).map(i => math.pow(v(i) - mean(i), 2)).sum)
      }.sortBy { case (_, id, d) => (-d, id) }
        .take((n + 1) / 2).map { case (_, id, _) => (lab, id) }
    }.toSet
    assert(kept.map(k => (k._2, k._1)).toSet === expect)
    // rank 1 per label: label 0's outlier; label 1 ties at distance 1
    // between ids 5 and 7 → the id tie-break picks 5
    assert(kept.filter(_._3 == 1L).map(_._1).toSet === Set(4L, 5L))
  }

  test("keepNum/keepDen generalizes: keep top third") {
    val kept = ProtoPrune.pruneHardest(fixture, "vec_id", "label", "embedding",
      dims = 4, keepNum = 1, keepDen = 3)
      .select("label").as[Int].collect()
    // label 0: ceil(4/3)=2; label 1: ceil(3/3)=1
    assert(kept.count(_ == 0) === 2 && kept.count(_ == 1) === 1)
  }

  test("no Exchange carries a vector column (ids + ints + doubles only)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec        => nodes(q.plan)
      case r: ReusedExchangeExec    => nodes(r.child)
      case _                        => p.children.flatMap(nodes)
    })
    val df = SparkEntry.queries("q_proto_prune")(spark, sf0)
    df.count()
    val shuffles = nodes(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.nonEmpty)
    val banned = Set("embedding", "__m", "__dev", "__sums")
    shuffles.foreach { s =>
      val bad = s.output.map(_.name).filter(banned)
      assert(bad.isEmpty, s"vector column crosses an Exchange: $bad")
    }
  }
}
