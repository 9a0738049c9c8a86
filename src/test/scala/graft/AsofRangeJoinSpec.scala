package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, RangeJoin}

class AsofRangeJoinSpec extends GraftSuite {
  import spark.implicits._

  // deterministic pseudo-random keyed event sets with plenty of ts ties
  private def mkLeft = spark.range(0, 400).select(
    (col("id") % 7).as("k"),
    (col("id") * 131 % 97).as("t"),
    col("id").as("lid"))
  private def mkRight = spark.range(0, 300).select(
    (col("id") % 7).as("k"),
    (col("id") * 173 % 97).as("t"),
    col("id").as("rid"),
    (col("id") % 13).cast("double").as("rv"))

  private def naiveAsof(inclusive: Boolean): Map[Long, Option[Long]] = {
    val l = mkLeft.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val r = mkRight.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    l.map { case (k, t, lid) =>
      val cand = r.filter(x => x._1 == k && (if (inclusive) x._2 <= t else x._2 < t))
      // latest ts wins; among ts ties the greatest tie (rid) wins
      lid -> (if (cand.isEmpty) None
              else Some(cand.maxBy(x => (x._2, x._3))._3))
    }.toMap
  }

  test("asof backward matches a naive argmax reference, inclusive and strict") {
    for (inclusive <- Seq(true, false)) {
      val got = AsofJoin.backward(
          mkLeft, mkRight, Seq("k"), "t", "t", "rid",
          Seq("rid" -> "rid", "rv" -> "rv"), inclusive = inclusive)
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got === naiveAsof(inclusive), s"inclusive=$inclusive")
    }
  }

  private def naiveForward(inclusive: Boolean, tol: Option[Long]): Map[Long, Option[Long]] = {
    val l = mkLeft.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val r = mkRight.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    l.map { case (k, t, lid) =>
      val cand = r.filter(x => x._1 == k && (if (inclusive) x._2 >= t else x._2 > t))
      // earliest ts wins; among ts ties the greatest tie (rid) wins
      val m = if (cand.isEmpty) None
              else Some(cand.minBy(x => (x._2, -x._3)))
      lid -> m.filter(x => tol.forall(tl => x._2 - t <= tl)).map(_._3)
    }.toMap
  }

  test("asof forward matches a naive reference, with and without tolerance") {
    for (inclusive <- Seq(true, false); tol <- Seq(None, Some(7L))) {
      val got = graft.operators.AsofJoin.asof(
          mkLeft, mkRight, Seq("k"), "t", "t", "rid",
          Seq("rid" -> "rid"), forward = true, inclusive = inclusive,
          tolerance = tol)
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got === naiveForward(inclusive, tol), s"inclusive=$inclusive tol=$tol")
    }
  }

  test("asof backward tolerance nulls out matches beyond the window") {
    val l = Seq((1L, 100L, 1L), (1L, 105L, 2L)).toDF("k", "t", "lid")
    val r = Seq((1L, 98L, 10L)).toDF("k", "t", "rid")
    val got = graft.operators.AsofJoin.asof(
        l, r, Seq("k"), "t", "t", "rid", Seq("rid" -> "rid"),
        tolerance = Some(3L))
      .select("lid", "rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    // lid 1 is 2 units after the right row (within 3); lid 2 is 7 out
    assert(got === Map(1L -> 10L, 2L -> -1L))
  }

  test("asof output is exactly |left| rows and never inflates") {
    val out = AsofJoin.backward(mkLeft, mkRight, Seq("k"), "t", "t", "rid",
      Seq("rid" -> "rid"))
    assert(out.count() === 400)
    assert(out.select("lid").distinct().count() === 400)
  }

  test("asof plan: one Exchange over the union, no nested loop") {
    val out = AsofJoin.backward(mkLeft, mkRight, Seq("k"), "t", "t", "rid",
      Seq("rid" -> "rid"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected 1 keyed Exchange, got $exchanges\n$p")
  }

  test("range join matches the inequality join, including bin edges") {
    // ranges straddle bin boundaries of width 10; negative values included
    val points = spark.range(0, 500).select(
      (col("id") % 5).as("k"), (col("id") * 7 % 200 - 40).as("p"), col("id").as("pid"))
    val ranges = spark.range(0, 120).select(
      (col("id") % 5).as("k"),
      (col("id") * 11 % 180 - 50).as("s"),
      (col("id") * 11 % 180 - 50 + col("id") % 23).as("e"),
      col("id").as("rid2"))
    val got = RangeJoin.binned(points, ranges, Seq("k"), "p", "s", "e", binWidth = 10)
      .select("pid", "rid2")
    val want = points.join(ranges, points("k") === ranges("k")
        && col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "rid2")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("range join: end < start rows match nothing, each match appears once") {
    val points = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("k", "p", "pid")
    val ranges = Seq((1L, 30L, 5L, 10L), (1L, 0L, 25L, 11L)).toDF("k", "s", "e", "rid2")
    val got = RangeJoin.binned(points, ranges, Seq("k"), "p", "s", "e", binWidth = 3)
      .select("pid", "rid2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 11L), (2L, 11L)))
  }

  private def naiveNearest(inclusive: Boolean, tol: Option[Long]): Map[Long, Option[Long]] = {
    val l = mkLeft.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val r = mkRight.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    l.map { case (k, t, lid) =>
      val back = r.filter(x => x._1 == k && (if (inclusive) x._2 <= t else x._2 < t))
      val fwd = r.filter(x => x._1 == k && (if (inclusive) x._2 >= t else x._2 > t))
      val b = if (back.isEmpty) None else Some(back.maxBy(x => (x._2, x._3)))
      val f = if (fwd.isEmpty) None else Some(fwd.minBy(x => (x._2, -x._3)))
      // closer wins; equal distance -> backward (pandas semantics)
      val m = (b, f) match {
        case (Some(bb), Some(ff)) =>
          if (t - bb._2 <= ff._2 - t) Some(bb) else Some(ff)
        case (x, y) => x.orElse(y)
      }
      lid -> m.filter(x => tol.forall(tl => math.abs(x._2 - t) <= tl)).map(_._3)
    }.toMap
  }

  test("asof nearest matches a naive reference (inclusive/strict x tolerance)") {
    for (inclusive <- Seq(true, false); tol <- Seq(None, Some(5L))) {
      val got = AsofJoin.nearest(
          mkLeft, mkRight, Seq("k"), "t", "t", "rid",
          Seq("rid" -> "rid"), inclusive = inclusive, tolerance = tol)
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got === naiveNearest(inclusive, tol), s"inclusive=$inclusive tol=$tol")
    }
  }

  test("asof nearest plan: the two sweeps share one keyed Exchange") {
    val out = AsofJoin.nearest(mkLeft, mkRight, Seq("k"), "t", "t", "rid",
      Seq("rid" -> "rid"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected 1 keyed Exchange, got $exchanges\n$p")
    assert(out.count() === 400)
  }

  test("range join plan: equi-join shape, never a nested loop") {
    val points = spark.range(0, 100).select(col("id").as("p"), col("id").as("pid"))
    val ranges = spark.range(0, 10).select(
      (col("id") * 10).as("s"), (col("id") * 10 + 15).as("e"), col("id").as("rid2"))
    val out = RangeJoin.binned(points, ranges, Seq(), "p", "s", "e", binWidth = 10)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
