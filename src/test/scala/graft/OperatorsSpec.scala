package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Metric, RangeFilter, TermFilter, TermMode}
import graft.operators.{Filters, Knn, TopK}
import graft.table.Crud

class OperatorsSpec extends GraftSuite {
  import spark.implicits._

  test("TopK.perGroup equals naive window top-k") {
    val df = spark.range(0, 2000).select(
      (col("id") % 7).as("g"),
      (col("id") * 37 % 101).cast("double").as("score"),
      col("id"))
    val fast = TopK.perGroup(df, "g", "score", ascending = true, k = 5, tieBreak = Seq("id"))
    val w = Window.partitionBy($"g").orderBy($"score".asc, $"id".asc)
    val naive = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5).drop("rn")
    assert(fast.count() === naive.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("TopK.perGroupSorted equals perGroup (both directions, ties, skew)") {
    // skewed group sizes + heavy ties exercise the streaming-take cut
    val df = spark.range(0, 3000).select(
      when(col("id") < 2500, lit(0L)).otherwise(col("id") % 11).as("g"),
      (col("id") % 13).cast("double").as("score"),
      col("id")).repartition(7)
    for (asc <- Seq(true, false)) {
      val heap = TopK.perGroup(df, "g", "score", asc, k = 4, tieBreak = Seq("id"))
      val srt = TopK.perGroupSorted(df, "g", "score", asc, k = 4, tieBreak = Seq("id"))
      assert(srt.count() === heap.count())
      assert(srt.exceptAll(heap).isEmpty && heap.exceptAll(srt).isEmpty,
        s"ascending=$asc")
    }
  }

  test("flatSearch returns k rows per query, sorted set matches brute force") {
    val emb = spark.read.parquet(s"$sf0/embeddings.parquet")
    val q = emb.select($"vec_id".as("qid"), $"embedding".as("qvec")).filter($"qid" < 3)
    val res = Knn.flatSearch(emb, "vec_id", "embedding", q, "qid", "qvec", k = 7, Metric.L2)
    val counts = res.groupBy("qid").count().collect()
    assert(counts.length === 3 && counts.forall(_.getLong(1) === 7))
    // self-match must rank first with distance 0 for L2
    val self = res.filter($"qid" === $"id").select("score").collect()
    assert(self.length === 3 && self.forall(_.getDouble(0) === 0.0))
  }

  test("term filter modes: union / all / not-in partition the space") {
    val p = spark.read.parquet(s"$sf0/part.parquet").withColumn("tokens", split($"p_name", " "))
    val vals = Seq("red", "blue")
    val union = p.filter(Filters.term(TermFilter("tokens", vals), p)).count()
    val notin = p.filter(Filters.term(TermFilter("tokens", vals, TermMode.NotIn), p)).count()
    val all = p.filter(Filters.term(TermFilter("tokens", vals, TermMode.All), p)).count()
    assert(union + notin === p.count())
    assert(all <= union)
  }

  test("range filter bound inclusivity") {
    val df = Seq(1, 5, 10).toDF("x")
    assert(df.filter(Filters.range(RangeFilter("x", Some(1), Some(10)))).count() === 3)
    assert(df.filter(Filters.range(RangeFilter("x", Some(1), Some(10),
      includeLower = false, includeUpper = false))).count() === 1)
    assert(df.filter(Filters.range(RangeFilter("x", None, Some(5)))).count() === 2)
  }

  test("upsert: updates replace, inserts append, last write wins in batch") {
    val base = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val delta = Seq((2, "b1", 1L), (2, "b2", 2L), (3, "c", 1L)).toDF("k", "v", "seq")
    val out = Crud.upsert(base, delta.select($"k", $"v"), "k",
      orderCol = None) // dropDuplicates path: just check keys
    assert(out.select("k").as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    val ordered = Crud.upsert(base, delta, "k", orderCol = Some("seq"))
      .filter($"k" === 2).select("v").as[String].head()
    assert(ordered === "b2")
  }

  test("delete by query returns deleted keys and surviving state") {
    val base = Seq((1, 10), (2, 20), (3, 30)).toDF("k", "x")
    val pred = $"x" >= 20
    assert(Crud.deletedKeys(base, pred, "k").as[Int].collect().sorted.toSeq === Seq(2, 3))
    assert(Crud.deleteWhere(base, pred).select("k").as[Int].collect().toSeq === Seq(1))
  }

  test("CorpusSelect matches the global-window greedy cut across partition counts") {
    val rnd = new scala.util.Random(13)
    val docs = (0 until 600)
      .map(i => (i.toLong, (rnd.nextInt(90) + 10).toLong, rnd.nextInt(50).toLong))
      .toDF("id", "w", "score")
    // reference: single-partition window formulation
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"score".desc, $"id".asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val budget = 9000L
    val expect = docs
      .withColumn("sel_offset", coalesce(sum($"w").over(w), lit(0L)))
      .filter($"sel_offset" + $"w" <= budget)
      .select($"id", $"sel_offset")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    for (np <- Seq(1, 4, 32)) {
      val got = graft.operators.CorpusSelect
        .selectByBudget(docs, "id", "score", "w", budget, numPartitions = np)
        .select($"id", $"sel_offset")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got === expect, s"numPartitions=$np")
    }
    // sanity: the cut is partial (neither empty nor everything)
    assert(expect.nonEmpty && expect.size < 600)
  }

  test("CorpusSelect: zero budget selects nothing; huge budget selects all") {
    val docs = Seq((1L, 5L, 1L), (2L, 5L, 2L)).toDF("id", "w", "score")
    assert(graft.operators.CorpusSelect
      .selectByBudget(docs, "id", "score", "w", 0L).count() === 0L)
    assert(graft.operators.CorpusSelect
      .selectByBudget(docs, "id", "score", "w", 1000L).count() === 2L)
    // a doc that does not fit entirely is skipped, later smaller docs that
    // still fit are NOT back-filled (greedy prefix semantics): score order
    // is id 2 (w=5) then id 1 (w=5); budget 7 fits only the first
    val sel = graft.operators.CorpusSelect
      .selectByBudget(docs, "id", "score", "w", 7L)
      .select($"id").as[Long].collect().toSeq
    assert(sel === Seq(2L))
    // regression: a zero-weight doc whose exclusive offset EQUALS the
    // budget still fits — partition pruning must use <=, not <
    val zw = Seq((1L, 10L, 9L), (2L, 0L, 1L)).toDF("id", "w", "score")
    val selz = graft.operators.CorpusSelect
      .selectByBudget(zw, "id", "score", "w", 10L, numPartitions = 2)
      .select($"id").as[Long].collect().toSeq.sorted
    assert(selz === Seq(1L, 2L))
  }

  test("selectByBudgetPerGroup matches per-group window cut across partition counts") {
    val rnd = new scala.util.Random(29)
    val domains = Seq("web", "code", "wiki")
    val docs = (0 until 500)
      .map(i => (i.toLong, domains(rnd.nextInt(3)),
        (rnd.nextInt(90) + 10).toLong, rnd.nextInt(40).toLong))
      .toDF("id", "dom", "w", "score")
    val budgets = Map("web" -> 3000L, "code" -> 1200L) // wiki -> default 500
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"dom").orderBy($"score".desc, $"id".asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expect = docs
      .withColumn("sel_offset", coalesce(sum($"w").over(w), lit(0L)))
      .filter($"sel_offset" + $"w" <= when($"dom" === "web", 3000L)
        .when($"dom" === "code", 1200L).otherwise(500L))
      .select($"id", $"sel_offset")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    for (np <- Seq(1, 5, 32)) {
      val got = graft.operators.CorpusSelect
        .selectByBudgetPerGroup(docs, "id", "dom", "score", "w", budgets,
          defaultBudget = 500L, numPartitions = np)
        .select($"id", $"sel_offset")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got === expect, s"numPartitions=$np")
    }
    // each domain got a partial, non-empty cut
    val gotDoms = graft.operators.CorpusSelect
      .selectByBudgetPerGroup(docs, "id", "dom", "score", "w", budgets, 500L)
      .groupBy($"dom").count().as[(String, Long)].collect().toMap
    assert(gotDoms.keySet === domains.toSet)
  }

  test("PII redaction masks emails, IPs and phone runs, leaves clean text") {
    import graft.text.TextOps
    val rows = Seq(
      (1L, "mail bob.smith_99@corp.example.com now"),
      (2L, "server at 192.168.0.1 rebooted"),
      (3L, "call +1 (555) 014-2398 today"),
      (4L, "nothing sensitive here"),
      (5L, "multi a@b.io c@d.org 10.0.0.1 and 555 123 4567 done"))
      .toDF("id", "text")
    val got = rows.select($"id", TextOps.redactPii($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "mail <EMAIL> now")
    assert(got(2L) === "server at <IP> rebooted")
    assert(got(3L) === "call <PHONE> today")
    assert(got(4L) === "nothing sensitive here")
    assert(got(5L) === "multi <EMAIL> <EMAIL> <IP> and <PHONE> done")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Regression (r7 break): the driver-generated events.parquet switched to
  // TIMESTAMP(MICROS, isAdjustedToUTC=false) which Spark reads as
  // TIMESTAMP_NTZ; the loader must normalize it to a UTC-instant TIMESTAMP
  // so unix_micros consumers keep working, and Sessionize.batch must accept
  // an un-normalized NTZ column directly with identical session boundaries.
  test("events ts loads as TIMESTAMP and Sessionize handles NTZ input") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ev = graft.core.Tables.load(spark, sf0, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    // naive micros: positive and stable through unix_micros
    val us = ev.select(unix_micros($"ts")).as[Long].head()
    assert(us > 0L)

    val ltz = ev.orderBy($"event_id").limit(500)
    val ntz = ltz.withColumn("ts", $"ts".cast(TimestampNTZType))
    assert(ntz.schema("ts").dataType === TimestampNTZType)
    def sess(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.Sessionize
        .batch(df, "user_id", "ts", "event_id", "value", gapSeconds = 1800)
        .select($"user_id", $"session_id", $"session_start_us",
          $"session_end_us", $"n_events", $"sum_value")
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(sess(ntz) === sess(ltz))
  }
}
