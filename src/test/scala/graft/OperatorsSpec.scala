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

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
