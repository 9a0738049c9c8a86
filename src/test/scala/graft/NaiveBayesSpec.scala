package graft

import org.apache.spark.sql.functions._

import graft.text.NaiveBayes

/** Multinomial Naive Bayes: the micro-unit score algebra must equal the
  * directly-computed log-probabilities, predictions must follow the
  * class evidence, and nothing may depend on partitioning.
  */
class NaiveBayesSpec extends GraftSuite {
  import spark.implicits._

  private val train = Seq(
    ("spam", "buy pills buy now"),
    ("spam", "cheap pills now"),
    ("ham", "meeting notes agenda"),
    ("ham", "agenda for the meeting")).toDF("label", "text")

  test("scores equal the directly-computed micro-unit log-probabilities") {
    val m = NaiveBayes.train(train, "text", "label")
    val docs = Seq((1L, "buy pills"), (2L, "meeting agenda"), (3L, "now the")).toDF("id", "text")
    val got = NaiveBayes.classify(m, docs, "id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    // ground truth computed independently from raw counts
    val rows = train.as[(String, String)].collect()
    val byCls = rows.groupBy(_._1)
    val n = rows.length.toLong
    val vocab = rows.flatMap(_._2.split(" ")).distinct.length.toLong
    def micro(x: Double): Long = math.floor(math.log(x) * 1e6).toLong
    def score(text: String, cls: String): Long = {
      val docs = byCls(cls)
      val toks = docs.flatMap(_._2.split(" "))
      val tc = toks.length.toLong
      val prior = micro(docs.length.toDouble / n.toDouble)
      prior + text.split(" ").map { w =>
        micro((toks.count(_ == w) + 1L).toDouble / (tc + vocab).toDouble)
      }.sum
    }
    val want = Map(
      1L -> Seq("ham", "spam").map(c => (c, score("buy pills", c))).maxBy(p => (p._2, p._1)),
      2L -> Seq("ham", "spam").map(c => (c, score("meeting agenda", c))).maxBy(p => (p._2, p._1)))
    // maxBy on (score, label) picks the highest score; ties prefer the
    // LEXICOGRAPHICALLY LARGEST label under maxBy, so assert no tie first
    assert(got(1L)._1 === "spam" && got(1L)._2 === want(1L)._2)
    assert(got(2L)._1 === "ham" && got(2L)._2 === want(2L)._2)
    // unseen-heavy doc still gets a deterministic argmax row
    assert(got.contains(3L))
  }

  test("prediction follows the evidence on held-out docs") {
    val m = NaiveBayes.train(train, "text", "label")
    val docs = Seq((10L, "cheap pills cheap pills"), (11L, "notes for the agenda"))
      .toDF("id", "text")
    val got = NaiveBayes.classify(m, docs, "id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got === Map(10L -> "spam", 11L -> "ham"))
  }

  test("classify is invariant to train/test partitioning") {
    val docs = spark.read.parquet(s"$sf0/documents.parquet")
    def run(tr: org.apache.spark.sql.DataFrame, te: org.apache.spark.sql.DataFrame) = {
      val m = NaiveBayes.train(tr, "text", "lang")
      NaiveBayes.classify(m, te, "doc_id", "text")
        .as[(Long, String, Long)].collect().toSet
    }
    val tr = docs.filter(col("doc_id") % 2 === 0)
    val te = docs.filter(col("doc_id") % 2 === 1)
    val base = run(tr, te)
    assert(base.size === te.count())
    assert(run(tr.repartition(11), te.repartition(5)) === base)
  }
}
