package graft

import org.apache.spark.sql.functions._

import graft.text.Cooccur

/** Co-occurrence/PMI vs a brute-force Scala reference: pair counts for
  * every gap ≤ window, unigram joins, and the micro-unit PMI formula.
  */
class CooccurSpec extends GraftSuite {
  import spark.implicits._

  private val corpus = Seq(
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat the cat the cat")

  private def bruteForce(window: Int): (Map[(String, String), Long], Map[String, Long], Long, Long) = {
    val docs = corpus.map(_.split(" ", -1).toSeq)
    val pairs = docs.flatMap(ws =>
      for (d <- 1 to window; j <- 0 until ws.length - d) yield (ws(j), ws(j + d)))
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pc = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    (pc, uni, pairs.length.toLong, docs.map(_.length).sum.toLong)
  }

  test("pair and unigram counts match brute force (window=2, minCount=1)") {
    val (pc, uni, p, t) = bruteForce(2)
    val got = Cooccur.pmi(corpus.toDF("text"), "text", window = 2, minCount = 1)
      .select("a", "b", "c_ab", "c_a", "c_b", "pmi_micro")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.length === pc.size)
    got.foreach { case (a, b, cab, ca, cb, pmi) =>
      assert(cab === pc((a, b)), s"c_ab($a,$b)")
      assert(ca === uni(a) && cb === uni(b), s"unigrams($a,$b)")
      val expected = math.floor(math.log(
        cab.toDouble * t.toDouble * t.toDouble / (p.toDouble * ca.toDouble * cb.toDouble)) * 1e6).toLong
      assert(pmi === expected, s"pmi($a,$b)")
    }
  }

  test("minCount prunes; always-together pair scores positive PMI") {
    val got = Cooccur.pmi(corpus.toDF("text"), "text", window = 2, minCount = 3)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.forall(_._3 >= 3))
    // ("the","cat") co-occurs far above independence in this corpus
    val theCat = got.find(r => r._1 == "the" && r._2 == "cat")
    assert(theCat.exists(_._6 > 0), s"got $theCat")
  }

  test("single-token and empty docs emit no pairs but count tokens") {
    val df = Seq("solo", "", "x y").toDF("text")
    val got = Cooccur.pmi(df, "text", window = 2, minCount = 1)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.length === 1)
    val (a, b, cab, ca, cb, _) = got.head
    assert((a, b, cab) === ("x", "y", 1L))
    // T counts all tokens incl. "solo" and the empty-string token; the
    // joins only surface x/y unigram counts
    assert(ca === 1L && cb === 1L)
  }
}
