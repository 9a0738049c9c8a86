package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed token co-occurrence counts with PMI scoring — the
  * word2vec/GloVe-style corpus statistic (Church & Hanks 1990 for PMI;
  * Mikolov et al. 2013 for the windowed-pair formulation) a training-data
  * pipeline computes to build association vocabularies, collocation
  * lists, and embedding co-occurrence matrices. The reference engine has
  * no corpus-statistics notion; this belongs to the beyond-the-reference
  * pipeline set.
  *
  * Scale shape: token pairs are a pure per-document projection (no
  * self-join — each gap d ≤ window zips the token array against itself
  * shifted by d), so the only corpus-sized shuffles are the two
  * wordcount-style groupBys (pairs, unigrams), both map-side combined
  * and bounded by vocab²/vocab distinct keys, carrying single tokens —
  * never document text. Totals (T tokens, P pairs) ride a broadcast
  * 1-row crossJoin; the unigram join keys on single words AFTER the
  * minCount cut shrinks the pair table.
  *
  * PMI is exact-integer at the gate: pmi_micro =
  * floor(ln(c_ab·T² / (P·c_a·c_b))·1e6) with the ratio written as one
  * fixed-order double expression both engines evaluate bit-identically
  * (the LangModel ln-micro-unit class, proven hash-exact since round 8).
  */
object Cooccur {

  /** Ordered co-occurring pairs (a before b, gap ≤ window) with counts
    * and PMI: returns (a, b, c_ab, c_a, c_b, pmi_micro) for pairs seen
    * at least `minCount` times. c_a/c_b are unigram occurrence counts;
    * P counts ALL emitted pairs (pre-cut) so retained PMIs are true
    * corpus statistics, not conditioned on the cut.
    */
  def pmi(docs: DataFrame, textCol: String, window: Int, minCount: Long): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    // materialize the split ONCE per (doc, gap) row before the HOF —
    // interpreted lambdas re-evaluate embedded split() per element
    // (round-8 CDC finding)
    val ws = docs.select(split(col(textCol), " ").as("__ws"))
      .select(col("__ws"), explode(sequence(lit(1), lit(window))).as("__d"))
    // guard the empty tail explicitly: sequence(1, 0) is DESCENDING in
    // Spark, not empty
    val pairs = ws.select(explode(expr(
      """if(size(__ws) > __d,
        |   transform(sequence(1, size(__ws) - __d),
        |     j -> struct(element_at(__ws, j) as a, element_at(__ws, j + __d) as b)),
        |   array())""".stripMargin)).as("__p"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"))
    // materialized ONCE each: pairCounts feeds the totals aggregate AND
    // the kept-join (its subtree is the windowed pair explode — the
    // expensive pass), uni feeds totals plus BOTH unigram joins (a and b
    // key differently, so no exchange reuse). Pins: distinct co-occurring
    // pairs and the vocabulary.
    val pairCounts = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .localCheckpoint(true)
    val uni = docs.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val totals = pairCounts.agg(sum(col("c_ab")).as("__P"))
      .crossJoin(uni.agg(sum(col("c")).as("__T")))
    val kept = pairCounts.filter(col("c_ab") >= minCount)
      .join(uni.select(col("w").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uni.select(col("w").as("b"), col("c").as("c_b")), Seq("b"))
      .crossJoin(broadcast(totals))
    val ratio = (col("c_ab").cast("double") * col("__T").cast("double") * col("__T").cast("double")) /
      (col("__P").cast("double") * col("c_a").cast("double") * col("c_b").cast("double"))
    kept.select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
      floor(log(ratio) * lit(1e6)).cast("long").as("pmi_micro"))
  }
}
