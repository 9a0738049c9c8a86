package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model quality scoring — the CCNet-style
  * "score documents by an n-gram LM and filter/bucket on it" pipeline
  * step (Wenzek et al., CCNet; the reference engine has no text-quality
  * notion — this belongs to the beyond-the-reference pipeline set).
  *
  * The model is the corpus's own top-`maxBigrams` bigrams by count
  * (deterministic cut: count desc, then bigram asc) with exact MLE
  * conditionals p(w2|w1) = c2 / c1, where c1 sums the retained-or-not
  * occurrences of w1 as a bigram head. A document scores the average of
  * floor(ln(p)·1e6) over its bigrams found in the model — integer
  * micro-units summed exactly, so the score is independent of partition
  * order and mirrors the DuckDB oracle bit-for-bit. Out-of-model bigrams
  * are counted (`n_oov`) but not scored: the model table stays bounded
  * (≤ maxBigrams rows) and BROADCASTS, which is the whole scale story —
  * scoring is a map-side join plus one per-doc partial-aggregated sum;
  * no corpus shuffle carries text.
  */
object LangModel {

  /** Train: (gram, c2, c1) for the top `maxBigrams` bigrams by
    * (count desc, gram asc). c1 (the head-word context count) is computed
    * over ALL bigrams before the cut, so retained conditionals are true
    * corpus MLE probabilities. The global cut runs as a k-bounded
    * TakeOrdered (no single-partition window).
    */
  def train(docs: DataFrame, textCol: String, maxBigrams: Int): DataFrame = {
    // NOT pinned (r15, reverting an r14 localCheckpoint): both the
    // head-context aggregation and the top-k cut reference these counts,
    // but the paired in-suite benches (driver PERF_r14 and the builder's
    // own pre/post pair) showed the eager row-format store + rescan +
    // ExistingRDD stats loss costing ~2-2.8x MORE than recomputing the
    // vocabulary-sized aggregate twice. Two cheap references don't earn
    // a pin.
    val grams = docs
      .select(explode(TextOps.rawNgrams(col(textCol), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c2"))
    val heads = grams
      .groupBy(element_at(split(col("gram"), " "), 1).as("__w1"))
      .agg(sum(col("c2")).as("c1"))
    val top = graft.operators.TopK.global(
      grams, "c2", ascending = false, k = maxBigrams, tieBreak = Seq("gram"))
    top
      .join(heads, element_at(split(col("gram"), " "), 1) === col("__w1"))
      .select(col("gram"), col("c2"), col("c1"))
  }

  /** Score each document against a trained model: returns
    * (idCol, n_bigrams, n_scored, avg_logp_micro) where avg_logp_micro =
    * round(Σ floor(ln(c2/c1)·1e6) / n_scored, 4) over in-model bigrams
    * (0.0 when none match). Docs with fewer than two tokens keep
    * n_bigrams = 0.
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val contrib = floor(
      log(col("c2").cast("double") / col("c1").cast("double")) * lit(1e6))
      .cast("long")
    val m = broadcast(model.select(col("gram"), contrib.as("__lp")))
    docs
      .select(col(idCol), explode_outer(TextOps.rawNgrams(col(textCol), 2)).as("gram"))
      .join(m, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("gram")).as("n_bigrams"),
        count(col("__lp")).as("n_scored"),
        sum(col("__lp")).as("__sum"))
      .select(col(idCol), col("n_bigrams"), col("n_scored"),
        when(col("n_scored") === 0, lit(0.0)).otherwise(
          round(col("__sum").cast("double") / col("n_scored").cast("double"), 4))
          .as("avg_logp_micro"))
  }
}
