package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification — the fasttext-style
  * model-based filter of LLM data pipelines (quality/domain/language
  * classification with a linear bag-of-words model), in the one form
  * whose training AND inference are exact integer arithmetic end to end,
  * so the whole train→score→argmax chain is oracle-checkable:
  * training is counting (tf per (term, class), tokens per class, docs
  * per class, vocabulary size), and scoring quantizes each log term to
  * micro-units: floor(ln(rational)·1e6) — the libm-parity class the BM25
  * gate established.
  *
  * score(d, c) = floor(ln(n_c/N)·1e6)
  *             + Σ_{w ∈ d} tf_d(w) · floor(ln((tf_{w,c}+1)/(T_c+V))·1e6)
  * (Laplace smoothing; V = corpus vocabulary size). Argmax per doc, ties
  * by ascending class label.
  *
  * Scale design: the model is vocabulary-sized, never corpus-sized — it
  * BROADCASTS into the scoring scan. The zero-count (w, c) cells never
  * materialize: scoring uses the algebraic split
  * Σ tf·lw = dl·default_c + Σ_{tf_{w,c}>0} tf·(lw − default_c), where
  * default_c = floor(ln(1/(T_c+V))·1e6) — so both the model and the
  * score join touch only OBSERVED (term, class) pairs. One shuffle
  * trains (the (term, class) count); one partial-aggregated (doc, class)
  * sum + a C-bounded argmax scores.
  */
object NaiveBayes {

  /** A trained model: observed (term, class) log-weights
    * (__term, __cls, __lw — micro-units), per-class constants
    * (__cls, __prior, __default — micro-units), both vocabulary/class
    * sized (broadcastable).
    */
  case class Model(termWeights: DataFrame, classConsts: DataFrame)

  /** Train by counting over `(textCol, classCol)`. */
  def train(docs: DataFrame, textCol: String, classCol: String): Model = {
    val toks = docs.select(col(classCol).as("__cls"),
      TextOps.tokens(col(textCol)).as("__toks"))
    // NOT pinned (r15, reverting two r14 localCheckpoints): termClass and
    // classTotals each have two references, but the paired in-suite
    // benches showed the pins costing ~1.8x more than the recompute
    // (q_nb_classify 1.84->3.31 s in the builder's own r14 pair).
    val termClass = toks
      .select(col("__cls"), explode(col("__toks")).as("__term"))
      .groupBy(col("__term"), col("__cls"))
      .agg(count(lit(1)).as("__tf"))
    // per-class totals and priors (class-count-sized aggregations)
    val classTotals = toks.groupBy(col("__cls")).agg(
      count(lit(1)).as("__nc"),
      sum(size(col("__toks")).cast("long")).as("__tc"))
    val n = docs.count()
    val v = termClass.select(col("__term")).distinct().count()
    val consts = classTotals.select(
      col("__cls"),
      floor(log(col("__nc").cast("double") / lit(n.toDouble)) * lit(1e6))
        .cast("long").as("__prior"),
      floor(log(lit(1.0) / (col("__tc") + lit(v)).cast("double")) * lit(1e6))
        .cast("long").as("__default"),
      (col("__tc") + lit(v)).as("__denom"))
    val weights = termClass.join(consts.select(col("__cls"), col("__denom")), "__cls")
      .select(col("__term"), col("__cls"),
        floor(log((col("__tf") + 1L).cast("double") / col("__denom").cast("double")) *
          lit(1e6)).cast("long").as("__lw"))
    Model(weights, consts.drop("__denom"))
  }

  /** Score and classify: (id, pred, score_micro) — the argmax class per
    * document and its exact integer log-score. Ties break by ascending
    * class label so the result is deterministic.
    */
  def classify(
      model: Model, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
      TextOps.tokens(col(textCol)).as("__toks"))
    val docTf = toks
      .select(col("__id"), explode(col("__toks")).as("__term"))
      .groupBy(col("__id"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dl = toks.select(col("__id"), size(col("__toks")).cast("long").as("__dl"))
    // observed-cell deltas: only (term, class) pairs the model has
    val deltas = docTf
      .join(broadcast(model.termWeights), "__term")
      .join(broadcast(model.classConsts.select(col("__cls"), col("__default"))),
        "__cls")
      .groupBy(col("__id"), col("__cls"))
      .agg(sum(col("__tf") * (col("__lw") - col("__default"))).as("__delta"))
    val scored = dl
      .crossJoin(broadcast(model.classConsts))
      .join(deltas, Seq("__id", "__cls"), "left")
      .select(col("__id"), col("__cls"),
        (col("__prior") + col("__dl") * col("__default") +
          coalesce(col("__delta"), lit(0L))).as("__score"))
    graft.operators.TopK.perGroup(
        scored, "__id", "__score", ascending = false, k = 1, Seq("__cls"))
      .toDF("id", "pred", "score_micro")
  }
}
