package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023) —
  * score raw-corpus documents by how target-like they are under hashed
  * n-gram bag-of-words models, then keep the highest-weight fraction.
  * The canonical "select pretraining data that looks like the quality
  * subset" curation step (beyond the reference engine's scope; part of
  * the LLM-pipeline operator set).
  *
  * Features are unigrams+bigrams hashed into `buckets` slots (the paper's
  * hashed n-gram generative model). Both the target and the raw corpora
  * reduce to ONE bucket-count aggregation each (map-side combined,
  * `buckets`-bounded output); the per-bucket log-likelihood-ratio model
  * is dense over all `buckets` slots and BROADCASTS, so scoring is a
  * map-side join + one per-doc partial-aggregated integer sum — no
  * corpus shuffle ever carries text, and nothing grows with corpus size
  * except the two count aggregations.
  *
  * Determinism/oracle parity: the bucket hash is the md5-prefix integer
  * scheme both engines compute identically, and each log term is
  * floor(ln(rational)·1e6) — the exact-integer-micro-unit class verified
  * to agree between Java and C libm (see TextIndex's BM25 notes) — so
  * per-doc scores are partition-order-independent exact int64 sums and
  * the DuckDB oracle matches bit-for-bit.
  */
object Dsir {

  /** Hashed unigram+bigram features of one document. */
  private[graft] def grams(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(TextOps.tokens(text), TextOps.rawNgrams(text, 2))

  private def bucketOf(gram: org.apache.spark.sql.Column, buckets: Int) =
    TextOps.tokenHash32(gram) % buckets

  /** (bucket, c) counts of hashed grams over a corpus; at most `buckets`
    * rows out, partial-aggregated before the one shuffle.
    */
  def bucketCounts(docs: DataFrame, textCol: String, buckets: Int): DataFrame =
    docs
      .select(explode(grams(col(textCol))).as("__g"))
      .select(bucketOf(col("__g"), buckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))

  /** Dense per-bucket importance model: for every bucket b in
    * [0, buckets), lr_micro[b] =
    *   floor(ln((ct_b+1)/(NT+B))·1e6) − floor(ln((cr_b+1)/(NR+B))·1e6)
    * — add-one-smoothed target vs raw log-likelihoods in exact integer
    * micro-units (each term is the verified floor-ln class; their
    * difference is exact int arithmetic). Dense means scoring needs no
    * out-of-model fallback: every gram's bucket has a row. `buckets`
    * rows total — broadcastable at any corpus size.
    */
  def model(
      target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int): DataFrame = {
    val s = target.sparkSession
    def side(docs: DataFrame, cCol: String, nCol: String): DataFrame = {
      // NOT pinned (r15, reverting an r14 localCheckpoint): the totals
      // aggregate and the dense join both reference the counts, but the
      // paired in-suite benches showed the pin (eager store + stats loss)
      // costing ~2.4x more than re-running the bucket aggregate twice.
      val counts = bucketCounts(docs, textCol, buckets)
      val total = counts.agg(sum(col("c")).as(nCol))
      s.range(buckets).select(col("id").as("bucket"))
        .join(counts, Seq("bucket"), "left")
        .crossJoin(broadcast(total))
        .select(col("bucket"), coalesce(col("c"), lit(0L)).as(cCol), col(nCol))
    }
    fromCounts(
      side(target, "__ct", "__nt").join(side(raw, "__cr", "__nr"), Seq("bucket")),
      buckets)
  }

  /** [[model]] for the common "target is a slice of the raw corpus" case:
    * ONE gram-explode pass computes both sides' bucket counts (the raw
    * count plus a conditional count of rows satisfying `targetCond`) —
    * half the corpus work of the two-corpus form.
    */
  def modelFromSlice(
      raw: DataFrame, textCol: String,
      targetCond: org.apache.spark.sql.Column, buckets: Int): DataFrame = {
    val s = raw.sparkSession
    val counts = raw
      .select(targetCond.as("__t"), explode(grams(col(textCol))).as("__g"))
      .select(col("__t"), bucketOf(col("__g"), buckets).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("__cr"),
        count(when(col("__t"), lit(1))).as("__ct"))
      // NOT pinned (r15, reverting r14; same adjudication as model())
    val totals = counts.agg(
      sum(col("__cr")).as("__nr"), sum(col("__ct")).as("__nt"))
    val dense = s.range(buckets).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__ct"), lit(0L)).as("__ct"),
        col("__nr"), col("__nt"))
    fromCounts(dense, buckets)
  }

  private def fromCounts(joined: DataFrame, buckets: Int): DataFrame = {
    def lnMicro(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      floor(log(num.cast("double") / den.cast("double")) * lit(1e6)).cast("long")
    joined.select(col("bucket"),
      (lnMicro(col("__ct") + 1, col("__nt") + buckets) -
        lnMicro(col("__cr") + 1, col("__nr") + buckets)).as("lr_micro"))
  }

  /** Per-document importance weight against a `buckets`-slot model (the
    * modulus must match [[model]]'s): (idCol, n_grams, dsir_micro) with
    * dsir_micro = Σ lr_micro[bucket(g)] over the doc's grams — exact
    * int64, order-independent. The model joins broadcast; the only
    * Exchange is the per-doc sum's partial-aggregated shuffle. Docs with
    * no grams (empty text) keep n_grams = 0, dsir_micro = 0.
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, buckets: Int): DataFrame = {
    val m = broadcast(model.select(col("bucket"), col("lr_micro")))
    docs
      .select(col(idCol), explode_outer(grams(col(textCol))).as("__g"))
      .select(col(idCol), bucketOf(col("__g"), buckets).as("bucket"))
      .join(m, Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("bucket")).as("n_grams"),
        coalesce(sum(col("lr_micro")), lit(0L)).as("dsir_micro"))
  }
}
