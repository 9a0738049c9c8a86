package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016) — the
  * "train a subword vocabulary on the corpus" pipeline step (beyond the
  * reference's scope; part of the LLM-pipeline operator set).
  *
  * The scale design is the classic two-level one (what HF `tokenizers`
  * does in-process, re-expressed distributed): the corpus collapses ONCE
  * to a (word, freq) table — the only corpus-sized shuffle — and every
  * merge iteration then runs over that vocabulary-sized table: adjacent
  * symbol-pair counts weighted by freq (map-side combined), the winning
  * pair picked by a k-bounded TakeOrdered (count desc, pair asc — fully
  * deterministic), and the merge applied as a per-row left-to-right
  * array fold (pure codegen `aggregate`, no shuffle). Driver state per
  * iteration is the single winning pair; the words frame is
  * localCheckpointed each round so the plan stays O(1) deep.
  */
object Bpe {

  /** Separator between the two halves of a pair key ("a\u0001b") — never
    * occurs inside corpus symbols.
    */
  private val Sep = "\u0001"

  /** Adjacent character pairs of a word (the iteration-0 BPE statistics):
    * ["ab","bc"] for "abc"; empty for single-char words.
    */
  private[graft] def charPairs(w: Column): Column =
    when(length(w) >= 2,
      transform(sequence(lit(1), length(w) - 1), i => w.substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))

  /** Corpus-wide adjacent character-pair counts over whitespace words —
    * top `k` by (count desc, pair asc). The first BPE iteration's
    * statistics as a standalone exact-oracle-checkable operator: one
    * partial-aggregated shuffle of (pair, count), k-bounded result.
    */
  def pairCounts(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val counts = docs
      .select(explode(TextOps.tokens(col(textCol))).as("__w"))
      .select(explode(charPairs(col("__w"))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
    graft.operators.TopK.global(counts, "cnt", ascending = false, k = k,
      tieBreak = Seq("pair"))
  }

  /** (word, freq) table of a corpus — the one corpus-sized reduction BPE
    * training ever performs.
    */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Adjacent symbol pairs ("a\u0001b") of a symbol array. */
  private def symbolPairs(s: Column): Column =
    when(size(s) >= 2,
      transform(sequence(lit(1), size(s) - 1),
        i => concat(element_at(s, i), lit(Sep), element_at(s, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** One left-to-right non-overlapping merge of (a, b) -> a+b over a
    * symbol array (standard BPE apply: "aaa" with (a,a) -> [aa, a]).
    * Pure codegen fold; no shuffle.
    */
  private[graft] def applyMerge(s: Column, a: String, b: String): Column =
    aggregate(s, array().cast("array<string>"),
      (acc, x) =>
        // try_element_at: ANSI-safe on the empty accumulator
        when(size(acc) > 0 && try_element_at(acc, lit(-1)) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Train `nMerges` BPE merges on a corpus. Returns the ordered merge
    * list and the final (word, freq, symbols) frame. Each iteration:
    * one vocabulary-sized pair-count aggregation + a 1-row TakeOrdered
    * collect (the winning pair — the only driver state) + a codegen
    * re-segmentation fold. Stops early when no pair occurs twice.
    */
  def train(
      docs: DataFrame, textCol: String,
      nMerges: Int): (Seq[(String, String)], DataFrame) = {
    var words = wordFreqs(docs, textCol)
      // pair keys are Sep-joined and recovered by split(Sep, 2); a word
      // containing U+0001 would make that key ambiguous (wrong recovered
      // merge). Symbols only ever concatenate original word chars, so
      // excluding such words AT THE SOURCE keeps every key unambiguous —
      // a free codegen predicate before the one corpus-sized shuffle
      // (U+0001 is a control char no real tokenizer vocabulary wants).
      .filter(!col("word").contains(Sep))
      .withColumn("symbols",
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < nMerges) {
      val counts = words
        .select(explode(symbolPairs(col("symbols"))).as("pair"), col("freq"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
      val top = graft.operators.TopK.global(
        counts, "cnt", ascending = false, k = 1, tieBreak = Seq("pair"))
        .collect()
      if (top.isEmpty || top(0).getLong(top(0).fieldIndex("cnt")) < 2) {
        done = true
      } else {
        val Array(a, b) = top(0).getString(0).split(Sep, 2) match {
          case arr if arr.length == 2 => arr
          case arr => Array(arr(0), "")
        }
        merges += ((a, b))
        words = words.withColumn("symbols",
          applyMerge(col("symbols"), a, b)).localCheckpoint(true)
      }
    }
    (merges.toSeq, words)
  }

  /** Segment text with a trained merge list: tokens -> char symbols ->
    * the merges applied in training order (each a codegen fold — the
    * whole segmentation is one zero-shuffle projection). Returns
    * (docCols..., tokens: array<string> of subword symbols).
    */
  def segment(
      docs: DataFrame, textCol: String,
      merges: Seq[(String, String)], outCol: String): DataFrame = {
    // empty tokens (doubled spaces) guard: sequence(1, 0) would DESCEND
    val init = transform(TextOps.tokens(col(textCol)),
      w => when(length(w) >= 1,
        transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))))
        .otherwise(array().cast("array<string>")))
    val merged = merges.foldLeft(init: Column) { case (acc, (a, b)) =>
      transform(acc, s => applyMerge(s, a, b))
    }
    docs.withColumn(outCol, flatten(merged))
  }
}
