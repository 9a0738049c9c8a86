package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language-ID heuristic,
  * document fingerprinting. All pure Column expressions (codegen'd,
  * no UDFs) and every formula is mirrored 1:1 by a DuckDB oracle in
  * SparkEntry — hence the explicit double casts and the md5-based token
  * hash (md5 is the one hash both engines compute identically).
  */
object TextOps {

  /** Modulus for all token-hash arithmetic: 2^31-1 (Mersenne prime).
    * Keeps every product below 2^63 so Spark and DuckDB (which errors on
    * int64 overflow) agree.
    */
  val P: Long = 2147483647L

  /** Whitespace word tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** 32-bit token hash both engines can compute: first 8 hex chars of md5.
    * DuckDB mirror: ('0x' || substr(md5(t),1,8))::BIGINT
    */
  def tokenHash32(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  /** 60-bit token hash (15 hex chars) for simhash bit sampling. */
  def tokenHash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Distinct word n-gram shingles ("w1 w2 w3"). Empty when the doc has
    * fewer than n words.
    */
  def shingles(text: Column, n: Int): Column = array_distinct(rawNgrams(text, n))

  /** Raw (non-distinct) word n-gram occurrences — repetition analysis
    * needs the duplicates [[shingles]] drops.
    */
  def rawNgrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Intra-document repetition (a Gopher-rules quality signal): the
    * fraction of n-gram occurrences that are repeats of an earlier n-gram
    * in the same doc — `1 - distinct/total`, 0.0 for docs shorter than n
    * words. High values mark boilerplate/looping text a training pipeline
    * drops before dedup even sees it. Pure per-row codegen; no shuffle.
    */
  def ngramRepetition(text: Column, n: Int): Column = {
    val g = rawNgrams(text, n)
    when(size(g) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g).cast("double"))
  }

  /** Email pattern shared verbatim by Java regex and RE2 (no alternation,
    * no backreferences — identical match semantics in both engines).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** IPv4-ish dotted quad. */
  val Ipv4Re = "\\b([0-9]{1,3}\\.)[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Phone-like run: leading digit (optional +), >= 6 inner phone chars,
    * trailing digit. No dots, so IPv4s do not half-match.
    */
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII redaction (training-pipeline hygiene): mask emails, IPv4s, then
    * phone-like digit runs with typed placeholders. Order matters — emails
    * and IPs are consumed before the looser phone pattern can eat their
    * digits. Pure codegen `regexp_replace` chain; the same three patterns
    * run 1:1 in the DuckDB oracle (both engines replace ALL matches;
    * patterns avoid constructs where RE2 and Java regex semantics could
    * diverge).
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    regexp_replace(noIp, PhoneRe, "<PHONE>")
  }

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword count proxy: words + extra tokens for long words
    * (every 6 chars beyond the first 6 adds one), the usual ~chars/4 shape
    * without a vocab. Deterministic and oracle-mirrorable.
    */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + lit(1L) + floor(length(t).cast("double") / 6.0).cast("long"))

  /** Mean token length in chars (0.0 for empty docs). */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stop = array(Stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L),
        (acc, t) => acc + when(array_contains(stop, t), 1L).otherwise(0L))
        .cast("double") / size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: length target + non-stopword mass +
    * word-length target. The components mirror common pretraining-data
    * heuristics (length/punct/stopword ratios).
    */
  def qualityScore(text: Column): Column =
    round(
      least(tokenCount(text).cast("double") / 100.0, lit(1.0)) * 0.4 +
        (lit(1.0) - stopwordRatio(text)) * 0.3 +
        least(avgTokenLen(text) / 8.0, lit(1.0)) * 0.3,
      6)

  /** Marker vocabularies for the n-gram/stopword language-ID heuristic.
    * (The synthetic corpus is English-ish for every `lang` label; the
    * operator demonstrates the mechanism — per-language marker hit counts
    * with deterministic argmax.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("table", "window", "row", "batch"),
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("scan", "sort", "merge", "order"),
    "fr" -> Seq("join", "group", "filter", "query"),
    "zh" -> Seq("hash", "key", "vector", "data"))

  /** Per-language marker hit counts (distinct-token intersection sizes). */
  def langScores(text: Column): Seq[(String, Column)] = {
    val toksD = array_distinct(tokens(text))
    LangMarkers.map { case (lang, markers) =>
      lang -> size(array_intersect(toksD, array(markers.map(lit): _*)))
    }
  }

  /** Argmax language as an integer encoding `hits*8 + (rank+1)` (ranks are
    * alphabetical) — max hits, ties broken by the later language. A plain
    * `greatest` over small ints, so DuckDB mirrors it exactly.
    */
  def langIdEncoded(text: Column): Column =
    greatest(langScores(text).zipWithIndex.map { case ((_, s), i) =>
      s * 8 + (i + 1)
    }: _*)

  /** Predicted language label from the encoding. */
  def langPred(text: Column): Column =
    element_at(
      array(LangMarkers.map { case (l, _) => lit(l) }: _*),
      pmod(langIdEncoded(text), lit(8)))

  /** Winning hit count. */
  def langHits(text: Column): Column =
    greatest(langScores(text).map(_._2): _*).cast("long")

  /** Polynomial rolling-hash fingerprint over the token-hash stream:
    * fold(0, (acc, h) -> (acc*31 + h) % P). Order-sensitive, so
    * permutations fingerprint differently (unlike a bag-of-words hash).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), t => tokenHash32(t) % P),
      lit(0L),
      (acc, h) => (acc * 31L + h) % P)

  /** Token-window document chunking — the "split long documents into
    * max-token training sequences with overlap" pipeline step (every
    * context-bounded consumer needs it: embedding models, RAG indexing,
    * sequence packing). Chunk i covers tokens
    * [i·stride+1, i·stride+maxTokens] with stride = maxTokens − overlap;
    * a doc with ≤ maxTokens tokens yields exactly one chunk. Returns
    * (idCol, chunk_id, n_tokens, chunk_text).
    *
    * Scale design: a pure projection + posexplode — NO shuffle at all;
    * chunking composes with downstream repartitioning (e.g. SeqPack)
    * without adding an Exchange of its own. The token array binds once
    * per row (outer-transform trick, see [[dedupSpans]]), so cost is
    * O(tokens) per doc, not O(tokens·chunks).
    */
  def chunk(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens (got maxTokens=$maxTokens overlap=$overlap)")
    val stride = maxTokens - overlap
    val chunkList = element_at(
      transform(array(tokens(col(textCol))), ws => {
        val n = size(ws)
        // mirrored 1:1 by the oracle: 1 chunk when n <= maxTokens, else
        // ceil((n - maxTokens) / stride) + 1
        val nChunks = when(n <= maxTokens, lit(1)).otherwise(
          ceil((n - lit(maxTokens)).cast("double") / lit(stride.toDouble))
            .cast("int") + 1)
        transform(sequence(lit(0), nChunks - 1), i => struct(
          least(n - i * stride, lit(maxTokens)).cast("long").as("nt"),
          concat_ws(" ", slice(ws, i * stride + 1, lit(maxTokens))).as("t")))
      }),
      1)
    df.select(col(idCol), posexplode(chunkList))
      .toDF(idCol, "chunk_id", "__c")
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col("__c.nt").as("n_tokens"), col("__c.t").as("chunk_text"))
  }

  /** Span-level corpus dedup (the C4-style "remove duplicated spans across
    * documents" rule, adapted to span = `spanWords` consecutive words): a
    * span occurring anywhere else in the corpus survives ONLY at its
    * first occurrence (min doc id, then position); every document's text
    * is rebuilt from its surviving spans in order. Returns
    * `(idCol, textCol)` with the rewritten text ('' when nothing
    * survives) — callers join back for other columns.
    *
    * Scale design: the winner per distinct span is picked by
    * `groupBy(md5(span)).agg(min(struct(id, pos)))` — partial (map-side)
    * aggregation means ONLY (16-byte hash, id, pos) tuples ever cross the
    * winner shuffle, never span text. Winning positions are folded to a
    * per-doc keep-list (again just ids + int positions over the wire) and
    * joined back to the original rows, where each text is rebuilt from its
    * own span array in place — no exploded-span reassembly groupBy at all.
    * Net: corpus text crosses at most ONE Exchange (the keep-list join),
    * versus three under the previous row_number-window shape; spans
    * partition the word sequence, so rejoining kept spans with single
    * spaces reproduces the original text wherever nothing was removed.
    */
  /** Word-span array of a text column: consecutive `spanWords`-word
    * windows (last may be partial). The token array binds ONCE per row
    * as a lambda variable (outer transform over a one-element array):
    * slicing a captured tokens() expression inside the per-span lambda
    * would re-split the whole text for every span —
    * O(words^2/spanWords) per document.
    */
  private def spanListOf(textCol: String, spanWords: Int): Column =
    element_at(
      transform(array(tokens(col(textCol))), ws => {
        val nSpans = ceil(size(ws) / lit(spanWords.toDouble)).cast("int")
        transform(
          sequence(lit(0), greatest(nSpans - 1, lit(0))),
          i => concat_ws(" ", slice(ws, i * spanWords + 1, lit(spanWords))))
      }),
      1)

  def dedupSpans(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      spanWords: Int = 15): org.apache.spark.sql.DataFrame = {
    require(spanWords > 0, s"spanWords must be positive (got $spanWords)")
    val spanList = spanListOf(textCol, spanWords)
    val spans = df.select(col(idCol).as("__id"), posexplode(spanList))
      .toDF("__id", "__pos", "__span")
    // global first-occurrence per span: min(struct) orders by (id, pos)
    // lexicographically — identical winner to the old
    // row_number().over(partitionBy(hash).orderBy(id, pos)) === 1, but the
    // hash-keyed Exchange carries no text (partial agg collapses each
    // mapper's occurrences of a span to one candidate)
    val winners = spans
      .groupBy(md5(col("__span")).as("__h"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__w"))
      .select(col("__w.__id").as("__id"), col("__w.__pos").as("__pos"))
    // per-doc sorted keep-list: (id, array<int>) only
    val keepByDoc = winners
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(col("__pos"))).as("__keep"))
    // rebuild each doc from ITS OWN span array — a projection, not a
    // groupBy: the only Exchange touching text is this join, and a doc
    // with no surviving span is absent from keepByDoc -> ''
    df.select(col(idCol), spanList.as("__spans"))
      .join(keepByDoc, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(
          concat_ws(" ", transform(col("__keep"),
            p => element_at(col("__spans"), p + 1))),
          lit("")).as(textCol))
  }

  /** Exact-substring dedup (the ExactSubstr rule of Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better", adapted
    * to word granularity): any `windowWords`-word sequence occurring
    * more than once in the corpus survives only at its FIRST occurrence
    * (min doc id, then position); every other occurrence's tokens are
    * removed and the documents rebuilt from their surviving tokens.
    * Catches copied passages at ANY alignment — the case span-level
    * dedup ([[dedupSpans]]'s disjoint blocks) misses when the copy
    * shifts by a few words.
    *
    * Scale shape (the paper uses a suffix array; the distributed
    * re-expression is hash-grouped overlapping windows): the window
    * shuffle carries (16-byte hash, id, pos) — never text — with
    * map-side partial aggregation per hash; losing occurrences fold to
    * a per-doc position list (ints only), and each text rebuilds from
    * its own token array in one projection. Corpus text crosses exactly
    * ONE Exchange (the loser-list join), the dedupSpans bound.
    */
  def dedupSubstrings(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      windowWords: Int = 15): org.apache.spark.sql.DataFrame = {
    require(windowWords > 0, s"windowWords must be positive (got $windowWords)")
    val n = windowWords
    // overlapping n-word windows, 0-based start positions; none when the
    // doc is shorter than n words
    val winList = element_at(
      transform(array(tokens(col(textCol))), ws => {
        val nw = size(ws) - (n - 1)
        when(nw >= 1,
          transform(sequence(lit(1), greatest(nw, lit(1))),
            i => concat_ws(" ", slice(ws, i, lit(n)))))
          .otherwise(array().cast("array<string>"))
      }),
      1)
    val wins = df
      .select(col(idCol).as("__id"), posexplode(winList))
      .toDF("__id", "__pos", "__w")
      .select(col("__id"), col("__pos"), md5(col("__w")).as("__h"))
    val agg = wins.groupBy(col("__h")).agg(
      count(lit(1)).as("__c"),
      min(struct(col("__id"), col("__pos"))).as("__w0"))
    val losers = wins
      .join(agg.filter(col("__c") > 1).select(col("__h"), col("__w0")), Seq("__h"))
      .filter(!(col("__id") === col("__w0.__id") && col("__pos") === col("__w0.__pos")))
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(col("__pos"))).as("__ls"))
    // rebuild: token i survives unless inside any losing window [p, p+n)
    val rebuilt = element_at(
      transform(array(tokens(col(textCol))), ws =>
        transform(
          filter(sequence(lit(0), size(ws) - 1),
            i => !exists(coalesce(col("__ls"), array().cast("array<int>")),
              p => i >= p && i < p + n)),
          i => element_at(ws, i + 1))),
      1)
    df.join(losers, col(idCol) === col("__id"), "left")
      .select((df.columns.toIndexedSeq.filter(_ != textCol).map(col) :+
        concat_ws(" ", rebuilt).as(textCol)): _*)
  }

  /** RefinedWeb-style boilerplate removal: strip every span that occurs
    * in more than `minDocFreqRatio` of DOCUMENTS (nav bars, cookie
    * banners, subscribe prompts — high-document-frequency lines that
    * survive per-doc dedup because each doc has only one copy).
    *
    * Built on the exact sketch-then-verify shape
    * ([[graft.text.HeavyHitters]]): a Misra-Gries pass over per-doc
    * DISTINCT span hashes finds candidates with k-bounded state, the
    * ≤ k candidates get an exact document-frequency recount, and the
    * bounded boilerplate hash set (≤ k by construction) folds into a
    * pure per-row rebuild filter — corpus TEXT never crosses an
    * Exchange at all (the sketch moves k-bounded summaries, the recount
    * moves 16-byte hashes, the rewrite is a projection). Exactness is
    * guarded at run time: the sketch guarantees every span with
    * df > totalItems/(k+1) a slot, so the call fails loudly unless
    * minDocFreqRatio·nDocs ≥ totalItems/(k+1) (totalItems = Σ per-doc
    * distinct spans — checked from the sketch's own `seen`, two 1-row
    * driver reads, same bounded-action class as the cluster loop).
    */
  def removeBoilerplateSpans(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      spanWords: Int, minDocFreqRatio: Double,
      k: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(spanWords > 0, s"spanWords must be positive (got $spanWords)")
    require(minDocFreqRatio > 0.0 && minDocFreqRatio < 1.0,
      s"minDocFreqRatio must be in (0,1), got $minDocFreqRatio")
    val spanList = spanListOf(textCol, spanWords)
    val docSpans = df
      .select(col(idCol).as("__id"), explode(array_distinct(spanList)).as("__span"))
      .select(col("__id"), md5(col("__span")).as("__h"))
    val sk = docSpans
      .agg(graft.functions.mg_sketch(col("__h"), k).as("__s"))
      .select(col("__s.items").as("__items"), col("__s.seen").as("__seen"))
      .head()
    val totalItems = sk.getLong(1)
    val nDocs = df.count()
    require(minDocFreqRatio * nDocs >= totalItems.toDouble / (k + 1),
      s"k=$k too small for exact boilerplate detection: need " +
        s"ratio*nDocs (${minDocFreqRatio * nDocs}) >= totalItems/(k+1) " +
        s"(${totalItems.toDouble / (k + 1)}) — raise k or the ratio")
    val candidates = sk.getMap[String, Long](0).keys.toSeq
    // exact df recount of the <= k candidates; boilerplate set is bounded
    val boiler =
      if (candidates.isEmpty) Array.empty[String]
      else docSpans
        .filter(col("__h").isInCollection(candidates))
        .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
        .filter(col("__df").cast("double") > lit(minDocFreqRatio) * nDocs.toDouble)
        .select(col("__h")).collect().map(_.getString(0))
    // pure per-row rebuild: keep spans outside the bounded boilerplate set
    val kept =
      if (boiler.isEmpty) spanList
      else filter(spanList, s => !md5(s).isInCollection(boiler.toSeq))
    df.withColumn(textCol, concat_ws(" ", kept))
  }

  /** Content-defined chunking (the FastCDC/rsync idea on word tokens):
    * a chunk boundary falls AFTER token i whenever the hash of the
    * trailing `window`-token n-gram satisfies `h % mask == 0`, so
    * boundaries depend only on LOCAL content — inserting or deleting a
    * prefix re-synchronizes the chunking within `window` tokens, where
    * fixed-size chunking shifts every chunk (the property chunk-level
    * dedup at 100 TB needs; spec-pinned). Expected chunk length ≈ mask.
    *
    * Pure per-document projection — tokens never leave their row; the
    * output carries (id, chunk_idx, n_tok, chunk_hash) so downstream
    * dedup shuffles hashes + ids only. One row per chunk via posexplode.
    */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      mask: Int): DataFrame = {
    // STAGED projections, not one expression tree: higher-order lambdas
    // are CodegenFallback, and interpreted eval re-executes a repeated
    // subexpression PER LAMBDA ELEMENT — with split() inlined into the
    // boundary filter that's O(tokens²) string splits per doc (measured
    // pathological at the 1000× replica). Aliasing __toks/__bpos in
    // their own selects makes every later use a bound array reference,
    // and CollapseProject keeps non-cheap multi-referenced aliases
    // un-inlined.
    val tok = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    // candidate boundary positions (1-based, after token i), i in [window, n]
    val cand = when(col("__n") >= window, sequence(lit(window), col("__n")))
      .otherwise(array().cast("array<int>"))
    val bnd = tok.withColumn("__bpos",
      filter(cand, i =>
        pmod(tokenHash60(concat_ws(" ",
          slice(col("__toks"), i - (window - 1), lit(window)))), lit(mask)) === 0))
    // chunk j spans [starts(j), ends(j)]; a boundary at n yields an
    // empty trailing pair that the s <= e filter drops
    val spans = bnd
      .withColumn("__starts", concat(array(lit(1)), transform(col("__bpos"), b => b + 1)))
      .withColumn("__ends", concat(col("__bpos"), array(col("__n"))))
    spans
      .select(col(idCol), col("__toks"),
        posexplode(arrays_zip(col("__starts").as("s"), col("__ends").as("e")))
          .as(Seq("chunk_idx", "__se")))
      .filter(col("__se.s") <= col("__se.e"))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        (col("__se.e") - col("__se.s") + 1).cast("long").as("n_tok"),
        tokenHash60(concat_ws(" ",
          slice(col("__toks"), col("__se.s"), col("__se.e") - col("__se.s") + 1)))
          .as("chunk_hash"))
  }

  /** Chunks duplicated across documents: the chunk-level dup-mass report
    * (hash, distinct docs, occurrences). Shuffles (hash, id) pairs only.
    */
  def cdcDupChunks(chunks: DataFrame, idCol: String): DataFrame =
    chunks.groupBy(col("chunk_hash"))
      .agg(countDistinct(col(idCol)).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") > 1)

  /** Near-duplicate pairs by shared CDC chunks (the MinHash-free
    * resemblance join rsync/CDC storage dedup uses): two docs are
    * candidates when they share ≥ `minShared` distinct chunk hashes.
    *
    * The self-join is bounded the way the MinHash band join is: chunk
    * hashes whose document frequency exceeds `maxDf` are dropped first
    * (a chunk shared by thousands of docs is boilerplate, and its join
    * fan-out is df² — the equivalent of a stopword ban). The join
    * carries (hash, id) pairs only.
    */
  def cdcNearDupPairs(
      chunks: DataFrame,
      idCol: String,
      minShared: Int,
      maxDf: Int): DataFrame = {
    val docChunk = chunks.select(col(idCol), col("chunk_hash")).distinct()
    val rare = docChunk
      .groupBy(col("chunk_hash")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("chunk_hash"))
    // materialized ONCE before the self-join: the two sides are not
    // exchange-reused, so unmaterialized the chunking pass + distinct +
    // df-filter subtree executed twice per action. (hash, id) rows only.
    val bounded = docChunk.join(rare, "chunk_hash").localCheckpoint(true)
    val a = bounded.select(col("chunk_hash"), col(idCol).as("doc_a"))
    val b = bounded.select(col("chunk_hash"), col(idCol).as("doc_b"))
    a.join(b, Seq("chunk_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_chunks"))
      .filter(col("shared_chunks") >= minShared)
  }
}
