package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the document corpus: a BM25 inverted-index
  * analog plus reciprocal-rank fusion for hybrid (text + vector) search.
  *
  * The reference engine fuses multi-vector scores with per-field boosts
  * (search/gamma_engine.cc multi-vector merge; `boost` in the request
  * JSON) but has no lexical index — BM25/RRF are part of the
  * beyond-the-reference training-pipeline operator set (retrieval for
  * RAG-style data curation). Formulas are the published ones: Robertson
  * et al.'s BM25 and Cormack et al.'s reciprocal-rank fusion
  * (1/(k0+rank), k0=60).
  *
  * Scale design:
  *  - [[build]] runs ONE shuffle over the corpus (the (term, doc)
  *    aggregation — the inverted index). Term statistics derive from the
  *    postings with a second, vocabulary-sized aggregation. Both land as
  *    plain DataFrames a caller can persist/bucket by term.
  *  - [[bm25]] never shuffles the corpus at query time: query terms
  *    (tiny) broadcast into the term-stats scan, the weighted query
  *    terms (still tiny) broadcast into the postings scan, and the only
  *    data Exchange is the per-(query, doc) partial-aggregated score
  *    sum, followed by the k-bounded top-k heap.
  *  - Ubiquitous terms (df > maxDfRatio·N) are dropped from the term
  *    stats — the classic stopword guard that also kills the hot-term
  *    skew a 100 TB corpus would otherwise send through the score agg.
  *  - Per-term contributions are quantized to integer micro-units and
  *    summed EXACTLY (long arithmetic), so scores are independent of
  *    partitioning/evaluation order and mirror the DuckDB oracle
  *    bit-for-bit. (Verified: floor(ln(x)*1e6) agrees between Java and
  *    C libm across the full rational input range these formulas
  *    produce.)
  */
object TextIndex {

  /** A built lexical index: postings (__term, __doc, __dl, __tf),
    * UNFILTERED term stats (__term, __df), corpus doc count, total token
    * count (avgDl = dlSum/nDocs, exact in doubles since dlSum < 2^53) and
    * the df-ratio guard applied AT QUERY TIME — keeping the stats raw is
    * what makes [[appendDelta]] O(delta): a term pruned under one corpus
    * size can fall back under the cap as the corpus grows, which filtered
    * stats could not express without re-reading the postings.
    */
  case class BuiltIndex(
      postings: DataFrame, termStats: DataFrame, nDocs: Long, dlSum: Long,
      maxDfRatio: Double) {
    def avgDl: Double = dlSum.toDouble / nDocs
  }

  /** Postings list: one row per (term, doc) with the term frequency and
    * the doc's token length — the inverted-index payload.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs
      .select(col(idCol).as("__doc"), toks.as("__toks"))
      .select(col("__doc"), size(col("__toks")).as("__dl"),
        explode(col("__toks")).as("__term"))
      .groupBy(col("__term"), col("__doc"), col("__dl"))
      .agg(count(lit(1)).as("__tf"))
  }

  /** Build the index: postings + raw document-frequency stats + corpus
    * constants (one small stats job). Terms appearing in more than
    * `maxDfRatio` of documents are excluded AT QUERY TIME (and thus
    * contribute zero).
    */
  def build(
      docs: DataFrame, idCol: String, textCol: String,
      maxDfRatio: Double = 0.5, reliable: Boolean = false): BuiltIndex = {
    // TERM STATS are materialized once (vocabulary-sized pin): stats
    // derive from the postings, so a query plan referencing both (every
    // bm25/topKeywords call does) otherwise re-executed the corpus
    // tokenize+explode+aggregate subtree once per stats reference — the
    // subtrees are not exchange-reused. The POSTINGS themselves stay
    // lazy: a measured postings checkpoint (row-format block store of the
    // full inverted index) cost MORE than recomputing the cheap
    // tokenize+agg pass — bm25 gates regressed 2-3x — so only the small
    // frame is pinned and the big one is recomputed per reference.
    val post = postings(docs, idCol, textCol)
    val st = docs.agg(
      count(lit(1)).as("n"),
      sum(size(TextOps.tokens(col(textCol))).cast("long")).as("dlsum")).head()
    val n = st.getLong(0)
    val dlSum = if (st.isNullAt(1)) 0L else st.getLong(1)
    val stats = graft.core.Pin(
      post.groupBy(col("__term")).agg(count(lit(1)).as("__df")),
      reliable, "TextIndex.build")
    BuiltIndex(post, stats, n, dlSum, maxDfRatio)
  }

  /** Incremental maintenance — the BM25 analog of the ANN indexes'
    * O(delta) append refresh (reference R5/R7): extend a built index
    * with a batch of NEW documents (fresh ids; updates = delete+append
    * at the table layer). Postings gain the delta's postings; term
    * stats merge per term; corpus constants add. Nothing re-reads the
    * standing corpus — cost is one shuffle over the DELTA plus a
    * vocabulary-sized stats merge, and the df-ratio guard stays correct
    * because it re-evaluates against the NEW corpus size at query time.
    */
  def appendDelta(
      ix: BuiltIndex, docs: DataFrame, idCol: String,
      textCol: String): BuiltIndex = {
    val d = build(docs, idCol, textCol, ix.maxDfRatio)
    val merged = ix.termStats
      .join(d.termStats.withColumnRenamed("__df", "__df2"), Seq("__term"), "full_outer")
      .select(col("__term"),
        (coalesce(col("__df"), lit(0L)) + coalesce(col("__df2"), lit(0L))).as("__df"))
    BuiltIndex(ix.postings.unionByName(d.postings), merged,
      ix.nDocs + d.nDocs, ix.dlSum + d.dlSum, ix.maxDfRatio)
  }

  /** Delete maintenance — the tombstone shape the ANN indexes use
    * (reference R3/R4 analog): standing postings are NOT rewritten; the
    * deleted ids become an anti-join exclusion on the postings plan,
    * and the df stats / corpus constants correct by the DELETED docs'
    * own statistics, recomputed O(delta) from their text — nothing
    * re-reads the standing corpus. Callers pass the docs AS INDEXED
    * (the table layer keeps them until vacuum); a later compaction can
    * materialize the anti-joined postings to reclaim space.
    */
  def removeDocs(
      ix: BuiltIndex, docs: DataFrame, idCol: String,
      textCol: String): BuiltIndex = {
    val d = build(docs, idCol, textCol, ix.maxDfRatio)
    val delIds = docs.select(col(idCol).as("__doc")).distinct()
    val post = ix.postings.join(broadcast(delIds), Seq("__doc"), "left_anti")
    val stats = ix.termStats
      .join(d.termStats.withColumnRenamed("__df", "__dfDel"), Seq("__term"), "left")
      .select(col("__term"),
        (col("__df") - coalesce(col("__dfDel"), lit(0L))).as("__df"))
      .filter(col("__df") > 0)
    BuiltIndex(post, stats, ix.nDocs - d.nDocs, ix.dlSum - d.dlSum, ix.maxDfRatio)
  }

  /** BM25 top-k: returns (qid, id, score_micro) — `score_micro` is the
    * exact long sum of per-term floor(idf·tfNorm·1e6) contributions,
    * k rows per query, ties broken by ascending id.
    */
  def bm25(
      ix: BuiltIndex, queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qterms = queries.select(col(qidCol).as("__qid"),
      explode(array_distinct(TextOps.tokens(col(qtextCol)))).as("__term"))
    // idf on the (tiny) matched query-term set; parenthesization mirrors
    // the oracle SQL exactly: ln(1 + ((n - df) + 0.5) / (df + 0.5))
    val idf = log(
      lit(1.0) + ((lit(ix.nDocs) - col("__df")).cast("double") + lit(0.5)) /
        (col("__df").cast("double") + lit(0.5)))
    val dfCap = math.floor(ix.maxDfRatio * ix.nDocs).toLong
    val qWeighted = ix.termStats
      .filter(col("__df") <= dfCap)
      .join(broadcast(qterms), "__term")
      .select(col("__qid"), col("__term"), idf.as("__idf"))
    // tf normalizer: (tf·(k1+1)) / (tf + k1·((1-b) + (b·dl)/avgdl))
    val tfNorm = (col("__tf").cast("double") * lit(k1 + 1.0)) /
      (col("__tf").cast("double") +
        lit(k1) * (lit(1.0 - b) +
          (lit(b) * col("__dl").cast("double")) / lit(ix.avgDl)))
    val scored = ix.postings
      .join(broadcast(qWeighted), "__term")
      .select(col("__qid"), col("__doc"),
        floor((col("__idf") * tfNorm) * lit(1e6)).cast("long").as("__c"))
      .groupBy(col("__qid"), col("__doc"))
      .agg(sum(col("__c")).as("score_micro"))
      .toDF("qid", "id", "score_micro")
    graft.operators.TopK.perGroup(
      scored, "qid", "score_micro", ascending = false, k, Seq("id"))
  }

  /** Positional postings: one row per (term, doc, position) with 0-based
    * token positions — the payload a phrase/proximity index needs on top
    * of the tf postings [[postings]] carries.
    */
  def positionalPostings(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("__doc"), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("__doc"), posexplode(col("__toks")).as(Seq("__pos", "__term")))

  /** Rarest-term-seeded candidates shared by [[phraseSearch]] and
    * [[proximitySearch]]: one row per document that contains some
    * query's SEED term (its corpus-rarest token — any full match must
    * contain every query token, so the rarest is the cheapest complete
    * candidate generator). This is the positional-index analog of the
    * reference's shortest-posting-list-first range intersection
    * (table/field_range_index.cc:1066-1097): anchor on the smallest
    * list, verify the rest per document.
    *
    * Output: (__doc, __qs: array<(__qid, __qt)>, __tp: array<(__term,
    * __pos)>) — the doc's seeded queries plus its positions of the
    * UNION query vocabulary, for per-doc bounded verification.
    *
    * Scale shape (vs the anchor-vote algebra this replaced): the old
    * plan shuffled one vote row per (matched posting × query offset) —
    * Σ_q Σ_j df(t_qj) rows, unbounded in query count and term df
    * (measured 1.2B rows at 1000× on a stopword-dense vocabulary). Here
    * the corpus-sized work is ONE doc-keyed aggregation of matched
    * (term, pos) pairs — never multiplied per query — and the per-query
    * mass is Σ_q df(seed_q) skinny (qid, doc) pairs, the minimum any
    * complete candidate generator can emit. Query token lists ride a
    * broadcast; corpus text never moves.
    */
  private def seededCandidates(
      posts: DataFrame, qtoks: DataFrame): DataFrame = {
    val qterms = qtoks.select(
      col("__qid"), explode(array_distinct(col("__qt"))).as("__term"))
    val vocab = qterms.select(col("__term")).distinct()
    // rarity proxy: postings count per query-vocab term (partial agg
    // collapses map-side to ≤|vocab| rows per partition)
    val termCounts = posts.join(broadcast(vocab), "__term")
      .groupBy(col("__term")).agg(count(lit(1)).as("__tc"))
    // seed = the query's minimum-count term, ties by term; a term absent
    // from the corpus counts 0 — the cheapest possible seed (no match
    // can exist, and none is generated)
    val seedTerm = qterms
      .join(broadcast(termCounts), Seq("__term"), "left")
      .select(col("__qid"), col("__term"), coalesce(col("__tc"), lit(0L)).as("__tc"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__qid"))
          .orderBy(col("__tc").asc, col("__term").asc)))
      .filter(col("__rn") === 1)
      .select(col("__term"), col("__qid"))
    val seeds = posts.join(broadcast(seedTerm), "__term")
      .select(col("__qid"), col("__doc")).distinct()
    // per-doc positions of the union vocabulary: the ONE corpus-sized
    // Exchange, query-count-independent
    val docPos = posts.join(broadcast(vocab), "__term")
      .groupBy(col("__doc"))
      .agg(collect_list(struct(col("__term"), col("__pos"))).as("__tp"))
    // group seeded queries per doc so each doc's position array joins
    // ONCE no matter how many queries seed it
    seeds.join(broadcast(qtoks), "__qid")
      .groupBy(col("__doc"))
      .agg(collect_list(struct(col("__qid"), col("__qt"))).as("__qs"))
      .join(docPos, "__doc")
  }

  /** Per-doc term → sorted positions from a collected (__term, __pos)
    * array. */
  private def positionsByTerm(
      tp: Seq[org.apache.spark.sql.Row]): Map[String, Array[Int]] =
    tp.groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getInt(1)).toArray.sorted }

  /** Exact phrase search over positional postings: a doc matches once per
    * position where the query's tokens appear consecutively. Returns
    * (qid, id, n_occ) — the top `k` docs per query by occurrence count,
    * ties broken by ascending id.
    *
    * Candidates come from [[seededCandidates]] (rarest-term seeding);
    * verification is per-document bounded work: anchor on the phrase
    * offset whose term is rarest IN THE DOC, then check every other
    * offset against the doc's sorted position arrays (binary search) —
    * df(seed)·m log(dl) per candidate, independent of how common the
    * phrase's OTHER terms are. No m-way join, no per-offset vote rows.
    */
  def phraseSearch(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qphraseCol: String,
      k: Int, reliable: Boolean = false): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    // materialized ONCE: seededCandidates references the positional
    // postings three times (term counts, seeds, doc positions) in one
    // plan, and the subtrees are not exchange-reused — unmaterialized,
    // the corpus was tokenized+posexploded three times per action.
    // `reliable` = fault-tolerant checkpoint (graft.core.Pin contract).
    val posts = graft.core.Pin(
      positionalPostings(docs, idCol, textCol), reliable, "phraseSearch")
    val qtoks = queries.select(
      col(qidCol).as("__qid"), TextOps.tokens(col(qphraseCol)).as("__qt"))
    val cand = seededCandidates(posts, qtoks)
    val schema = StructType(Seq(
      qtoks.schema("__qid").copy(name = "qid"),
      cand.schema("__doc").copy(name = "id"),
      StructField("n_occ", LongType, nullable = false)))
    val matched = cand.mapPartitions { rows =>
      rows.flatMap { r =>
        val doc = r.get(0)
        val qs = r.getSeq[Row](1)
        val byTerm = positionsByTerm(r.getSeq[Row](2))
        qs.iterator.flatMap { q =>
          val qt = q.getSeq[String](1)
          val sets = qt.map(t => byTerm.getOrElse(t, null))
          if (qt.isEmpty || sets.contains(null)) None
          else {
            val jStar = sets.indices.minBy(sets(_).length)
            var n = 0L
            sets(jStar).foreach { p =>
              val a = p - jStar
              if (a >= 0 && qt.indices.forall(j => j == jStar ||
                  java.util.Arrays.binarySearch(sets(j), a + j) >= 0)) n += 1
            }
            if (n > 0) Some(Row(q.get(0), doc, n)) else None
          }
        }
      }
    }(Encoders.row(schema))
    graft.operators.TopK.perGroup(
      matched, "qid", "n_occ", ascending = false, k, Seq("id"))
  }

  /** Count window starts s ≥ 0 where [s, s+window) contains every one of
    * the m terms, given each term's sorted positions: per-term
    * valid-start intervals [max(0, p-window+1), p] merged, then an event
    * sweep counts starts covered by ALL m terms.
    */
  private def coveredStarts(
      perTerm: Iterator[Array[Int]], window: Int, m: Int): Long = {
    val events = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    perTerm.foreach { sorted =>
      var lo = math.max(0, sorted.head - (window - 1))
      var hi = sorted.head
      sorted.tail.foreach { p =>
        val l = math.max(0, p - (window - 1))
        if (l <= hi + 1) hi = p
        else { events += ((lo, 1)); events += ((hi + 1, -1)); lo = l; hi = p }
      }
      events += ((lo, 1)); events += ((hi + 1, -1))
    }
    val sortedEv = events.sortBy(e => (e._1, -e._2))
    var depth = 0; var covStart = 0; var count = 0L
    sortedEv.foreach { case (x, d) =>
      if (depth == m && d < 0) count += x - covStart
      depth += d
      if (depth == m) covStart = x
    }
    count
  }

  /** Proximity (sloppy-phrase) search: a doc scores once per window
    * start s where the span [s, s+window) contains EVERY distinct query
    * term. Returns (qid, id, n_windows), top `k` docs per query, ties by
    * ascending id.
    *
    * Candidates come from [[seededCandidates]] (rarest-term seeding —
    * valid because every covering window contains the seed term), then
    * the per-doc interval sweep [[coveredStarts]] runs over the doc's
    * sorted position arrays. An earlier (qid, doc)-keyed collect shape
    * paired every query with every doc containing ANY of its terms —
    * on a stopword-dense vocabulary that is the full query × corpus
    * cross product; seeding bounds it to Σ_q df(seed_q) candidates and
    * the big position arrays now cross one doc-keyed Exchange ONCE,
    * query-count-independent.
    */
  def proximitySearch(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      window: Int, k: Int, reliable: Boolean = false): DataFrame = {
    require(window >= 1, s"window must be >= 1 (got $window)")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    // materialized ONCE: seededCandidates references the positional
    // postings three times (term counts, seeds, doc positions) in one
    // plan, and the subtrees are not exchange-reused — unmaterialized,
    // the corpus was tokenized+posexploded three times per action.
    // `reliable` = fault-tolerant checkpoint (graft.core.Pin contract).
    val posts = graft.core.Pin(
      positionalPostings(docs, idCol, textCol), reliable, "proximitySearch")
    val qtoks = queries.select(col(qidCol).as("__qid"),
      array_distinct(TextOps.tokens(col(qtextCol))).as("__qt"))
    val cand = seededCandidates(posts, qtoks)
    val schema = StructType(Seq(
      qtoks.schema("__qid").copy(name = "qid"),
      cand.schema("__doc").copy(name = "id"),
      StructField("n_windows", LongType, nullable = false)))
    val matched = cand.mapPartitions { rows =>
      rows.flatMap { r =>
        val doc = r.get(0)
        val qs = r.getSeq[Row](1)
        val byTerm = positionsByTerm(r.getSeq[Row](2))
        qs.iterator.flatMap { q =>
          val qt = q.getSeq[String](1)
          val sets = qt.map(t => byTerm.getOrElse(t, null))
          if (qt.isEmpty || sets.contains(null)) None
          else {
            val count = coveredStarts(sets.iterator, window, qt.length)
            if (count > 0) Some(Row(q.get(0), doc, count)) else None
          }
        }
      }
    }(Encoders.row(schema))
    graft.operators.TopK.perGroup(
      matched, "qid", "n_windows", ascending = false, k, Seq("id"))
  }

  /** Per-document TF-IDF keyword extraction: the top `k` terms of every
    * document by tf·idf (idf = ln(N/df), micro-unit quantized), ties by
    * ascending term — topic tagging / per-doc vocabulary summarization.
    * The vocabulary-sized idf table broadcasts into the postings scan.
    *
    * Per-doc selection is VOLUME-AWARE (TopK.perGroupAuto, r10): the
    * candidate row count is exact from the vocabulary stats (Σ df over
    * df-capped terms — one vocab-sized agg), groups = nDocs. In the
    * wide-groups regime this picks the SORT shape (1000x A/B: 116M
    * scored postings, 5M docs — sorted 9.2 s vs heap 15.3 s,
    * identical rows; ObjectHashAggregate falls back to sort-based
    * there and pays per-group object churn on top of the same
    * external sort), while a candidate set more than ~8x larger than
    * groups*k falls back to the heap shape whose group-clustered
    * map-side partials bound the shuffle to ~groups*k rows — the
    * volume that dominates once shuffle is network, not memcpy.
    * Returns (id, term, score_micro).
    */
  def topKeywords(ix: BuiltIndex, k: Int): DataFrame = {
    val dfCap = math.floor(ix.maxDfRatio * ix.nDocs).toLong
    val idf = floor(log(lit(ix.nDocs.toDouble) / col("__df").cast("double")) *
      lit(1e6)).cast("long")
    val kept = ix.termStats.filter(col("__df") <= dfCap)
    // exact candidate volume from the (vocab-sized) stats table: each
    // kept term contributes exactly df postings to the scored join
    val estRows = kept.agg(sum(col("__df"))).head().getLong(0)
    val w = kept.select(col("__term"), idf.as("__idf"))
    val scored = ix.postings
      .join(broadcast(w), "__term")
      .select(col("__doc").as("id"), col("__term").as("term"),
        (col("__tf") * col("__idf")).as("score_micro"))
    graft.operators.TopK.perGroupAuto(
      scored, "id", "score_micro", ascending = false, k, Seq("term"),
      estGroups = ix.nDocs, estRows = estRows)
  }

  /** Attach a dense 1-based rank to a per-query hit list (qid, id,
    * score): rank 1 = best. The window runs over k-bounded lists (the
    * output of a top-k), so the per-qid sort is bounded and cheap.
    */
  def rankHits(
      hits: DataFrame, qidCol: String, idCol: String, scoreCol: String,
      ascending: Boolean): DataFrame = {
    val ord =
      if (ascending) Seq(col(scoreCol).asc, col(idCol).asc)
      else Seq(col(scoreCol).desc, col(idCol).asc)
    hits.select(col(qidCol).as("qid"), col(idCol).as("id"),
      row_number().over(
        Window.partitionBy(col(qidCol)).orderBy(ord: _*)).as("rank"))
  }

  /** Reciprocal-rank fusion of two ranked lists (qid, id, rank):
    * rrf_micro = Σ floor(1e9 / (k0 + rank)) over the lists the item
    * appears in — pure integer arithmetic, so fusion is deterministic
    * under any evaluation order. Returns the top `k` per query,
    * ties broken by ascending id.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, k0: Int = 60): DataFrame = {
    def contrib(r: Column): Column = coalesce(
      floor(lit(1e9) / (lit(k0.toDouble) + r.cast("double"))).cast("long"),
      lit(0L))
    val fused = a.select(col("qid"), col("id"), col("rank").as("__ra"))
      .join(b.select(col("qid"), col("id"), col("rank").as("__rb")),
        Seq("qid", "id"), "full_outer")
      .select(col("qid"), col("id"),
        (contrib(col("__ra")) + contrib(col("__rb"))).as("rrf_micro"))
    graft.operators.TopK.perGroup(
      fused, "qid", "rrf_micro", ascending = false, k, Seq("id"))
  }

  /** One field of a BM25F index: its text column, saturation weight and
    * per-field length-normalization strength.
    */
  case class FieldSpec(textCol: String, weight: Double, b: Double) {
    require(b >= 0.0 && b < 1.0, s"field b must be in [0,1) (got $b)")
  }

  /** A built BM25F index: per-(term, doc) field-pivoted postings
    * (__term, __doc, __tf0/__dl0, __tf1/__dl1, ...), doc-level term
    * stats, corpus count and per-field average lengths.
    */
  case class BuiltIndexF(
      postings: DataFrame, termStats: DataFrame, nDocs: Long,
      avgDls: Seq[Double], maxDfRatio: Double, fields: Seq[FieldSpec])

  /** Build a BM25F (field-weighted) index — title/body retrieval where
    * a title hit should outrank the same hit buried in the body
    * (Robertson & Zaragoza's BM25F: per-field weighted, per-field
    * length-normalized term frequencies combined BEFORE the k1
    * saturation, doc-level idf).
    *
    * Scale shape: ONE corpus pass explodes (field, token) pairs for all
    * fields together; the (term, doc, field) aggregation pivots to
    * fixed per-field columns (conditional aggs — exact longs, and a
    * FIXED field-summation order at query time so the double tf-tilde
    * is deterministic and oracle-mirrorable, never a float `sum()`
    * whose addition order floats with partitioning). Doc-level df
    * derives from the pivoted (term, doc) rows; stats stay RAW with the
    * df-ratio guard applied at query time, as in [[build]].
    */
  def buildF(
      docs: DataFrame, idCol: String, fields: Seq[FieldSpec],
      maxDfRatio: Double = 0.5, reliable: Boolean = false): BuiltIndexF = {
    require(fields.nonEmpty, "need at least one field")
    val fieldToks = array(fields.zipWithIndex.map { case (f, i) =>
      struct(lit(i).as("f"), TextOps.tokens(col(f.textCol)).as("ts"))
    }: _*)
    val rows = docs
      .select(col(idCol).as("__doc"), explode(fieldToks).as("__ft"))
      .select(col("__doc"), col("__ft.f").as("__fld"),
        size(col("__ft.ts")).as("__dl"), explode(col("__ft.ts")).as("__term"))
    val perField = rows
      .groupBy(col("__term"), col("__doc"), col("__fld"), col("__dl"))
      .agg(count(lit(1)).as("__tf"))
    val aggs = fields.indices.flatMap { i => Seq(
      max(when(col("__fld") === i, col("__tf"))).as(s"__tf$i"),
      max(when(col("__fld") === i, col("__dl"))).as(s"__dl$i"))
    }
    // same shape as [[build]]: the vocabulary-sized stats are pinned, the
    // big pivoted postings stay lazy (a postings checkpoint measured
    // slower than recomputing the pivot pass)
    val pivoted = perField.groupBy(col("__term"), col("__doc"))
      .agg(aggs.head, aggs.tail: _*)
    val stats = graft.core.Pin(
      pivoted.groupBy(col("__term")).agg(count(lit(1)).as("__df")),
      reliable, "TextIndex.buildF")
    val st = docs.agg(count(lit(1)).as("n"),
      fields.zipWithIndex.map { case (f, i) =>
        sum(size(TextOps.tokens(col(f.textCol))).cast("long")).as(s"__s$i")
      }: _*).head()
    val n = st.getLong(0)
    val avgDls = fields.indices.map { i =>
      (if (st.isNullAt(i + 1)) 0L else st.getLong(i + 1)).toDouble / n
    }
    BuiltIndexF(pivoted, stats, n, avgDls, maxDfRatio, fields)
  }

  /** BM25F top-k: (qid, id, score_micro) with score_micro the exact long
    * sum of per-term floor(idf · tfTilde/(k1+tfTilde) · 1e6)
    * contributions; tfTilde combines the fields in declaration order
    * with each field's weight and length normalization. Same query-time
    * shape as [[bm25]]: nothing corpus-sized shuffles — broadcasts +
    * one partial-aggregated (query, doc) score sum + the k-bounded heap.
    */
  def bm25f(
      ix: BuiltIndexF, queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, k1: Double = 1.2): DataFrame = {
    val qterms = queries.select(col(qidCol).as("__qid"),
      explode(array_distinct(TextOps.tokens(col(qtextCol)))).as("__term"))
    val idf = log(
      lit(1.0) + ((lit(ix.nDocs) - col("__df")).cast("double") + lit(0.5)) /
        (col("__df").cast("double") + lit(0.5)))
    val dfCap = math.floor(ix.maxDfRatio * ix.nDocs).toLong
    val qWeighted = ix.termStats
      .filter(col("__df") <= dfCap)
      .join(broadcast(qterms), "__term")
      .select(col("__qid"), col("__term"), idf.as("__idf"))
    // fixed-order field combination; absent-field tf coalesces to 0 (its
    // denominator then does not matter but stays finite since b < 1)
    val tfTilde = ix.fields.zipWithIndex.map { case (f, i) =>
      (coalesce(col(s"__tf$i").cast("double"), lit(0.0)) * lit(f.weight)) /
        (lit(1.0 - f.b) +
          (lit(f.b) * coalesce(col(s"__dl$i").cast("double"), lit(0.0))) /
            lit(ix.avgDls(i)))
    }.reduce(_ + _)
    val scored = ix.postings
      .join(broadcast(qWeighted), "__term")
      .select(col("__qid"), col("__doc"),
        floor((col("__idf") * (tfTilde / (lit(k1) + tfTilde))) * lit(1e6))
          .cast("long").as("__c"))
      .groupBy(col("__qid"), col("__doc"))
      .agg(sum(col("__c")).as("score_micro"))
      .toDF("qid", "id", "score_micro")
    graft.operators.TopK.perGroup(
      scored, "qid", "score_micro", ascending = false, k, Seq("id"))
  }
}
