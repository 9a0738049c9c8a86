package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design notes (the whole point of these ops is the 100 TB case):
  *  - exact dedup is a hash-groupBy — one shuffle on a 16-byte digest, not
  *    on the document text;
  *  - MinHash/SimHash candidate generation shuffles (id, band-key) pairs —
  *    constant size per doc — and only candidate PAIRS (not all O(n^2)
  *    combinations) are verified;
  *  - every hash is md5-derived so the DuckDB oracle reproduces results
  *    bit-for-bit; modular arithmetic stays under 2^63 (see TextOps.P).
  */
object Dedup {

  import TextOps.P

  // ------------------------------------------------------------- exact (E1)

  /** Exact duplicate groups by content digest: keeper = min id per digest.
    * Returns (digest, keeper, dups) for groups of size >= minGroup.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String, minGroup: Int = 2): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("dups"))
      .filter(col("dups") >= minGroup)

  /** Exact-dedup projection: keep one row per distinct content. */
  def dropExactDups(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = df.groupBy(md5(col(textCol)).as("__digest")).agg(min(col(idCol)).as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // -------------------------------------------------------- MinHash + LSH

  /** MinHash signatures (H hashes) over distinct word n-gram shingles:
    * h_i(x) = ((37i+101)(x mod P) + (91i+17)) mod P over 32-bit token
    * hashes — a standard universal-hash family with literal coefficients so
    * the oracle can mirror it. Computed by the [[ShingleHash]] partition
    * kernel (the equivalent 16-way expression tree stalls janino).
    */
  private[graft] def withMinhashSignature(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleN: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val in = df.select(col(idCol).as("id"), col(textCol).as("__text"))
    val schema = StructType(Seq(
      in.schema("id"),
      StructField("sig", ArrayType(LongType, containsNull = false))))
    in.mapPartitions { rows =>
      rows.map { r =>
        Row(r.get(0), ShingleHash.minhashSignature(r.getString(1), numHashes, shingleN).toSeq)
      }
    }(Encoders.row(schema))
  }

  /** LSH banding: candidate pairs sharing at least one of `bands` bands of
    * the signature (rows-per-band = numHashes/bands). Output
    * (a, b) with a < b, distinct.
    */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, shingleN: Int = 3): DataFrame = {
    // NOT pinned (r15, reverting an r14 localCheckpoint): the self-join
    // sides do re-run the signature kernel twice, but the paired in-suite
    // benches showed the pin (eager store + ExistingRDD stats loss in the
    // downstream join) costing more than the recompute
    // (q_dedup_clusters 1.80->3.65 s in the r14 pair).
    val banded = bandKeys(df, idCol, textCol, numHashes, bands, shingleN)
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
  }

  /** LSH band keys (id, band, key) — the equi-join key space shared by
    * within-corpus and cross-corpus candidate generation.
    */
  private def bandKeys(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleN: Int): DataFrame = {
    val r = numHashes / bands
    val sig = withMinhashSignature(df, idCol, textCol, numHashes, shingleN)
    sig.select(col("id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            array_join(transform(slice(col("sig"), b * r + 1, r),
              x => x.cast("string")), "_").as("key"))
        }: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
  }

  /** Cross-corpus near-dup detection: MinHash-LSH candidates BETWEEN two
    * corpora (never within either), verified by exact Jaccard at
    * `threshold` — the "dedup the new crawl against the standing corpus /
    * the previous training set" step. Returns (a, b, jaccard) with `a`
    * from `newDf` and `b` from `refDf`.
    *
    * Scale shape: identical to [[minhashPairs]] — band-key equi-joins
    * (no all-pairs), shingle sets materialized per doc before the pair
    * join, partition-kernel Jaccard — and strictly cheaper than
    * unioning the corpora and filtering the pair side, because
    * within-corpus collisions (the reference corpus's own dup mass)
    * never become join rows at all.
    */
  def crossMinhashPairs(
      newDf: DataFrame, refDf: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 16, bands: Int = 4,
      shingleN: Int = 3): DataFrame = {
    val bn = bandKeys(newDf, idCol, textCol, numHashes, bands, shingleN)
    val br = bandKeys(refDf, idCol, textCol, numHashes, bands, shingleN)
    val cands = bn.as("x").join(br.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val ta = withShingles(newDf, idCol, textCol, shingleN)
    val tb = withShingles(refDf, idCol, textCol, shingleN)
    val pairs = cands
      .join(ta.select(col("id").as("a"), col("toks").as("ta")), Seq("a"))
      .join(tb.select(col("id").as("b"), col("toks").as("tb")), Seq("b"))
    pairJaccard(pairs, threshold)
  }

  /** Sorted hashed-shingle sets via the partition kernel. Materializing
    * BEFORE any self-join matters: as a Column expression, Catalyst may
    * collapse the shingle projection into the join output and recompute
    * md5-shingling per PAIR instead of per doc. Hashing to 32-bit ids also
    * shrinks the pair-join payload ~6x; Jaccard over the hashed sets equals
    * string-set Jaccard up to md5-prefix collisions, which are identical in
    * the DuckDB oracle (same hash).
    */
  private[graft] def withShingles(
      df: DataFrame, idCol: String, textCol: String, shingleN: Int,
      hashChars: Int = 8, distinctGrams: Boolean = true): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    // repartition: a small parquet file arrives as ONE partition, which
    // would serialize the downstream pair join into a single task
    val in = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val schema = StructType(Seq(
      in.schema("id"), StructField("toks", ArrayType(LongType, containsNull = false))))
    in.mapPartitions { rows =>
      rows.map { r =>
        val hs =
          if (distinctGrams) ShingleHash.hashedShingles(r.getString(1), shingleN, hashChars)
          else ShingleHash.slidingHashes(r.getString(1), shingleN, hashChars)
        Row(r.get(0), hs.toSeq)
      }
    }(Encoders.row(schema))
  }

  /** Cheap shape assert on a caller-provided `sharedToks` frame (r14
    * advice #2): the semantic contract (same shingleN/hashChars/
    * distinctGrams as the callee's internal [[withShingles]], already
    * materialized) cannot be checked from the frame, but the (id, toks:
    * array<long>) shape can — a caller passing some other frame fails
    * fast here instead of silently skewing Jaccard verification.
    */
  private def requireToksShape(df: DataFrame, who: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val ok = df.columns.sameElements(Array("id", "toks")) &&
      (df.schema("toks").dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      })
    require(ok, s"$who(sharedToks): expected a withShingles frame " +
      s"(id, toks: array<bigint>), got ${df.schema.simpleString}")
    df
  }

  /** Pairwise Jaccard over joined sorted-shingle rows, as a partition
    * kernel: `array_intersect`/`array_union` fall out of codegen here and
    * build a hash set PER PAIR (milliseconds each); the sorted linear merge
    * is ~100 comparisons.
    */
  private[graft] def pairJaccard(pairs: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val in = pairs.select(col("a"), col("b"), col("ta"), col("tb"))
    val schema = StructType(Seq(
      in.schema("a"), in.schema("b"), StructField("jaccard", DoubleType, nullable = false)))
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val j = ShingleHash.jaccardSortedLong(r.getSeq[Long](2), r.getSeq[Long](3))
        // BigDecimal HALF_UP == Spark round() == DuckDB round() for x >= 0
        if (j >= threshold) Some(Row(r.get(0), r.get(1),
          BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        else None
      }
    }(Encoders.row(schema))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates -> exact Jaccard
    * verification at `threshold`. Returns (a, b, jaccard).
    */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 16, bands: Int = 4,
      shingleN: Int = 3, sharedToks: Option[DataFrame] = None,
      reliable: Boolean = false): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, numHashes, bands, shingleN)
    // `sharedToks`: a MATERIALIZED (id, toks) frame from [[withShingles]]
    // at the same shingleN — lets a gate running several arms over the
    // same corpus (LSH + exact adjudication) pay the shingle pass once.
    // Unshared, the frame is checkpointed HERE: it feeds both verify-join
    // sides and the two subtrees are not exchange-reused (plan-verified),
    // so the corpus was re-shingled twice per action. `reliable` switches
    // to a fault-tolerant checkpoint (graft.core.Pin contract).
    val toks = sharedToks.map(requireToksShape(_, "minhashPairs"))
      .getOrElse(graft.core.Pin(
        withShingles(df, idCol, textCol, shingleN), reliable, "minhashPairs"))
    val pairs = cands
      .join(toks.select(col("id").as("a"), col("toks").as("ta")), Seq("a"))
      .join(toks.select(col("id").as("b"), col("toks").as("tb")), Seq("b"))
    pairJaccard(pairs, threshold)
  }

  // --------------------------------------------------------------- SimHash

  /** 60-bit SimHash over distinct word n-gram shingles: bit j is set when
    * the sum over shingles of ±1 (by bit j of the 60-bit token hash) is
    * positive. Computed by the [[ShingleHash]] partition kernel.
    */
  private def withSimhash(
      df: DataFrame, idCol: String, textCol: String, shingleN: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val in = df.select(col(idCol).as("id"), col(textCol).as("__text"))
    val schema = StructType(Seq(in.schema("id"), StructField("sh", LongType, nullable = false)))
    in.mapPartitions { rows =>
      rows.map(r => Row(r.get(0), ShingleHash.simhash(r.getString(1), shingleN)))
    }(Encoders.row(schema))
  }

  /** SimHash near-dup pairs: candidates share one of 4 15-bit blocks
    * (standard simhash blocking — a pair within hamming distance r<=3 of 60
    * bits must agree on at least one of 4 blocks), verified by
    * bit_count(xor) <= maxHamming. Returns (a, b, hdist). Routed through
    * [[hammingPairs]] since r14, so identical texts (identical simhash)
    * collapse to one node before the blocked join.
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, shingleN: Int = 3): DataFrame =
    hammingPairs(withSimhash(df, idCol, textCol, shingleN), "id", "sh",
      bits = 60, blocks = 4, maxHamming = maxHamming)

  /** Blocked Hamming candidate pairs over DISTINCT fingerprints: one node
    * per distinct hash value (representative id = MIN member id), the
    * standard pigeonhole blocking over `blocks` contiguous
    * `bits/blocks`-wide blocks, popcount-verified. Returns
    * (sha, shb, ra, rb, hdist) with ra < rb and 1 <= hdist <= maxHamming.
    *
    * Input: a pre-shaped (id, sh) frame. Callers should localCheckpoint it
    * if its lineage is expensive (decode, shingling) — it is referenced
    * once here but usually again for member expansion.
    *
    * This collapse is what keeps real corpora safe: identical fingerprints
    * (solid images all aHash to 0x0/0xFF.., exact dups are everywhere on
    * the web) otherwise pile into one (block, key) bucket and the join
    * goes quadratic IN THE HOT BUCKET. Over distinct hashes the bucket
    * holds at most one row per distinct value — the same
    * collapse-before-pairing principle gamma applies to multi-vid docs
    * before ranking (vector/vector_manager.cc:396-417).
    */
  private[graft] def fingerprintPairs(
      sigs: DataFrame, bits: Int, blocks: Int, maxHamming: Int): DataFrame = {
    require(bits > 0 && bits <= 64 && blocks > 0 && bits % blocks == 0,
      s"fingerprintPairs: need bits % blocks == 0 within 64, got $bits/$blocks")
    val w = bits / blocks
    val mask = if (w == 64) -1L else (1L << w) - 1
    // NOT checkpointed (measured, r14 opt round): pinning the collapse
    // groupBy cost 1.5-2.5x at sf0.1 — the checkpointed frame loses its
    // logical statistics (ExistingRDD), which defeats broadcast planning
    // in the blocked join downstream, and the extra materialization action
    // outweighs re-running one shuffle over the already-checkpointed sigs.
    val reps = sigs.groupBy(col("sh")).agg(min(col("id")).as("rid"))
    val blocked = reps.select(col("rid"), col("sh"),
        explode(array((0 until blocks).map { b =>
          struct(lit(b).as("blk"),
            shiftrightunsigned(col("sh"), b * w).bitwiseAND(mask).as("key"))
        }: _*)).as("bk"))
      .select(col("rid"), col("sh"), col("bk.blk"), col("bk.key"))
    blocked.as("x").join(blocked.as("y"),
        col("x.blk") === col("y.blk") && col("x.key") === col("y.key") &&
          col("x.rid") < col("y.rid"))
      .select(col("x.sh").as("sha"), col("y.sh").as("shb"),
        col("x.rid").as("ra"), col("y.rid").as("rb"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hdist"))
      .distinct()
      .filter(col("hdist") <= maxHamming)
  }

  /** Generic blocked Hamming near-dup pairs over a PRE-COMPUTED integer
    * fingerprint column — the fingerprint pluggable (media aHash64, audio
    * energy hash, any 64-bit sketch): candidates share one of `blocks`
    * contiguous `bits/blocks`-wide blocks of the hash (pigeonhole: a pair
    * within hamming distance < blocks agrees on at least one block — those
    * are found with CERTAINTY; pairs at blocks..maxHamming are
    * best-effort), verified by bit_count(xor) <= maxHamming.
    * Returns (a, b, hdist), a < b.
    *
    * Scale (r14 shape): identical fingerprints collapse to ONE node before
    * the blocked join ([[fingerprintPairs]]) — the join is over distinct
    * hashes, so a mass of identical images/docs costs one bucket row, not
    * a quadratic hot bucket. Member expansion happens after verification:
    * cross-group pairs via two equi-joins on the hash, same-hash pairs
    * (hdist 0) via an exact-key self-join whose output IS the answer —
    * this id-level pair surface is inherently quadratic in group size, so
    * on dup-heavy corpora prefer [[hammingClusters]], whose output stays
    * linear in ids. Unsigned shifts so a full-width (sign-bit-bearing)
    * 64-bit hash blocks correctly.
    */
  def hammingPairs(
      df: DataFrame, idCol: String, hashCol: String,
      bits: Int = 64, blocks: Int = 4, maxHamming: Int = 3): DataFrame = {
    // materialize once: the (id, sh) frame feeds the collapse, both
    // expansion joins and the same-hash self-join — unmaterialized, an
    // expensive upstream (image decode) would re-run per plan reference.
    // Not unpersisted here (the returned frame is lazy and still needs
    // it); ContextCleaner reclaims the checkpoint once callers drop the
    // frame — unpersist explicitly for deterministic release
    val sigs = df.select(col(idCol).as("id"), col(hashCol).cast("long").as("sh"))
      .localCheckpoint(true)
    val fp = fingerprintPairs(sigs, bits, blocks, maxHamming)
    val cross = fp
      .join(sigs.as("ma"), col("ma.sh") === col("sha"))
      .join(sigs.as("mb"), col("mb.sh") === col("shb"))
      .select(least(col("ma.id"), col("mb.id")).as("a"),
        greatest(col("ma.id"), col("mb.id")).as("b"), col("hdist"))
    val within = sigs.as("x").join(sigs.as("y"),
        col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hdist"))
    cross.unionByName(within)
  }

  /** Blocked-Hamming duplicate CLUSTERS without ever materializing
    * id-level pairs: the dup-heavy scale path. Nodes are DISTINCT
    * fingerprints; edges from [[fingerprintPairs]]; components via
    * [[duplicateClusters]] over representative ids; then every member id
    * inherits its fingerprint's component label. A multi-member
    * fingerprint with no cross-hash edges still forms its own cluster
    * (its members are exact dups of each other — label = representative).
    *
    * Output contract identical to duplicateClusters(hammingPairs(...)):
    * (id, cluster) where cluster is the MINIMUM member id of the
    * component — min member per hash = rep, min rep over the hash
    * component = min id overall — but the work and output are linear in
    * ids + distinct-hash pairs, never in per-group pair counts.
    */
  def hammingClusters(
      df: DataFrame, idCol: String, hashCol: String,
      bits: Int = 64, blocks: Int = 4, maxHamming: Int = 3,
      maxDriverEdges: Long = DriverUnionFindMaxEdges): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), col(hashCol).cast("long").as("sh"))
      .localCheckpoint(true)
    val groups = sigs.groupBy(col("sh"))
      .agg(min(col("id")).as("rid"), count(lit(1)).as("cnt"))
    val fp = fingerprintPairs(sigs, bits, blocks, maxHamming)
    val repClusters = duplicateClusters(fp, "ra", "rb", maxDriverEdges)
      .withColumnRenamed("id", "grid")
    val labeled = groups.join(repClusters, col("rid") === col("grid"), "left")
      .filter(col("grid").isNotNull || col("cnt") > 1)
      .select(col("sh"), coalesce(col("cluster"), col("rid")).as("cluster"))
    sigs.join(labeled, Seq("sh")).select(col("id"), col("cluster"))
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard pairs at `threshold` via AllPairs prefix
    * filtering (Bayardo et al., WWW'07): with token sets sorted in a global
    * order, J(x,y) >= t implies overlap >= ceil(t*|x|), so the smallest
    * COMMON token sits within the first |x| - ceil(t*|x|) + 1 tokens of x
    * (and symmetrically of y). Candidates therefore come from an EQUI-join
    * on prefix tokens — no false negatives, identical results to the brute
    * pair join the oracle computes.
    *
    * Scale design: the O(n^2) theta-join (which also ships both token
    * arrays through every pair) becomes |docs| x prefix exploded rows,
    * shuffled by token; only verified candidates rejoin the full arrays.
    * `blockCol` (e.g. lang) additionally scopes candidates per block.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3,
      blockCol: Option[String] = None,
      reliable: Boolean = false,
      sharedToks: Option[DataFrame] = None): DataFrame = {
    // materialize the shingle pass ONCE: it feeds 4 plan references
    // (prefix explode + both verify-join sides), and the executed plan
    // does NOT reuse the exchange across them (plan-asserted in PlanSpec)
    // — unmaterialized, the corpus would be re-shingled per reference.
    // `reliable=true` checkpoints to fault-tolerant storage (same executor-
    // loss rationale as SeqPack/CorpusSelect: localCheckpoint blocks die
    // with their executor); the local variant stays the local-mode default
    if (reliable) require(
      df.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "ngramJaccardPairs(reliable=true) needs sparkContext.setCheckpointDir")
    // `sharedToks` contract: ALREADY materialized (checkpointed) by the
    // caller — the multi-reference hazard the comment above describes is
    // the caller's to have closed. Shape-asserted (r14 advice #2).
    val toks = sharedToks.map(requireToksShape(_, "ngramJaccardPairs"))
      .getOrElse {
        val toks0 = withShingles(df, idCol, textCol, shingleN)
        if (reliable) toks0.checkpoint(eager = true)
        else toks0.localCheckpoint(true)
      }
    // AllPairs prefix under the DOCUMENT-FREQUENCY global order (Bayardo,
    // Ma & Srikant, WWW'07 §3): the prefix-filter lemma — J(x,y) ≥ t ⇒
    // the prefixes share a token — holds for ANY fixed total order over
    // tokens, and df-ascending puts the RAREST shingles in the prefix, so
    // the candidate equi-join fans out on rare-token collisions instead
    // of corpus-common ones. Hash order (the pre-r11 shape) is the
    // worst case on a realistic Zipf vocabulary: a 5M-doc Zipf corpus
    // spilled >40 GB of candidate shuffle under hash order. The VERIFY
    // arrays (`toks`, sorted by hash — jaccardSortedLong's merge
    // contract) are unchanged; only prefix SELECTION re-orders, and ties
    // in df break by token hash so the prefix stays deterministic.
    // Cost: one extra linear groupBy (token dfs) + one per-doc bounded
    // window sort — both O(corpus tokens), no new pair-shaped shuffle.
    val prefLen = greatest(lit(1),
      (size(col("toks")) - ceil(size(col("toks")) * threshold) + 1).cast("int"))
    val ex = toks.select(col("id"), explode(col("toks")).as("tok"))
    val tokDf = ex.groupBy(col("tok")).agg(count(lit(1)).as("__df"))
    val prefBase = ex.join(tokDf, Seq("tok"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("__df").asc, col("tok").asc)))
      .join(toks.select(col("id"),
        prefLen.as("__plen")), Seq("id"))
      .filter(col("__rn") <= col("__plen"))
      .select(col("id"), col("tok"))
    // NOT pinned (r15, reverting an r14 localCheckpoint): the self-join
    // does re-run the df-stats groupBy + window twice, but the paired
    // in-suite benches showed the pin costing ~1.8x more than the
    // recompute (q_ngram_jaccard 3.15->5.38 s in the r14 pair; driver
    // PERF agreed at 0.56x).
    val pref = blockCol match {
      case Some(b) => prefBase.join(df.select(col(idCol).as("id"), col(b)), Seq("id"))
      case None    => prefBase
    }
    val joinCond = blockCol
      .map(b => col("x.tok") === col("y.tok") && col(s"x.$b") === col(s"y.$b"))
      .getOrElse(col("x.tok") === col("y.tok")) && col("x.id") < col("y.id")
    val cands = pref.as("x").join(pref.as("y"), joinCond)
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val pairs = cands
      .join(toks.select(col("id").as("a"), col("toks").as("ta")), Seq("a"))
      .join(toks.select(col("id").as("b"), col("toks").as("tb")), Seq("b"))
    pairJaccard(pairs, threshold)
  }

  /** Benchmark decontamination (beyond-reference pipeline op — the
    * eval-overlap rule of the GPT-3/PaLM training-data reports): flag
    * every training doc sharing at least `minHits` DISTINCT word n-grams
    * with the evaluation corpus. Returns `(idCol, hits)` for flagged docs;
    * drop them with [[decontaminate]].
    *
    * Scale design: no pair join and no text in the shuffle — doc shingles
    * explode to 8-byte md5-derived hashes and probe the eval set's
    * distinct gram hashes. An eval benchmark is tiny next to a 100 TB
    * corpus, so the eval side broadcasts by default (`broadcastEval =
    * false` falls back to a shuffle join for giant holdout sets); hit
    * counting is one map-side-combined groupBy on the doc id.
    */
  def contaminationHits(
      docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String,
      shingleN: Int = 3, minHits: Int = 1,
      broadcastEval: Boolean = true,
      windowed: Boolean = false,
      hashChars: Int = 15): DataFrame = {
    // hashChars defaults to 15 (60-bit): at corpus scale, 32-bit gram
    // hashes collide against a ~1e6-gram eval set often enough to falsely
    // drop clean docs when minHits is small; 60 bits makes that negligible
    val docGrams = withShingles(docs, idCol, textCol, shingleN,
        hashChars, distinctGrams = !windowed)
      .select(col("id"), explode(col("toks")).as("g"))
    val evalGrams = withShingles(
        evalDocs.select(col(evalTextCol)).withColumn("__eid", monotonically_increasing_id()),
        "__eid", evalTextCol, shingleN, hashChars)
      .select(explode(col("toks")).as("g")).distinct()
    val probe = if (broadcastEval) broadcast(evalGrams) else evalGrams
    // distinct mode: toks are distinct per doc (ShingleHash contract) and
    // the eval side is distinct, so count(*) IS the distinct shared-gram
    // count. windowed mode: toks carry one entry PER SLIDING POSITION, so
    // count(*) counts every overlapping window ("any 13-gram overlap"
    // rules count occurrences, not distinct grams)
    docGrams.join(probe, Seq("g"))
      .groupBy(col("id")).agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
      .select(col("id").as(idCol), col("hits"))
  }

  /** Bloom-filter decontamination: the membership side of
    * [[contaminationHits]] carried as a word-packed Bloom sketch
    * (graft.sketch.Sketches) instead of the raw eval-gram set. At 100 TB
    * the eval set's distinct grams can outgrow a comfortable broadcast
    * (a 1e9-gram holdout is an 8 GB long-set but a 128 MB Bloom at
    * 1 bit/gram); the filter's m/32-word table broadcasts at a size the
    * OPERATOR chooses, independent of eval cardinality, trading a
    * published false-positive rate (never false negatives — no clean doc
    * is ever flagged that the exact rule wouldn't at least partially
    * match). Probe work is |distinct train grams|·k against the broadcast
    * words. With `exactHits = true` (verification/gate mode) the exact
    * hit count rides alongside so the gate checks the FP algebra
    * cross-engine — but that requires the raw eval-gram set again, which
    * is exactly what the Bloom path exists to avoid, so production runs
    * at Bloom scale leave it false (default) and the eval grams never
    * materialize past the one-pass sketch build; if exact verification of
    * a giant holdout IS wanted, `broadcastEval = false` computes it via a
    * shuffle join instead of a broadcast. Returns
    * `(idCol, bloom_hits[, exact_hits])` for docs with
    * bloom_hits >= minHits.
    */
  def bloomContaminationHits(
      docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String,
      shingleN: Int = 3, minHits: Int = 1,
      mBits: Int = 1 << 20, k: Int = 4,
      hashChars: Int = 15,
      exactHits: Boolean = false,
      broadcastEval: Boolean = true): DataFrame = {
    import graft.sketch.Sketches
    val evalGrams0 = withShingles(
        evalDocs.select(col(evalTextCol)).withColumn("__eid", monotonically_increasing_id()),
        "__eid", evalTextCol, shingleN, hashChars)
      .select(explode(col("toks")).as("g")).distinct()
    // gate mode consumes the eval grams twice (sketch build + exact-mark
    // broadcast) — materialize the distinct set once; production mode
    // (exactHits=false) consumes it once and skips the pin
    val evalGrams =
      if (exactHits) evalGrams0.localCheckpoint(true) else evalGrams0
    val words = Sketches.bloomWords(evalGrams, col("g"), mBits, k)
    val docGrams = withShingles(docs, idCol, textCol, shingleN, hashChars)
      .select(col("id"), explode(col("toks")).as("g"))
    // probe DISTINCT grams (corpus grams repeat across docs), then ONE
    // equi-join back carrying the verdict(s) — probe volume is
    // |distinct grams|·k, not pairs·k, and the doc-gram explode is
    // evaluated once per subtree (probe + join), not once per verdict
    val maybes = Sketches.bloomMightContain(words, docGrams, col("g"), mBits, k)
      .select(col("__key").as("g"), col("maybe"))
    if (!exactHits) {
      docGrams.join(maybes, Seq("g"))
        .groupBy(col("id"))
        .agg(sum(when(col("maybe"), 1L).otherwise(0L)).as("bloom_hits"))
        .filter(col("bloom_hits") >= minHits)
        .select(col("id").as(idCol), col("bloom_hits"))
    } else {
      val evalMark = evalGrams.withColumn("__x", lit(1))
      val probe = if (broadcastEval) broadcast(evalMark) else evalMark
      val verdicts = maybes.join(probe, Seq("g"), "left")
        .select(col("g"), col("maybe"), col("__x").isNotNull.as("exact"))
      docGrams.join(verdicts, Seq("g"))
        .groupBy(col("id"))
        .agg(sum(when(col("maybe"), 1L).otherwise(0L)).as("bloom_hits"),
          sum(when(col("exact"), 1L).otherwise(0L)).as("exact_hits"))
        .filter(col("bloom_hits") >= minHits)
        .select(col("id").as(idCol), col("bloom_hits"), col("exact_hits"))
    }
  }

  /** Training corpus minus contaminated docs (left-anti on
    * [[contaminationHits]]).
    */
  def decontaminate(
      docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String,
      shingleN: Int = 3, minHits: Int = 1,
      broadcastEval: Boolean = true,
      windowed: Boolean = false,
      hashChars: Int = 15): DataFrame = {
    val flagged = contaminationHits(docs, idCol, textCol, evalDocs, evalTextCol,
      shingleN, minHits, broadcastEval, windowed, hashChars)
    docs.join(flagged.select(col(idCol)), Seq(idCol), "left_anti")
  }

  /** Connected components over a near-dup pair list: every doc in a
    * component gets the component's MINIMUM id as its cluster label — the
    * step that turns pair output (minhash/simhash/jaccard/cosine) into
    * dedup GROUPS with a canonical keeper.
    *
    * Algorithm: iterative min-label propagation to convergence — the
    * standard distributed connected-components loop (O(component diameter)
    * rounds, each one join + groupBy). Deterministic: labels only ever
    * decrease, fixpoint independent of partitioning.
    */
  /** Near-dup retention by QUALITY: keep the best-`scoreCol` doc of every
    * duplicate cluster (ties: min id) and every unclustered doc untouched —
    * the curation recipe where dedup should not keep an arbitrary copy but
    * the highest-quality one. `clusters` is [[duplicateClusters]] output
    * (`id`, `cluster`).
    *
    * Scale design: only CLUSTER MEMBERS (the pair-derived set, a tiny
    * fraction of the corpus) flow through the per-cluster window; the
    * corpus itself is touched once by a left-anti join against the loser
    * ids. Putting the whole corpus through a window partitioned by a
    * mostly-null cluster key would funnel every unclustered row into one
    * task — designed out.
    */
  def keepBestPerCluster(
      docs: DataFrame, idCol: String, scoreCol: String,
      clusters: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val members = clusters.select(col("id"), col("cluster"))
      .join(docs.select(col(idCol).as("id"), col(scoreCol).as("__s")), Seq("id"))
    val losers = members
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("cluster"))
          .orderBy(col("__s").desc, col("id").asc)))
      .filter(col("__rn") > 1)
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  def duplicateClusters(
      pairs: DataFrame, aCol: String = "a", bCol: String = "b",
      maxDriverEdges: Long = DriverUnionFindMaxEdges): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().localCheckpoint(true)
    // near-dup pair lists are typically a tiny fraction of the corpus even
    // when the corpus is 100 TB — when the edge set fits on the driver,
    // in-memory union-find beats O(component diameter) shuffle rounds by
    // orders of magnitude; the distributed loop below remains the path for
    // genuinely huge edge sets
    // the driver shortcut must produce the SAME minimum label the
    // distributed loop's least() would pick — only take it for key types
    // whose JVM ordering provably matches Spark's (Decimal, Timestamp,
    // etc. would fall back to a lexical toString order and could crown a
    // different keeper depending on which side of maxDriverEdges the edge
    // count lands)
    val keyOrderingSafe = edges.schema("src").dataType match {
      case org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.DoubleType => true
      case _ => false
    }
    val nEdges = edges.count()
    if (nEdges <= maxDriverEdges && keyOrderingSafe) {
      val out = driverUnionFind(edges)
      edges.unpersist()
      return out
    }
    val out = starComponents(edges)
    edges.unpersist()
    out
  }

  /** Distributed connected components by alternating LARGE-STAR /
    * SMALL-STAR edge contraction (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14) — O(log^2 n) rounds versus min-label
    * propagation's O(component diameter): the scale path for chain-shaped
    * near-dup clusters (doc1~doc2~...~docN), where label propagation pays
    * a full shuffle round per hop. Output contract identical to
    * [[duplicateClusters]]: every node labeled with its component's
    * MINIMUM id under the id column's natural ordering.
    *
    * Shape notes for the 100 TB case: both star operations are a
    * groupBy-min + equi-join — per-node reduce state is a single running
    * min, never a collected neighbor list, so a celebrity node costs a
    * bigger reduce group, not executor memory. Edge frames shrink
    * monotonically toward the star fixpoint and each round's frame is
    * localCheckpointed while the previous one is unpersisted (bounded
    * block-manager footprint, same discipline as GraphX/Pregel).
    *
    * Invariant used below: every emitted edge (s, g) keeps s < g — for
    * large-star the new endpoint m = min(N(u) ∪ {u}) <= u < v; for
    * small-star m is the group minimum — so the canonical edge direction
    * never needs re-sorting between rounds.
    */
  private[graft] def starComponents(edges0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // canonical undirected edge set (s < g), self-loops dropped; kept
    // checkpointed until the end (the node universe derives from it)
    val init = edges0
      .select(least(col("src"), col("dst")).as("s"),
        greatest(col("src"), col("dst")).as("g"))
      .filter(col("s") =!= col("g"))
      .distinct().localCheckpoint(true)
    var edges = init
    var changed = 1L
    while (changed > 0) {
      // LARGE-STAR: for each node u, connect every strictly-larger
      // neighbor v to m = min(N(u) ∪ {u}). One window pass — the group
      // min rides a partitionBy(u) window over the UNFILTERED neighbor
      // frame, so no groupBy+join round-trip (each extra Spark job here
      // is a fixed scheduler cost per CC round).
      val bi = edges.select(col("s").as("u"), col("g").as("v"))
        .unionByName(edges.select(col("g").as("u"), col("s").as("v")))
      val ls = bi
        .withColumn("mv", min(col("v")).over(Window.partitionBy("u")))
        .filter(col("v") > col("u"))
        .select(least(col("mv"), col("u")).as("s"), col("v").as("g"))
        .filter(col("s") =!= col("g"))
      // SMALL-STAR: on edges directed larger -> smaller, connect u and
      // all its smaller neighbors to m = min(N_<(u) ∪ {u}) (= min over
      // the incoming s side, which is < u by the invariant). Both output
      // families — (m, each smaller neighbor) and (m, u itself) — come
      // out of ONE projection via explode, so ls is consumed once.
      val next = ls
        .withColumn("mv", min(col("s")).over(Window.partitionBy("g")))
        .select(explode(array(
          struct(col("mv").as("s"), col("s").as("g")),
          struct(col("mv").as("s"), col("g").as("g")))).as("e"))
        .select(col("e.s").as("s"), col("e.g").as("g"))
        .filter(col("s") =!= col("g"))
        .distinct().localCheckpoint(true)
      // fixpoint = edge set unchanged (the paper's termination
      // condition). Both sides are distinct, so |symmetric difference| =
      // count of size-1 groups in the two-side union — ONE job instead
      // of two exceptAll passes.
      changed = next.unionByName(edges).groupBy("s", "g").count()
        .filter(col("count") === 1).count()
      if (edges ne init) edges.unpersist()
      edges = next
    }
    // at the fixpoint edges form stars centered at component minima;
    // nodes with no incoming star edge are their component's minimum
    val centerOf = edges.groupBy(col("g").as("id")).agg(min(col("s")).as("__c"))
    val allNodes = init.select(col("s").as("id"))
      .unionByName(init.select(col("g").as("id"))).distinct()
    allNodes.join(centerOf, Seq("id"), "left")
      .select(col("id"), coalesce(col("__c"), col("id")).as("cluster"))
  }

  /** Edge-count ceiling for the driver union-find shortcut (~32 MB of
    * boxed pairs — far under any sane driver heap).
    */
  val DriverUnionFindMaxEdges: Long = 2000000L

  /** In-memory connected components with the SAME min-label contract as
    * the distributed loop: every node labeled with its component's minimum
    * id under the id column's natural ordering.
    */
  private def driverUnionFind(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    import scala.collection.mutable
    val dt = edges.schema("src").dataType
    val ord: Ordering[Any] = (dt match {
      case org.apache.spark.sql.types.StringType  => Ordering.by((x: Any) => x.asInstanceOf[String])
      case org.apache.spark.sql.types.LongType    => Ordering.by((x: Any) => x.asInstanceOf[Long])
      case org.apache.spark.sql.types.IntegerType => Ordering.by((x: Any) => x.asInstanceOf[Int])
      case org.apache.spark.sql.types.DoubleType  => Ordering.by((x: Any) => x.asInstanceOf[Double])
      case other => throw new IllegalStateException(
        s"driverUnionFind supports String/Long/Int/Double ids (got $other); " +
          "caller must route other key types through the distributed loop")
    })
    val rows = edges.collect()
    val idx = mutable.HashMap.empty[Any, Int]
    val ids = mutable.ArrayBuffer.empty[Any]
    def intern(x: Any): Int = idx.getOrElseUpdate(x, { ids += x; ids.length - 1 })
    val parent = mutable.ArrayBuffer.empty[Int]
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    rows.foreach { r =>
      val a = intern(r.get(0)); val b = intern(r.get(1))
      while (parent.length < ids.length) parent += parent.length
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(rb) = ra
    }
    // component root -> minimum member id (the canonical keeper label)
    val minOf = mutable.HashMap.empty[Int, Any]
    ids.indices.foreach { i =>
      val r = find(i)
      val v = ids(i)
      minOf.get(r) match {
        case Some(m) if ord.lteq(m, v) => ()
        case _                         => minOf(r) = v
      }
    }
    val out = ids.indices.map(i => Row(ids(i), minOf(find(i))))
    edges.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava),
      StructType(Seq(StructField("id", dt), StructField("cluster", dt))))
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Brute-force cosine near-dup pairs (the exact baseline). O(n^2) — use
    * [[cosineLshPairs]] at scale.
    */
  /** SemDeDup (Abbas et al. 2023): semantic dedup via k-means-clustered
    * embeddings — pairwise cosine runs only WITHIN a cluster, never
    * corpus×corpus, so the quadratic term is n²/k and the operating
    * point scales by raising k with the corpus. Returns the kept rows
    * (minimum id per within-cluster near-dup component survives —
    * [[duplicateClusters]]' canonical keeper rule).
    *
    * Training mirrors the IVF indexes: a deterministic driver-side
    * sample (TakeOrdered by id, k-bounded) feeds [[graft.index
    * .LocalKMeans]]; centroids broadcast into the assignment kernel;
    * the within-cluster join shuffles once on the cluster id.
    * Approximate BY DESIGN (a true pair straddling two clusters is
    * missed — the paper's trade); recall vs brute-force cosine pairs is
    * spec-measured, exactness is spec'd on separated clusters.
    */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String,
      numClusters: Int, threshold: Double,
      sampleSize: Int = 20000, seed: Long = 42L): DataFrame = {
    val xs = df.select(col(idCol), col(vecCol)).orderBy(col(idCol))
      .limit(sampleSize).collect().map(_.getSeq[Float](1).toArray)
    val centers = graft.index.LocalKMeans.fit(xs, numClusters, seed = seed)
    val assigned = graft.index.Ivf.assignWithCenters(df, vecCol, centers)
    val t = assigned.select(col("centroid_id"), col(idCol).as("id"), col(vecCol).as("v"))
    val pairs = t.as("x").join(t.as("y"),
        col("x.centroid_id") === col("y.centroid_id") && col("x.id") < col("y.id"))
      .withColumn("cos", graft.functions.cosine_sim(col("x.v"), col("y.v")))
      .filter(col("cos") >= threshold)
      .select(col("x.id").as("a"), col("y.id").as("b"))
    val losers = duplicateClusters(pairs)
      .filter(col("id") =!= col("cluster")).select(col("id"))
    df.join(losers.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }

  def cosinePairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val t = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    t.as("x").join(t.as("y"), col("x.id") < col("y.id"))
      .withColumn("cos", graft.functions.cosine_sim(col("x.v"), col("y.v")))
      .filter(col("cos") >= threshold)
      .select(col("x.id").as("a"), col("y.id").as("b"), round(col("cos"), 6).as("cos"))
  }

  /** Random-hyperplane LSH variant with OR-amplification: `tables`
    * independent hash tables, each bucketing by the sign pattern of
    * `planes` deterministic pseudo-random hyperplanes (seeded,
    * reproducible). A pair at angle θ collides in one table with
    * prob (1-θ/π)^planes; missing all tables has prob
    * (1-(1-θ/π)^planes)^tables, so recall is tuned by (planes, tables).
    * Only within-bucket pairs are verified — the O(n^2) self-join becomes
    * per-bucket joins.
    */
  def cosineLshPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 4, tables: Int = 8, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val rng = new scala.util.Random(seed)
    val buckets = (0 until tables).map { tbl =>
      val planeVecs = Array.fill(planes, dim)(rng.nextGaussian().toFloat)
      val sig = planeVecs.zipWithIndex.map { case (p, i) =>
        when(graft.functions.inner_product(col(vecCol), array(p.toIndexedSeq.map(lit(_)): _*)) >= 0,
          shiftleft(lit(1L), i)).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(tbl).as("tbl"), sig.as("sig"))
    }
    val t = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      explode(array(buckets: _*)).as("bucket"))
    t.as("x").join(t.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.v").as("va"), col("y.v").as("vb"))
      .distinct()
      .withColumn("cos", graft.functions.cosine_sim(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
  }
}
