package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable aggregation sketches — the fixed-memory distinct/frequency
  * estimators a 100 TB pipeline reaches for when an exact global
  * `COUNT(DISTINCT)` / per-key count would shuffle the whole corpus:
  *
  *  - HyperLogLog (Flajolet et al. 2007): distinct counts from a
  *    4096-register max-merge — registers are group-by/max rows, so the
  *    shuffle carries at most m=2^p (idx, rho) pairs per partition after
  *    map-side combine, never the keys themselves.
  *  - KMV / theta-style k-minimum-values (Bar-Yossef et al. 2002;
  *    Dasgupta et al. 2016 for the set-op algebra): distinct estimates
  *    plus union/Jaccard estimates between sets from the k smallest
  *    60-bit hashes per set.
  *  - Count-Min (Cormode & Muthukrishnan 2005): frequency over-estimates
  *    from a d×w counter grid; the shuffle state is d·w cells regardless
  *    of key cardinality.
  *
  * Everything is deterministic and cross-engine exact: hashes are md5
  * prefixes (`conv(substr(md5(x),1,15),16,10)` ⇔ DuckDB
  * `('0x'||substr(md5(x),1,15))::BIGINT`), register/rank arithmetic is
  * integer, and the few float steps (the HLL alpha correction, the KMV
  * (k-1)·2^60/h_k division, ln in linear counting) are fixed-order double
  * expressions both engines evaluate bit-identically — the repo's proven
  * oracle-parity class (SURVEY §14.6, memory notes). No SQL sketch
  * builtins are used on either side: the oracle REPLAYS the sketch, so
  * the gate checks the algorithm, not a library.
  *
  * Reference context: gamma keeps no sketch aggregates (its counts are
  * exact bitmap/docid scans); these are the beyond-reference additions
  * the training-data-pipeline brief asks for.
  */
object Sketches {

  /** 60-bit key hash both engines compute identically. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  // ---------------------------------------------------------------- HLL

  /** Register precision: p=12 → m=4096 registers, 48-bit rho domain. */
  val HllP = 12
  val HllM = 4096
  private val WBits = 60 - HllP // 48
  /** alpha_m for m=4096: 0.7213/(1+1.079/m), written as one literal so
    * both engines parse the identical double. */
  private val HllAlphaLit = "0.721110"

  /** Per-group HLL registers: one row per (group, idx) with the max rho.
    * rho = 1 + leading zeros of the 48-bit suffix = 49 − bitlength(w),
    * with the w=0 row pinned to 49. Map-side combine caps the shuffle at
    * m rows per partition per group — the whole point at 100 TB.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], key: Column): DataFrame = {
    val h = hash60(key)
    val w = shiftright(h, HllP)
    val rho = when(w === 0L, lit(WBits + 1))
      .otherwise(lit(WBits + 1) - length(bin(w)))
      .cast("int")
    df.select(groupCols.map(col) :+ pmod(h, lit(HllM)).cast("int").as("__idx")
        :+ rho.as("__rho"): _*)
      .groupBy((groupCols.map(col) :+ col("__idx")): _*)
      .agg(max(col("__rho")).as("__r"))
  }

  /** Estimate from registers. Scaled-integer harmonic sum: each register
    * contributes 2^(49−r) (an empty one 2^49), so S = Σ 2^(49−r) is an
    * exact long (≤ 4096·2^49 = 2^61) and E_raw = α·m²·2^49 / S in one
    * fixed-order double expression. Linear counting below 2.5m with
    * empty registers, as published.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val two49 = 1L << (WBits + 1)
    val agg = registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("__nreg"),
        sum(expr(s"shiftleft(cast(1 as bigint), ${WBits + 1} - __r)")).as("__sp"))
      .withColumn("__v", lit(HllM.toLong) - col("__nreg"))
      .withColumn("__s", col("__sp") + col("__v") * lit(two49))
    val raw = floor(
      (lit(HllAlphaLit.toDouble) * lit(HllM.toDouble) * lit(HllM.toDouble) * lit(two49.toDouble))
        / col("__s").cast("double")).cast("long")
    agg
      .withColumn("__raw", raw)
      .withColumn("n_est",
        when(col("__raw") <= lit(5L * HllM / 2) && col("__v") > 0L,
          floor(lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("__v").cast("double"))).cast("long"))
          .otherwise(col("__raw")))
      .select(groupCols.map(col) :+ col("n_est"): _*)
  }

  /** Distinct-count estimate per group, next to the exact count the gate
    * compares against. One register pass + one exact-distinct pass.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], key: Column): DataFrame = {
    val est = hllEstimate(hllRegisters(df, groupCols, key), groupCols)
    val exact = df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(key).as("n_exact"))
    est.join(exact, groupCols)
      .select(groupCols.map(col) :+ col("n_est") :+ col("n_exact"): _*)
  }

  /** Union estimates for every unordered pair of groups, computed by
    * MERGING the two groups' registers (elementwise max) — the sketch
    * algebra a 1000-executor rollup relies on: never re-reads the data,
    * just max-merges 4096-row states.
    */
  def hllUnionPairs(df: DataFrame, groupCol: String, key: Column): DataFrame = {
    val reg = hllRegisters(df, Seq(groupCol), key)
    // Tag each group's registers onto every pair it belongs to, then
    // max-merge per (pair, idx): an idx present on one side only keeps
    // its rho (union semantics — the other side's register is empty).
    val groups = reg.select(col(groupCol)).distinct()
    val pairs = groups.select(col(groupCol).as("grp_a"))
      .crossJoin(broadcast(groups.select(col(groupCol).as("grp_b"))))
      .filter(col("grp_a") < col("grp_b"))
    val aSide = broadcast(pairs).join(reg.withColumnRenamed(groupCol, "grp_a"), Seq("grp_a"))
      .select(col("grp_a"), col("grp_b"), col("__idx"), col("__r"))
    val bSide = broadcast(pairs).join(reg.withColumnRenamed(groupCol, "grp_b"), Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("__idx"), col("__r"))
    val unioned = aSide.union(bSide)
      .groupBy(col("grp_a"), col("grp_b"), col("__idx"))
      .agg(max(col("__r")).as("__r"))
    val est = hllEstimate(unioned, Seq("grp_a", "grp_b"))
      .withColumnRenamed("n_est", "union_est")
    // exact |A ∪ B| = |A| + |B| − |A ∩ B| from the true key sets
    val sets = df.select(col(groupCol), key.as("__k")).distinct()
    val szs = sets.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val inter = sets.select(col(groupCol).as("grp_a"), col("__k"))
      .join(sets.select(col(groupCol).as("grp_b"), col("__k")), Seq("__k"))
      .filter(col("grp_a") < col("grp_b"))
      .groupBy(col("grp_a"), col("grp_b")).agg(count(lit(1)).as("__i"))
    val exact = broadcast(pairs)
      .join(szs.select(col(groupCol).as("grp_a"), col("__n").as("__na")), Seq("grp_a"))
      .join(szs.select(col(groupCol).as("grp_b"), col("__n").as("__nb")), Seq("grp_b"))
      .join(inter, Seq("grp_a", "grp_b"), "left")
      .select(col("grp_a"), col("grp_b"),
        (col("__na") + col("__nb") - coalesce(col("__i"), lit(0L))).as("union_exact"))
    est.join(exact, Seq("grp_a", "grp_b"))
  }

  // ---------------------------------------------------------------- KMV

  val KmvMaxHash = 1L << 60

  /** The k smallest distinct key hashes per group (rank-stamped). The
    * distinct pass map-side combines; the rank window sees at most the
    * distinct hashes — and a TopK heap variant would bound that too, but
    * the window keeps the plan declarative and the state is tiny.
    */
  def kmvMinima(df: DataFrame, groupCol: String, key: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = df.select(col(groupCol), hash60(key).as("__h")).distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__h"))
    hashed.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
  }

  /** Distinct estimate per group: exact when the sketch isn't full,
    * (k−1)·2^60/h_k otherwise. Exact count joined in for the gate.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, key: Column, k: Int): DataFrame = {
    val minima = kmvMinima(df, groupCol, key, k)
    val est = minima.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), max(when(col("__rn") === k, col("__h"))).as("__hk"))
      .withColumn("n_est",
        when(col("__n") < k, col("__n"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(KmvMaxHash.toDouble)
            / col("__hk").cast("double")).cast("long")))
      .select(col(groupCol), col("n_est"))
    val exact = df.groupBy(col(groupCol)).agg(countDistinct(key).as("n_exact"))
    est.join(exact, groupCol)
  }

  /** Theta-style Jaccard + union estimates for every unordered pair of
    * groups, from the k-min sketches alone: the union sketch is the k
    * smallest of the two hash sets' union; J ≈ |{h ∈ U_k : h in both}|/|U_k|.
    * Exact Jaccard joined in for the gate.
    */
  def kmvJaccardPairs(df: DataFrame, groupCol: String, key: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val minima = kmvMinima(df, groupCol, key, k).select(col(groupCol), col("__h"))
    val a = minima.select(col(groupCol).as("grp_a"), col("__h"))
    val b = minima.select(col(groupCol).as("grp_b"), col("__h"))
    val both = a.join(b, Seq("__h")).filter(col("grp_a") < col("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("__h"), lit(1).as("__inBoth"))
    val groups = minima.select(col(groupCol)).distinct()
    val pairs = groups.select(col(groupCol).as("grp_a"))
      .crossJoin(broadcast(groups.select(col(groupCol).as("grp_b"))))
      .filter(col("grp_a") < col("grp_b"))
    val unionRows = broadcast(pairs).join(a, Seq("grp_a"))
      .select(col("grp_a"), col("grp_b"), col("__h"))
      .union(broadcast(pairs).join(
        minima.select(col(groupCol).as("grp_b"), col("__h")), Seq("grp_b"))
        .select(col("grp_a"), col("grp_b"), col("__h")))
      .distinct()
    val w = Window.partitionBy(col("grp_a"), col("grp_b")).orderBy(col("__h"))
    val unionK = unionRows.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
    val scored = unionK
      .join(both, Seq("grp_a", "grp_b", "__h"), "left")
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(
        count(lit(1)).as("__uk"),
        sum(coalesce(col("__inBoth"), lit(0))).as("j_num"),
        max(when(col("__rn") === k, col("__h"))).as("__hk"))
      .withColumn("j_est", round(col("j_num").cast("double") / col("__uk").cast("double"), 6))
      .withColumn("union_est",
        when(col("__uk") < k, col("__uk"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(KmvMaxHash.toDouble)
            / col("__hk").cast("double")).cast("long")))
    // exact Jaccard of the true key sets, for the gate's side-by-side
    val sets = df.select(col(groupCol), key.as("__k")).distinct()
    val xa = sets.select(col(groupCol).as("grp_a"), col("__k"))
    val xb = sets.select(col(groupCol).as("grp_b"), col("__k"))
    val inter = xa.join(xb, Seq("__k")).filter(col("grp_a") < col("grp_b"))
      .groupBy(col("grp_a"), col("grp_b")).agg(count(lit(1)).as("__i"))
    val szs = sets.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val exact = inter
      .join(szs.select(col(groupCol).as("grp_a"), col("__n").as("__na")), Seq("grp_a"))
      .join(szs.select(col(groupCol).as("grp_b"), col("__n").as("__nb")), Seq("grp_b"))
      .withColumn("j_exact", round(col("__i").cast("double")
        / (col("__na") + col("__nb") - col("__i")).cast("double"), 6))
      .select(col("grp_a"), col("grp_b"), col("j_exact"))
    scored.join(exact, Seq("grp_a", "grp_b"), "left")
      .na.fill(0.0, Seq("j_exact"))
      .select(col("grp_a"), col("grp_b"), col("j_num").cast("long").as("j_num"),
        col("j_est"), col("union_est"), col("j_exact"))
  }

  // -------------------------------------------------------------- Bloom

  /** Bloom filter (Bloom 1970) as a word-packed bit table: m bits live in
    * m/32 BIGINT words, one row per non-empty word, OR-merged by the
    * `bit_or` aggregate. 32 bits per word — not 64 — because the replayed
    * DuckDB oracle's `<<` is overflow-checked and may never touch the
    * sign bit; the algebra is identical. Map-side combine caps the
    * shuffle at m/32 rows per partition no matter how many keys stream
    * through, and merging filters across corpora/days is the same
    * `bit_or` over the union of word tables — the mergeable-state shape
    * every sketch in this file shares.
    */
  def bloomWords(df: DataFrame, key: Column, mBits: Int, k: Int): DataFrame = {
    require(mBits % 32 == 0 && mBits > 0, s"mBits must be a positive multiple of 32, got $mBits")
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(key.cast("string").as("__k"),
        explode(sequence(lit(0), lit(k - 1))).as("__i"))
      .withColumn("__b",
        pmod(hash60(concat(col("__i").cast("string"), lit("|"), col("__k"))), lit(mBits)).cast("int"))
      .groupBy(shiftright(col("__b"), 5).as("__w"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), __b % 32))").as("__word"))
  }

  /** Membership probe: a key is maybe-present iff all k of its bit
    * positions are set. Each probe key explodes to k (word, mask) pairs
    * that join the broadcast word table — k·|probes| skinny rows against
    * ≤ m/32 broadcast rows, never the corpus. Returns one row per
    * distinct probe key with a `maybe` flag; no false negatives by
    * construction, false positives at the published (1−e^{−kn/m})^k rate.
    */
  def bloomMightContain(
      words: DataFrame, probes: DataFrame, key: Column, mBits: Int, k: Int): DataFrame = {
    val q = probes.select(key.as("__key")).distinct()
      .select(col("__key"), explode(sequence(lit(0), lit(k - 1))).as("__i"))
      .withColumn("__b",
        pmod(hash60(concat(col("__i").cast("string"), lit("|"), col("__key").cast("string"))),
          lit(mBits)).cast("int"))
      .withColumn("__w", shiftright(col("__b"), 5))
      .withColumn("__m", expr("shiftleft(cast(1 as bigint), __b % 32)"))
    q.join(broadcast(words), Seq("__w"), "left")
      .groupBy(col("__key"))
      .agg((sum(when(col("__word").isNotNull &&
        (col("__word").bitwiseAND(col("__m")) === col("__m")), 1).otherwise(0)) === k)
        .as("maybe"))
  }

  // ---------------------------------------------------------- Count-Min

  /** d×w Count-Min cell counts: one row per non-empty cell. The exploded
    * (row, col) stream map-side combines to ≤ d·w rows per partition, so
    * the shuffle is grid-sized no matter how many keys stream through.
    */
  def cmsCells(df: DataFrame, key: Column, d: Int, w: Int): DataFrame = {
    val rows = df.select(key.cast("string").as("__k"),
      explode(sequence(lit(0), lit(d - 1))).as("__i"))
    rows
      .withColumn("__c", pmod(hash60(concat(col("__i").cast("string"), lit("|"), col("__k"))), lit(w)).cast("int"))
      .groupBy(col("__i"), col("__c"))
      .agg(count(lit(1)).as("__cnt"))
  }

  /** Point estimates for the given query keys: min over the d cells each
    * key hashes into — the classic CMS upper bound (est ≥ exact always).
    */
  def cmsEstimate(cells: DataFrame, queries: DataFrame, key: Column, d: Int, w: Int): DataFrame = {
    val q = queries.select(key.cast("string").as("__k"),
        explode(sequence(lit(0), lit(d - 1))).as("__i"))
      .withColumn("__c", pmod(hash60(concat(col("__i").cast("string"), lit("|"), col("__k"))), lit(w)).cast("int"))
    q.join(broadcast(cells), Seq("__i", "__c"))
      .groupBy(col("__k"))
      .agg(min(col("__cnt")).as("cms_est"))
  }
}
