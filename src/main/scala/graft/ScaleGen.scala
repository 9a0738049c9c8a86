package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe data generator (not part of the driver contract): writes an
  * N-times replica of an sf directory so the gate queries can be measured
  * one decade up (the driver only ships sf0.001/0.01/0.1; the reference
  * publishes 10M-1B-scale behavior, benchs/README.md:94-136).
  *
  * A naive union of identical copies would NOT be a faithful 10x: every
  * document would gain 9 exact clones, near-dup pair counts would grow
  * quadratically in the copy count instead of linearly in corpus size, and
  * KNN would rank 10 tied vectors per hit. So each copy is deterministically
  * individualized while keeping the INTRA-copy structure (the real dup
  * rate, cluster shape, key distributions) intact:
  *   - ids shift by copy * (max_id + 1) per key family, preserving
  *     referential joins (part<->embeddings, orders<->lineitem, customer)
  *   - document text is word-salted per copy (every token gets a copy
  *     suffix), so shingle sets are disjoint across copies
  *   - embeddings get a small deterministic per-copy perturbation, so
  *     copies are near but not equal in vector space
  * Copy 0 is bit-identical to the source, so id-pinned gate queries
  * (vec_id = 0, _id = "0") still hit.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    // optional 4th arg: comma-separated table subset (targeted probes at
    // extreme scale where the full star schema would not fit the host)
    val onlyTables: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    val spark = graft.core.GraftSession.local(32, "graft-scalegen")

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0)

    /** One shifted/transformed replica of `df` (copy 0 = bit-identical). */
    def oneCopy(df: DataFrame, shifts: Map[String, Long], k: Int,
        perCopy: (DataFrame, Int) => DataFrame): DataFrame = {
      val shifted = shifts.foldLeft(df) { case (d, (c, off)) =>
        d.withColumn(c, col(c) + lit(off * k))
      }
      if (k == 0) shifted else perCopy(shifted, k)
    }

    /** Write `copies` replicas as one append job PER COPY instead of a
      * single `copies`-way-union job: at 1000x a 600M-row lineitem union
      * dies on a JDK-17 G1 GCLocker/humongous-allocation wall (one job
      * holding every copy's scan + exchange at once), while ten bounded
      * 60M-row jobs stream through fine. Chunking changes file layout
      * only — readers glob the directory either way.
      */
    def writeCopies(name: String, src: => DataFrame, shifts: Map[String, Long],
        partsPerTable: Int,
        perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      if (onlyTables.forall(_.contains(name))) {
        val t0 = System.nanoTime()
        val partsPerCopy = math.max(1, partsPerTable / copies)
        (0 until copies).foreach { k =>
          val mode = if (k == 0) "overwrite" else "append"
          oneCopy(src, shifts, k, perCopy).repartition(partsPerCopy)
            .write.mode(mode).parquet(s"$out/$name.parquet")
        }
        val n = spark.read.parquet(s"$out/$name.parquet").count()
        System.err.println(
          f"[scalegen] $name%-12s rows=$n%10d  ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      }
    }

    def write(name: String, df: => DataFrame, parts: Int): Unit = {
      if (onlyTables.forall(_.contains(name))) {
        val t0 = System.nanoTime()
        df.repartition(parts).write.mode("overwrite")
          .parquet(s"$out/$name.parquet")
        val n = spark.read.parquet(s"$out/$name.parquet").count()
        System.err.println(
          f"[scalegen] $name%-12s rows=$n%10d  ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      }
    }

    def t(name: String): DataFrame = graft.core.Tables.load(spark, src, name)

    // key-family offsets (one per referential group, from the SOURCE data)
    val partOff  = maxOf(t("part"), "p_partkey")
      .max(maxOf(t("embeddings"), "vec_id")) + 1
    val docOff   = maxOf(t("documents"), "doc_id") + 1
    val ordOff   = maxOf(t("orders"), "o_orderkey") + 1
    val custOff  = maxOf(t("customer"), "c_custkey") + 1
    val suppOff  = maxOf(t("supplier"), "s_suppkey") + 1
    val eventOff = maxOf(t("events"), "event_id") + 1
    val userOff  = maxOf(t("events"), "user_id") + 1

    // dimension tables stay single-copy (nation/region are fixed domains)
    Seq("nation", "region").foreach(n => write(n, t(n), 1))

    // GRAFT_SCALEGEN_ZIPF=<vocabSize>: replace the source's 31-word-salad
    // text with a Zipf(s=1) vocabulary BEFORE replication. The salad makes
    // every term a stopword — it stress-tests the seeded phrase/proximity
    // path (worst case: no rare seeds) but under-tests the df skew every
    // real corpus has (rare-term seeds that actually prune, bm25 idf
    // spread, PMI tails). Zipf docs are deterministic per content key
    // (P(rank) ∝ 1/rank via inverse-CDF: rank = ⌊V^u⌋), 30-80 tokens;
    // every 500th doc clones its predecessor so the exact-dedup gates
    // keep a planted dup rate (~0.2%, matching the source's 8/5000).
    // Copy-0-bit-identity intentionally does not hold in this mode.
    val zipfVocab = sys.env.get("GRAFT_SCALEGEN_ZIPF").map(_.toInt)
    def withZipfText(df: DataFrame): DataFrame = zipfVocab match {
      case None => df
      case Some(v) =>
        import org.apache.spark.sql.{Encoders, Row}
        val schema = df.schema
        val idIdx = schema.fieldIndex("doc_id")
        val textIdx = schema.fieldIndex("text")
        val ncIdx = schema.fieldIndex("n_chars")
        val lnV = math.log(v.toDouble)
        df.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(idIdx)
            val key = id - (if (id % 500 == 499) 1 else 0)
            // splitmix64 stream seeded by the content key
            var x = key * 0x9e3779b97f4a7c15L + 0x2545f4914f6cdd1dL
            def next(): Long = {
              x += 0x9e3779b97f4a7c15L
              var z = x
              z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
              z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
              z ^ (z >>> 31)
            }
            val nTok = 30 + (next() >>> 40).toInt % 51
            val sb = new StringBuilder(nTok * 6)
            var i = 0
            while (i < nTok) {
              val u = ((next() >>> 11).toDouble + 0.5) / 9007199254740992.0
              // rank = ⌊V^u⌋ ∈ [1, V]: P(rank = r) ∝ ln(1+1/r) ≈ 1/r
              val rank = math.max(1L, math.min(v.toLong, math.exp(u * lnV).toLong))
              if (i > 0) sb.append(' ')
              sb.append('w').append(rank)
              i += 1
            }
            val text = sb.toString
            val seq = r.toSeq.toArray
            seq(textIdx) = text
            seq(ncIdx) = text.length.toLong
            Row.fromSeq(seq.toIndexedSeq)
          }
        }(Encoders.row(schema))
    }

    writeCopies("documents", withZipfText(t("documents")), Map("doc_id" -> docOff), copies,
      (d, k) => d
        // word-salt: every token gets a per-copy suffix => shingle sets
        // are disjoint across copies, intra-copy dup structure untouched
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1" + "x" + k))
        // cast back to long: length() is int, and a replica-of-a-replica
        // (the 100x/1000x decades) must keep the SOURCE schema or typed
        // kernels downstream see a narrowed column (r9: media synth CCE)
        .withColumn("n_chars", length(col("text")).cast("long")))

    writeCopies("embeddings", t("embeddings"), Map("vec_id" -> partOff), copies,
      (d, k) => d.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(col("vec_id"), i), lit(2001)) - lit(1000))
            .cast("double") / lit(10000.0)).cast("float"))))

    writeCopies("part", t("part"), Map("p_partkey" -> partOff), copies)
    writeCopies("supplier", t("supplier"), Map("s_suppkey" -> suppOff), copies)
    writeCopies("customer", t("customer"), Map("c_custkey" -> custOff), copies)
    writeCopies("orders", t("orders"),
      Map("o_orderkey" -> ordOff, "o_custkey" -> custOff), copies)
    writeCopies("lineitem", t("lineitem"),
      Map("l_orderkey" -> ordOff, "l_partkey" -> partOff,
        "l_suppkey" -> suppOff), copies * 2)
    writeCopies("events", t("events"),
      Map("event_id" -> eventOff, "user_id" -> userOff), copies)

    System.err.println(s"[scalegen] done -> $out (x$copies of $src)")
    spark.stop()
  }
}
