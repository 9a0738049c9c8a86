package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful exact dedup of a DOCUMENT STREAM — the ingest-time half of the
  * batch dedup family (dedup/Dedup.scala): a digest is admitted the first
  * microbatch it appears in and suppressed forever after. This is the
  * standing de-duplication stage of a training-data ingestion pipeline
  * (dedupe-before-store), where the batch operators are the
  * dedupe-at-rest pass.
  *
  * Scale design: state is ONE small entry per distinct digest keyed by the
  * digest itself, so the state store partitions by digest hash and grows
  * with |distinct docs|, not |stream|; at 100 TB run it on the RocksDB
  * state store provider and feed digests, never raw text, through the
  * shuffle. For time-bounded streams prefer [[withinWatermark]], which
  * drops state once the watermark passes (bounded memory, the usual
  * trade: re-admits a dup that arrives later than the delay).
  */
object StreamDedup {

  /** One row per first-seen digest: `(digest, keeper, ...carried cols)`.
    *
    * Deterministic keeper contract: within the FIRST microbatch containing
    * a digest, the minimum id wins (the group iterator sees the whole
    * batch's group, so this is exact per batch). When upstream delivers
    * batches in ascending id order — an ingest log replay — the keeper is
    * the GLOBAL minimum id, i.e. exactly the batch operator's
    * `Dedup.exactGroups` keeper.
    *
    * Built on `flatMapGroupsWithState` rather than the built-in
    * `dropDuplicates` because the latter keeps an ARBITRARY row per key
    * within a batch; a dedup stage whose keeper changes run to run cannot
    * be oracle-checked (nor audited in production).
    */
  def firstSeen(stream: DataFrame, idCol: String, textCol: String): Dataset[(String, Long)] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(md5(col(textCol)).as("digest"), col(idCol).cast("long").as("id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (digest: String, rows: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator((digest, rows.map(_._2).min))
          }
      }
  }

  /** Watermark-bounded dedup via the built-in operator: admits the first
    * arrival per digest and drops that digest's state once the event-time
    * watermark passes `delay` — bounded state for unbounded streams.
    */
  def withinWatermark(
      stream: DataFrame, textCol: String,
      eventTimeCol: String, delay: String): DataFrame =
    stream
      .withColumn("digest", md5(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("digest")

  /** Streaming MinHash-LSH near-dup: verified near-duplicate PAIRS
    * `(a, b, jaccard)` emitted the microbatch the SECOND member of a pair
    * arrives — the streaming twin of `Dedup.minhashPairs`, for catching
    * near-dups at ingest instead of in a dedupe-at-rest pass.
    *
    * Shape: ONE stateful operator keyed by LSH band bucket
    * (flatMapGroupsWithState; state = the doc ids seen in that bucket), so
    * candidate generation shuffles band keys and ids, never text. A new
    * arrival pairs with the bucket's standing members; the candidate then
    * rides a STATELESS stream-static join against `staticDocs`' hashed
    * shingle sets for exact-Jaccard verification (same kernel, threshold,
    * and rounding as the batch operator — the two emit identical verified
    * pairs).
    *
    * Contract: AT-LEAST-ONCE per pair — a pair sharing several buckets is
    * emitted once per shared bucket (buckets cannot see each other's
    * emissions without a second stateful stage, which structured streaming
    * does not compose after this one); consumers take `.dropDuplicates`/
    * `distinct()` at the sink, where it is a trivial batch op. Replayed
    * docs are suppressed (a bucket member pairs only against ids it has
    * not seen). State per bucket is O(ids in bucket); at 100 TB run the
    * RocksDB state store and shard by raising `bands`.
    */
  def nearDupPairs(
      stream: DataFrame,
      staticDocs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleN: Int = 3): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val r = numHashes / bands
    // (id, band, key) per arriving doc — the batch operator's banding,
    // stateless over the stream
    val banded = graft.dedup.Dedup
      .withMinhashSignature(stream, idCol, textCol, numHashes, shingleN)
      .select(col("id").cast("long").as("id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            array_join(transform(slice(col("sig"), b * r + 1, r),
              x => x.cast("string")), "_").as("key"))
        }: _*)).as("bk"))
      .select(col("bk.band"), col("bk.key"), col("id"))
      .as[(Int, String, Long)]
    val candidates = banded
      .groupByKey { case (band, key, _) => s"${band}_$key" }
      .flatMapGroupsWithState[Seq[Long], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Int, String, Long)], state: GroupState[Seq[Long]]) =>
          val seen = state.getOption.getOrElse(Nil)
          val fresh = rows.map(_._3).toArray.distinct.sorted
            .filterNot(seen.contains)
          if (fresh.isEmpty) Iterator.empty
          else {
            state.update(seen ++ fresh)
            // pair each fresh id with every standing member AND every
            // smaller fresh id (intra-batch pairs), a < b
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
            var i = 0
            while (i < fresh.length) {
              val d = fresh(i)
              seen.foreach(s => out += ((math.min(s, d), math.max(s, d))))
              var j = 0
              while (j < i) { out += ((fresh(j), d)); j += 1 }
              i += 1
            }
            out.iterator
          }
      }
      .toDF("a", "b")
    // exact verification: stateless stream-static equi-joins against the
    // corpus' hashed shingle sets, then the batch verify kernel.
    // localCheckpoint: streaming re-executes the static subtree EVERY
    // microbatch — unmaterialized, that is a full-corpus re-shingling pass
    // per trigger; materialized once, each trigger joins against blocks
    val toks = graft.dedup.Dedup.withShingles(staticDocs, idCol, textCol, shingleN)
      .localCheckpoint(true)
    val pairs = candidates
      .join(toks.select(col("id").as("a"), col("toks").as("ta")), Seq("a"))
      .join(toks.select(col("id").as("b"), col("toks").as("tb")), Seq("b"))
    graft.dedup.Dedup.pairJaccard(pairs, threshold)
  }

  /** Streaming decontamination — the ingest-time twin of
    * `Dedup.decontaminate`: drop every arriving doc that shares at least
    * `minHits` distinct word n-grams with the (static) evaluation corpus.
    *
    * STATELESS by construction: a doc arrives whole in one microbatch and
    * the eval set never changes mid-stream, so contamination is a pure
    * per-doc decision. The eval grams materialize ONCE into a sorted
    * primitive hash array (the same 8-byte md5-derived hashes as the
    * batch op) broadcast to every microbatch; each arriving doc counts
    * shared grams by a linear merge of two sorted arrays with an early
    * exit at `minHits` — no state store, no shuffle, no join. Same
    * flag/keep decision as the batch operator on every doc.
    *
    * The eval gram set collects to the driver (like every broadcast): an
    * eval benchmark is tiny next to the corpus; for a giant holdout run
    * the batch `decontaminate(broadcastEval = false)` at rest instead.
    */
  def decontaminated(
      stream: DataFrame,
      textCol: String,
      evalDocs: DataFrame,
      evalTextCol: String,
      shingleN: Int = 3,
      minHits: Int = 1,
      hashChars: Int = 15): DataFrame = {
    require(minHits >= 1, s"minHits must be >= 1 (got $minHits)")
    val spark = stream.sparkSession
    import spark.implicits._
    val hashes = graft.dedup.Dedup.withShingles(
        evalDocs.select(col(evalTextCol))
          .withColumn("__eid", monotonically_increasing_id()),
        "__eid", evalTextCol, shingleN, hashChars)
      .select(explode(col("toks")).as("g")).distinct()
      .as[Long].collect()
    java.util.Arrays.sort(hashes)
    val bc = spark.sparkContext.broadcast(hashes)
    val tIdx = stream.schema.fieldIndex(textCol)
    val schema = stream.schema
    val n = shingleN
    val mh = minHits
    val hc = hashChars
    stream.mapPartitions { rows =>
      val ev = bc.value
      rows.filter { r =>
        // hashedShingles is sorted distinct (ShingleHash contract; null
        // text hashes to the empty set, so one bad record cannot abort
        // the stream) — linear merge against the sorted eval array,
        // stop at minHits
        val hs = graft.dedup.ShingleHash.hashedShingles(
          if (r.isNullAt(tIdx)) null else r.getString(tIdx), n, hc)
        var i = 0; var j = 0; var inter = 0
        while (i < hs.length && j < ev.length && inter < mh) {
          val a = hs(i); val b = ev(j)
          if (a == b) { inter += 1; i += 1; j += 1 }
          else if (a < b) i += 1
          else j += 1
        }
        inter < mh // keep = NOT contaminated
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
