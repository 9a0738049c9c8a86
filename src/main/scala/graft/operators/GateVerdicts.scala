package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-adjudicable verdicts for the approximate-by-design gates.
  *
  * The driver's correctness harness hashes a gate's output against a
  * DuckDB oracle; raw approximate output (ANN top-k at partial probes,
  * LSH pair sets) has no SQL-statable oracle, so until round 9 those four
  * gates were rows-only (`no_oracle`) and their recall/soundness evidence
  * lived only in ScalaTest specs. These helpers move that adjudication
  * INTO the gate output: each gate emits a small `(metric, value, pass)`
  * table where every row is statable by the oracle —
  *  - structural invariants the engine must satisfy unconditionally
  *    (coverage, per-query row counts, subset-of-exact, conservation),
  *    whose expected values the oracle computes from the raw tables;
  *  - recall-vs-exact floors at the gate's documented threshold, where
  *    the ENGINE computes both arms (approximate and exact baseline) and
  *    emits the boolean; the oracle states the floor and `pass = TRUE`.
  * A recall regression or broken invariant flips `pass` and the driver's
  * hash compare goes red — the gate is adjudicated, not merely non-empty.
  *
  * The exact arms make these gates deliberately HEAVIER than the
  * approximate operator alone (a brute-force baseline rides inside);
  * they are verification gates, not throughput probes — the QPS numbers
  * live in Bench's dedicated sections.
  */
object GateVerdicts {

  private val schema = StructType(Seq(
    StructField("metric", StringType, nullable = false),
    StructField("value", LongType, nullable = false),
    StructField("pass", BooleanType, nullable = false)))

  private def verdictDf(s: SparkSession, rows: Seq[(String, Long, Boolean)]): DataFrame = {
    val data = rows.map { case (m, v, p) => Row(m, v, p) }
    s.createDataFrame(java.util.Arrays.asList(data: _*), schema)
  }

  /** ANN verdict: `approx` and `exact` are (qid, id) top-k result frames
    * over the same query batch. Emits coverage (distinct qids — the
    * oracle recomputes the expected count from the table), exact-k row
    * counts per query, and a recall floor in milli-units.
    */
  def knnVerdict(
      s: SparkSession, approx: DataFrame, exact: DataFrame,
      k: Int, recallFloorMilli: Long, reliable: Boolean = false): DataFrame = {
    // materialize each arm ONCE: the stats below are several independent
    // actions (agg, count, join-count, distinct-count), and without a
    // checkpoint every action re-executes the arm's ENTIRE upstream plan —
    // index build + search / BM25 + fusion ran 2-3x per gate. The
    // checkpointed frames are k-bounded (nq x k rows), so the pin is tiny
    // at any scale. `reliable` switches the pins to fault-tolerant
    // checkpoints for cluster runs (graft.core.Pin contract).
    val a = graft.core.Pin(
      approx.select(col(approx.columns(0)).as("qid"), col(approx.columns(1)).as("id")),
      reliable, "knnVerdict")
    val e = graft.core.Pin(
      exact.select(col(exact.columns(0)).as("qid"), col(exact.columns(1)).as("id")),
      reliable, "knnVerdict")
    val perQuery = a.groupBy("qid").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("nq"), min("n").as("lo"), max("n").as("hi"))
      .head()
    val (nq, lo, hi) = (perQuery.getLong(0), perQuery.getLong(1), perQuery.getLong(2))
    val exactN = e.count()
    val hits = a.join(e, Seq("qid", "id")).count()
    val recallMilli = if (exactN == 0) 1000L else hits * 1000L / exactN
    System.err.println(s"[verdict] knn recall_milli=$recallMilli (floor $recallFloorMilli)")
    verdictDf(s, Seq(
      ("queries_covered", nq, nq == e.select("qid").distinct().count()),
      ("k_rows_each", k.toLong, lo == k.toLong && hi == k.toLong),
      ("recall_vs_exact_ge_milli", recallFloorMilli, recallMilli >= recallFloorMilli)))
  }

  /** LSH near-dup verdict vs the exact all-pairs baseline. `lsh` and
    * `brute` are (a, b[, cos]) pair frames at the same threshold. The
    * brute pair count is a REAL cross-engine check: the oracle recomputes
    * it with its own quadratic scan.
    */
  def pairsVerdict(
      s: SparkSession, lsh: DataFrame, brute: DataFrame,
      recallFloorMilli: Long, reliable: Boolean = false): DataFrame = {
    // materialize each arm ONCE (same rationale as knnVerdict): count +
    // except are separate actions, and unmaterialized each re-ran the full
    // candidate join + verify. The checkpointed frames are the
    // threshold-filtered pair sets — the operator's own output size.
    val l = graft.core.Pin(lsh.select("a", "b"), reliable, "pairsVerdict")
    val b = graft.core.Pin(brute.select("a", "b"), reliable, "pairsVerdict")
    val nLsh = l.count()
    val nBrute = b.count()
    val notInBrute = l.except(b).count()
    val recallMilli = if (nBrute == 0) 1000L else nLsh * 1000L / nBrute
    System.err.println(s"[verdict] lsh pairs=$nLsh brute=$nBrute " +
      s"recall_milli=$recallMilli (floor $recallFloorMilli)")
    verdictDf(s, Seq(
      ("brute_pairs", nBrute, true),
      ("lsh_pairs_not_in_brute", notInBrute, notInBrute == 0L),
      ("recall_vs_brute_ge_milli", recallFloorMilli, recallMilli >= recallFloorMilli)))
  }

  /** SemDeDup verdict vs the exact dedup baseline: conservation (keepers
    * + losers partition the corpus — the oracle recomputes the corpus
    * count), soundness (every semantic loser is a brute-force loser:
    * within-cluster pairs ⊆ all pairs, so SemDeDup can only UNDER-drop),
    * and a loser-recall floor.
    */
  def dedupVerdict(
      s: SparkSession, allIds: DataFrame, keptIds: DataFrame,
      bruteLoserIds: DataFrame, recallFloorMilli: Long,
      reliable: Boolean = false): DataFrame = {
    // materialize each id set ONCE (same rationale as knnVerdict): `kept`
    // is the full semantic-dedup pipeline (k-means + in-cluster pairs) and
    // was re-executed by every action below. Id projections only — one
    // narrow column pinned, distributed across executors.
    val all = graft.core.Pin(allIds.toDF("id"), reliable, "dedupVerdict")
    val kept = graft.core.Pin(keptIds.toDF("id"), reliable, "dedupVerdict")
    val bruteLosers = graft.core.Pin(bruteLoserIds.toDF("id"), reliable, "dedupVerdict")
    val total = all.count()
    val keptN = kept.count()
    val semLosers = graft.core.Pin(all.except(kept), reliable, "dedupVerdict")
    val semN = semLosers.count()
    val violations = semLosers.except(bruteLosers).count()
    val bruteN = bruteLosers.count()
    val recallMilli = if (bruteN == 0) 1000L else semN * 1000L / bruteN
    System.err.println(s"[verdict] semdedup losers=$semN brute=$bruteN " +
      s"recall_milli=$recallMilli (floor $recallFloorMilli)")
    verdictDf(s, Seq(
      ("rows_conserved", keptN + semN, keptN + semN == total),
      ("losers_not_in_brute", violations, violations == 0L),
      ("loser_recall_vs_brute_ge_milli", recallFloorMilli, recallMilli >= recallFloorMilli)))
  }
}
