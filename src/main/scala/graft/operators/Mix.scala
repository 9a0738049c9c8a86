package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mixture sampling (beyond-reference LLM-pipeline op):
  * down-sample each domain/source to a target fraction when composing a
  * training mixture. The keep decision is a PURE FUNCTION of the row id —
  * a multiplicative-hash uniform, not `rand()` — so the sample is stable
  * under task retries, AQE re-planning and engine changes (Spark's rand
  * is none of these), reproducible row-by-row by the DuckDB oracle, and
  * needs no shuffle at all: the whole operator is one codegen'd filter.
  */
object Mix {

  /** Deterministic uniform in [0,1) from a non-negative integer id:
    * two-limb Knuth multiplicative hash folded mod 2^32. The limbs are
    * extracted with PURE BIT OPS (`& (2^20-1)`, `>> 20`) — every
    * intermediate stays an exact int64 (max product ~2^51.3), the final
    * value is < 2^32 so the double conversion and the division by 2^32
    * are both exact, and engines agree BITWISE.
    *
    * Why bit ops and not `/`: Spark's `Column./` is DOUBLE division (there
    * is no integral-divide in the Column DSL), so a `(id / M) % M` limb is
    * evaluated in floating point. The ~1e-5-scale perturbation it adds is
    * harmless until the hash lands within that distance of the 2^32 fold,
    * where the fmod WRAPS and the uniform flips from ~1.0 to ~0.0 —
    * a 1-in-1e5-ids divergence from the integer-arithmetic oracle,
    * invisible at 5k docs and caught by the 100x-replica oracle sweep
    * (doc_id 415338: exact 0.9999977, double-division 1.4e-6).
    */
  def uniform(id: Column): Column =
    hash32(id).cast("double") / 4294967296.0

  /** The integer hash behind [[uniform]]: exact int64 in [0, 2^32). Use
    * this (not the double) when the keep decision must stay in exact
    * integer arithmetic end-to-end (see [[temperatureSample]]).
    */
  def hash32(id: Column): Column =
    (id.bitwiseAND(lit(1048575L)) * 2654435761L +
      shiftright(id, 20).bitwiseAND(lit(1048575L)) * 40503L) % 4294967296L

  /** Keep each row iff its id-uniform lands under the row's group target
    * fraction (`fractions` by group value, `default` otherwise). Rows of a
    * group with fraction >= 1.0 always survive. `idCol` must be
    * non-negative integers.
    */
  def sampleByFraction(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      fractions: Map[String, Double],
      default: Double = 1.0): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0),
      "sampling fractions must be non-negative")
    val frac = fractions.foldLeft(lit(default)) { case (acc, (g, f)) =>
      when(col(groupCol) === g, lit(f)).otherwise(acc)
    }
    df.filter(uniform(col(idCol)) < frac)
  }

  /** Exact integer division a div b for non-negative long Columns whose
    * operands stay under 2^53: (a - a%b) is an exact multiple of b, so
    * the IEEE double division is exact and both engines agree bitwise.
    * (Spark's Column `/` is always DOUBLE division — same lesson as
    * [[uniform]]'s bit-op limbs.)
    */
  private def intDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Temperature-based mixture sampling (the multilingual-LM "alpha
    * sampling" of Conneau & Lample 2019 / mT5): re-weight domains by
    * p_d^alpha so rare domains keep proportionally more of their rows,
    * targeting ~`targetRows` total. Per-domain keep rates derive in
    * EXACT INTEGER micro-units from the domain counts:
    *
    *   w_d      = floor(sqrt-or-pow(n_d / N, alpha) * 1e6)   (int64)
    *   share_d  = (w_d * 1e6) div W                          (W = sum w_d)
    *   r_d      = min(1e6, (targetRows * share_d) div n_d)   (micro-rate)
    *   keep row = (hash32(id) * 1e6) div 2^32  <  r_d
    *
    * Every step after the one correctly-rounded sqrt (alpha = 0.5; pow
    * otherwise) is exact int64 arithmetic, so the DuckDB oracle
    * reproduces membership bit-for-bit. The keep decision is a pure
    * function of (id, domain counts): stable under retries/AQE, and the
    * only data movement is the domain-count aggregation (map-side
    * combined, #domains rows) broadcast back over the corpus — the scan
    * itself never shuffles.
    *
    * alpha = 1 recovers uniform downsampling to targetRows; alpha = 0
    * equal per-domain budgets; 0 < alpha < 1 the temperature in between.
    * Rates cap at 1.0 (no upsampling/replication — compose with an
    * explode for multi-epoch rare domains).
    */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      targetRows: Long,
      alpha: Double = 0.5): DataFrame = {
    require(targetRows > 0, "targetRows must be positive")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1] (got $alpha)")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val total = counts.agg(sum(col("__n")).as("__tot"))
    val frac = col("__n").cast("double") / col("__tot").cast("double")
    // sqrt is IEEE-correctly-rounded (pow is not): use it when alpha=0.5
    val powed =
      if (alpha == 0.5) sqrt(frac)
      else if (alpha == 0.0) lit(1.0)
      else if (alpha == 1.0) frac
      else pow(frac, lit(alpha))
    val weights = counts.crossJoin(broadcast(total))
      .withColumn("__w", floor(powed * lit(1e6)).cast("long"))
    val wTotal = weights.agg(sum(col("__w")).as("__wtot"))
    val rates = weights.crossJoin(broadcast(wTotal))
      .withColumn("__share", intDiv(col("__w") * 1000000L, col("__wtot")))
      .withColumn("__r_micro",
        least(lit(1000000L), intDiv(lit(targetRows) * col("__share"), col("__n"))))
      .select(col(groupCol), col("__r_micro"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(intDiv(hash32(col(idCol)) * 1000000L, lit(4294967296L)) <
        col("__r_micro"))
      .select(df.columns.toIndexedSeq.map(col) :+
        col("__r_micro").as("keep_rate_micro"): _*)
  }
}
