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
    ((id.bitwiseAND(lit(1048575L)) * 2654435761L +
      shiftright(id, 20).bitwiseAND(lit(1048575L)) * 40503L)
      % 4294967296L).cast("double") / 4294967296.0

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
}
