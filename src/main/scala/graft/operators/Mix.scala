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
    * two-limb Knuth multiplicative hash folded mod 2^32, kept within
    * overflow-free int64 range (every product is < 2^51, so the SAME
    * arithmetic runs in engines with checked overflow, e.g. DuckDB).
    * Division by 2^32 is exact in double — engines agree bitwise.
    */
  def uniform(id: Column): Column =
    (((id % 1048573L) * 2654435761L + ((id / 1048573L) % 1048573L) * 40503L)
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
