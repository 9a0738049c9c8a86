package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus statistics — bounded-state sketches maintained at
  * ingest, verified exactly at rest.
  */
object StreamStats {

  /** Streaming Misra-Gries heavy-hitter candidates: a complete-mode
    * GLOBAL typed aggregate whose state is ONE serialized k-slot summary
    * (never per-item rows) — each microbatch's map-side partial sketches
    * merge into the standing buffer, so state is O(k) for an unbounded
    * stream. Emits `(items map<string,bigint>, seen bigint)` per
    * trigger; the mergeable-summary bound (undercount ≤ seen/(k+1),
    * superset guarantee above it) holds across ANY batch arrival order,
    * which is what makes the downstream exact recount
    * ([[graft.text.HeavyHitters.verify]]) arrival-order independent —
    * the sketch-at-ingest / verify-at-rest architecture.
    */
  def heavyHitterCandidates(
      stream: DataFrame, itemCol: String, k: Int): DataFrame =
    stream
      .groupBy()
      .agg(graft.functions.mg_sketch(col(itemCol), k).as("sketch"))
      .select(col("sketch.items").as("items"), col("sketch.seen").as("seen"))

  /** Streaming HyperLogLog registers: the SAME declarative register
    * aggregation as the batch sketch ([[graft.sketch.Sketches
    * .hllRegisters]]) run in complete mode — `max(rho)` is idempotent
    * and order-free, so after any prefix of the stream the standing
    * state IS the batch register table of the rows seen so far
    * (bounded at 2^p rows per group), and the final estimate is
    * bit-equal to the batch gate's. Estimate at rest with
    * [[graft.sketch.Sketches.hllEstimate]] over the sink.
    */
  def hllRegisters(
      stream: DataFrame,
      groupCols: Seq[String],
      key: org.apache.spark.sql.Column): DataFrame =
    graft.sketch.Sketches.hllRegisters(stream, groupCols, key)
}
