package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch CRUD semantics of the reference engine, as pure DataFrame
  * transformations (state-in, state-out).
  *
  * Reference behavior being reproduced:
  *  - upsert (add-or-update by `_id`): reference search/gamma_engine.cc:619-800
  *  - batch upsert with in-batch duplicate resolution (last write wins):
  *    reference search/gamma_engine.cc:676-759
  *  - delete by key / delete by query (tombstone bitmap):
  *    reference search/gamma_engine.cc:802-949
  *
  * Scale design: these run as key-partitioned joins; the delta side is
  * typically small → Catalyst broadcasts it. In a production deployment the
  * base table is bucketed by `key` so the anti-join is co-partitioned and
  * only affected buckets are rewritten (see graft.table.GammaTable).
  */
object Crud {

  /** Last-write-wins dedup of a batch by key. `orderCol` (e.g. a batch
    * sequence number) decides the winner; when absent, an arbitrary-but-
    * deterministic max over the remaining columns is NOT attempted —
    * `dropDuplicates` semantics are used instead.
    */
  def dedupLastWins(batch: DataFrame, key: String, orderCol: Option[String]): DataFrame =
    orderCol match {
      case Some(o) =>
        val w = Window.partitionBy(col(key)).orderBy(col(o).desc)
        batch.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      case None => batch.dropDuplicates(key)
    }

  /** Add-or-update: rows in `delta` replace same-key rows in `base`;
    * fresh keys are appended. Equivalent to
    * `MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`.
    */
  def upsert(
      base: DataFrame,
      delta: DataFrame,
      key: String,
      orderCol: Option[String] = None): DataFrame = {
    // orderCol is batch-sequence metadata, not part of the table schema
    val d = orderCol.foldLeft(dedupLastWins(delta, key, orderCol))(_.drop(_))
    base.join(d.select(key), Seq(key), "left_anti").unionByName(d)
  }

  /** Delete by key set (R3). */
  def deleteByKeys(base: DataFrame, keys: DataFrame, key: String): DataFrame =
    base.join(keys.select(key).distinct(), Seq(key), "left_anti")

  /** Delete by predicate (R4); returns the surviving state. */
  def deleteWhere(base: DataFrame, pred: Column): DataFrame =
    base.filter(!coalesce(pred, lit(false)))

  /** Delete by predicate, returning the deleted keys (the reference returns
    * the deleted ids as JSON, search/gamma_engine.cc:826-949).
    */
  def deletedKeys(base: DataFrame, pred: Column, key: String): DataFrame =
    base.filter(coalesce(pred, lit(false))).select(key)
}
