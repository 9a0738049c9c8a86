package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Column <-> Expression conversion.
  * Lives in the `org.apache.spark.sql` namespace solely to reach
  * `classic.ExpressionUtils`; keep this file tiny — all real code stays in
  * the `graft` packages.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Execute a resolved logical plan as a DataFrame (the classic
    * `Dataset.ofRows`, private[sql]) — the DML commands re-enter the
    * DataFrame API on the exact analyzed sub-plans (attribute ids intact,
    * so condition/assignment expressions resolve without re-binding).
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap an InternalRow RDD as a (streaming-flagged) DataFrame — V1
    * streaming `Source.getBatch` must return `isStreaming = true` frames
    * (MicroBatchExecution asserts it), and the only constructor for that
    * is the session-private `internalCreateDataFrame`.
    */
  def streamingDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
