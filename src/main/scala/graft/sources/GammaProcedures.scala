package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.table.GammaTable

/** SQL-callable maintenance verbs (`CALL <catalog>.system.<proc>(...)`)
  * — the storage-GC half of the lifecycle exposed through the DSv2
  * procedure surface, so a SQL-only deployment needs a Scala handle for
  * nothing but BuildIndex:
  *
  * {{{
  * CALL gamma.system.history('prod.items');
  * CALL gamma.system.vacuum('prod.items', retain => 2);
  * CALL gamma.system.compact('prod.items');                 -- full
  * CALL gamma.system.compact('prod.items', 0.3);            -- per-bucket
  * }}}
  *
  * All three are driver-side orchestration over the same GammaTable verbs
  * the Scala surface uses; results come back as one bounded LocalScan
  * (history is bounded by commit count, the others return one row).
  */
private[sources] object GammaProcedures {

  /** `resolveRoot(tableName)` maps 'ns.table' (catalog-relative) to the
    * table's root path, enforcing the catalog's segment hygiene.
    */
  def load(procName: String, resolveRoot: String => String): Option[UnboundProcedure] =
    procName.toLowerCase(java.util.Locale.ROOT) match {
      case "history" => Some(HistoryProc(resolveRoot))
      case "vacuum" => Some(VacuumProc(resolveRoot))
      case "compact" => Some(CompactProc(resolveRoot))
      case _ => None
    }

  val names: Seq[String] = Seq("history", "vacuum", "compact")

  private def spark = SparkSession.active

  private case class ResultScan(schema: StructType, data: Array[InternalRow])
      extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = data
  }

  private def one(schema: StructType, values: Any*): util.Iterator[Scan] =
    util.Collections.singletonList[Scan](
      ResultScan(schema, Array(InternalRow.fromSeq(values)))).iterator()

  private abstract class Proc(procName: String) extends UnboundProcedure
      with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
  }

  private case class HistoryProc(resolveRoot: String => String)
      extends Proc("history") {
    override def description(): String =
      "commit history of a gamma table, newest first (DESCRIBE HISTORY analog)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val root = resolveRoot(input.getUTF8String(0).toString)
      val rows = GammaTable.history(spark, root).collect().map { r =>
        InternalRow.fromSeq(Seq(
          r.getLong(0),
          if (r.isNullAt(1)) null else r.getLong(1),
          r.getLong(2), r.getLong(3),
          UTF8String.fromString(r.getString(4))))
      }
      util.Collections.singletonList[Scan](ResultScan(StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("committed_at_ms", LongType, nullable = true),
        StructField("max_docid", LongType, nullable = false),
        StructField("buckets", LongType, nullable = false),
        StructField("index_status", StringType, nullable = false))), rows))
        .iterator()
    }
  }

  private case class VacuumProc(resolveRoot: String => String)
      extends Proc("vacuum") {
    override def description(): String =
      "remove bucket version dirs superseded past the retention window"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("retain", IntegerType).defaultValue("0").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val root = resolveRoot(input.getUTF8String(0).toString)
      val retain = if (input.isNullAt(1)) 0 else input.getInt(1)
      val removed = GammaTable.load(spark, root).vacuum(retainSnapshots = retain)
      one(StructType(Seq(
        StructField("removed_dirs", IntegerType, nullable = false))), removed)
    }
  }

  private case class CompactProc(resolveRoot: String => String)
      extends Proc("compact") {
    override def description(): String =
      "physically purge tombstones: full rewrite, or per-bucket past a deleted ratio"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      // negative = full compaction; otherwise the CompactIfNeed policy
      ProcedureParameter.in("max_deleted_ratio", DoubleType)
        .defaultValue("-1.0").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val root = resolveRoot(input.getUTF8String(0).toString)
      val ratio = if (input.isNullAt(1)) -1.0 else input.getDouble(1)
      val t = GammaTable.load(spark, root)
      val n =
        if (ratio < 0) { t.compact(); t.meta.bucketVersions.size }
        else t.compactIfNeeded(ratio).size
      one(StructType(Seq(
        StructField("compacted_buckets", IntegerType, nullable = false))), n)
    }
  }
}
