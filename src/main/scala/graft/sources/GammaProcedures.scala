package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.table.GammaTable

/** SQL-callable lifecycle verbs (`CALL <catalog>.system.<proc>(...)`)
  * exposed through the DSv2 procedure surface — with build_index, a
  * SQL-only deployment needs NO Scala handle for anything:
  *
  * {{{
  * CALL gamma.system.history('prod.items');
  * CALL gamma.system.vacuum('prod.items', retain => 2);
  * CALL gamma.system.compact('prod.items');                 -- full
  * CALL gamma.system.compact('prod.items', 0.3);            -- per-bucket
  * CALL gamma.system.build_index('prod.items', 'vec',
  *                               retrieval_type => 'IVFPQ',
  *                               ncentroids => 64, nsubvector => 16);
  * }}}
  *
  * All are driver-side orchestration over the same GammaTable verbs the
  * Scala surface uses; results come back as one bounded LocalScan
  * (history is bounded by its cap, the others return one row).
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
      case "build_index" => Some(BuildIndexProc(resolveRoot))
      case _ => None
    }

  val names: Seq[String] = Seq("history", "vacuum", "compact", "build_index")

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
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("limit", IntegerType).defaultValue("10000").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val root = resolveRoot(input.getUTF8String(0).toString)
      // history is bounded by vacuum retention, but the driver collect
      // gets an EXPLICIT cap too (newest-first, so a cap keeps the rows
      // a DESCRIBE HISTORY user actually wants)
      val cap = if (input.isNullAt(1)) 10000 else input.getInt(1)
      val rows = GammaTable.history(spark, root, cap).collect().map { r =>
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

  /** `CALL <cat>.system.build_index(table, field, ...)` — the facade's
    * BuildIndex verb (reference c_api/gamma_api.h:131,
    * gamma_engine.cc:996-1010) on the SQL surface: builds a PERSISTED
    * index (lists + quantizers + manifest at rest under `root/index/`),
    * which the ANN rewrite's lazy loader then serves to SQL top-k queries
    * with no Scala handle anywhere — the last Scala-only verb closed.
    * Common knobs are named parameters with the Scala-side defaults; all
    * callers are expected to use `name => value` syntax past `field`.
    */
  private case class BuildIndexProc(resolveRoot: String => String)
      extends Proc("build_index") {
    override def description(): String =
      "build and persist an ANN index over a vector field (BuildIndex analog)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("field", StringType).build(),
      ProcedureParameter.in("retrieval_type", StringType)
        .defaultValue("'IVFFLAT'").build(),
      ProcedureParameter.in("metric", StringType).defaultValue("'L2'").build(),
      ProcedureParameter.in("ncentroids", IntegerType).defaultValue("-1").build(),
      ProcedureParameter.in("nprobe", IntegerType).defaultValue("80").build(),
      ProcedureParameter.in("nsubvector", IntegerType).defaultValue("8").build(),
      ProcedureParameter.in("nbits", IntegerType).defaultValue("8").build(),
      ProcedureParameter.in("recall_num", IntegerType).defaultValue("100").build(),
      ProcedureParameter.in("nlinks", IntegerType).defaultValue("32").build(),
      ProcedureParameter.in("ef_construction", IntegerType).defaultValue("200").build(),
      ProcedureParameter.in("ef_search", IntegerType).defaultValue("64").build(),
      ProcedureParameter.in("indexing_size", LongType).defaultValue("0").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val root = resolveRoot(input.getUTF8String(0).toString)
      val field = input.getUTF8String(1).toString
      def str(i: Int, d: String) =
        if (input.isNullAt(i)) d else input.getUTF8String(i).toString
      def int(i: Int, d: Int) = if (input.isNullAt(i)) d else input.getInt(i)
      val rt = str(2, "IVFFLAT").toUpperCase(java.util.Locale.ROOT)
      val metric = graft.core.Metric.withName(str(3, "L2") match {
        case m if m.equalsIgnoreCase("l2") => "L2"
        case m if m.equalsIgnoreCase("ip") || m.equalsIgnoreCase("innerproduct") => "IP"
        case m if m.equalsIgnoreCase("hamming") => "Hamming"
        case m => m
      })
      val params = graft.index.IndexParams(
        metric = metric,
        ncentroids = int(4, -1), nprobe = int(5, 80),
        nsubvector = int(6, 8), nbits = int(7, 8), recallNum = int(8, 100),
        nlinks = int(9, 32), efConstruction = int(10, 200), efSearch = int(11, 64))
      val indexingSize = if (input.isNullAt(12)) 0L else input.getLong(12)
      val t = GammaTable.load(spark, root)
      val ix = t.buildIndex(field, params, indexingSize, persist = true, rt)
      // a SQL session served the OLD (or no) index through the rewrite's
      // memo until its negative-recheck lapsed — drop the root's entries
      // so the very next top-k query probes the fresh lists
      graft.plans.IndexCatalog.unregister(t.root)
      one(StructType(Seq(
        StructField("field", StringType, nullable = false),
        StructField("retrieval_type", StringType, nullable = false),
        StructField("built_version", LongType, nullable = false),
        StructField("index_dir", StringType, nullable = false))),
        UTF8String.fromString(field), UTF8String.fromString(rt),
        ix.indexedThroughVersion,
        UTF8String.fromString(s"${t.root}/index/${ix.indexDirName}"))
    }
  }
}
