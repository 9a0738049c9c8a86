package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.GammaTable

/** Structured-Streaming read of a gamma table's change feed:
  *
  * {{{
  * spark.readStream.format("gamma")
  *   .option("startingVersion", 0)   // default 0 = full replay
  *   .load(root)
  * }}}
  *
  * Offsets are COMMIT VERSIONS: each micro-batch is
  * `GammaTable.changes(lastOffset, newOffset]` — the net upsert/delete
  * events of the commits that landed since the previous batch, with
  * `_change_type` / `_change_version` columns. This is the external
  * surface of exactly the delta the engine's own index/BM25 maintenance
  * consumes ([[graft.table.GammaTable.docsChangedSince]]); the reference's
  * migration source plays the same role for its replicas
  * (storage/migrate_data.cc:1-136).
  *
  * Scale design: offset discovery is ONE driver-side manifest-version
  * read per poll (no Spark job, no file listing); each batch reads only
  * the bucket versions that moved in its window (O(churn)). Ranges
  * retired by `vacuum()` fail the stream loudly rather than serving a
  * hole — restart from a retained snapshot + fresh `startingVersion`.
  */
class GammaChangeSource(
    sqlContext: SQLContext,
    root: String,
    startingVersion: Long,
    override val schema: StructType) extends Source {

  private def spark = sqlContext.sparkSession

  override def getOffset: Option[OffsetV1] =
    GammaTable.persistedVersion(spark, root)
      .filter(_ > startingVersion)
      .map(v => GammaStreamOffset(v))

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val fromV = start.map(GammaStreamOffset.versionOf).getOrElse(startingVersion)
    val toV = GammaStreamOffset.versionOf(end)
    val t = GammaTable.load(spark, root)
    val batch = t.changes(fromV, toV)
    // V1 contract: the returned frame must be streaming-flagged; hand the
    // (lazy) executed RDD through — the plan still runs distributed when
    // the micro-batch executes
    org.apache.spark.sql.graft.Bridge.streamingDataFrame(
      spark, batch.queryExecution.toRdd, batch.schema)
  }

  override def stop(): Unit = ()
}

case class GammaStreamOffset(version: Long) extends OffsetV1 {
  override def json: String = version.toString
}

object GammaStreamOffset {
  /** Restarted streams hand back SerializedOffset(json) — parse either. */
  def versionOf(o: OffsetV1): Long = o match {
    case GammaStreamOffset(v) => v
    case other => other.json.trim.toLong
  }
}

/** Batch read of the change feed through the same `gamma` format:
  * {{{
  * spark.read.format("gamma")
  *   .option("changesFrom", 1).option("changesTo", 3)  // window (1, 3]
  *   .load(root)
  * }}}
  * `changesTo` defaults to the version committed when the scan is built
  * (pinned per scan, snapshot-consistent). Read-only — the SQL analog of
  * `GammaTable.changes` for external CDC consumers without a Scala
  * handle.
  */
class GammaChangesTable(
    val root: String, fromVersion: Long, toVersion: Option[Long])
    extends Table with SupportsRead {

  override def name(): String =
    s"gamma-changes($root (${fromVersion}, ${toVersion.getOrElse("current")}])"

  override def schema(): StructType = GammaChangeStream.schemaFor(root)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with V1Scan {
        // pin the window at scan build: a concurrent commit cannot move
        // the upper bound mid-query
        private val toV = toVersion.orElse(
          GammaTable.persistedVersion(SparkSession.active, root)).getOrElse(0L)
        override def readSchema(): StructType = schema()
        override def description(): String =
          s"gamma-changes $root ($fromVersion, $toV]"
        override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
            with org.apache.spark.sql.sources.TableScan](
            context: org.apache.spark.sql.SQLContext): T =
          new org.apache.spark.sql.sources.BaseRelation
              with org.apache.spark.sql.sources.TableScan {
            override def sqlContext: org.apache.spark.sql.SQLContext = context
            override def schema: StructType = GammaChangeStream.schemaFor(root)
            override def needConversion: Boolean = false
            override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
              val t = GammaTable.load(context.sparkSession, root)
              t.changes(fromVersion, toV).queryExecution.toRdd
                .asInstanceOf[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
            }
          }.asInstanceOf[T]
      }
    }
}

private[sources] object GammaChangeStream {

  def startingVersionOf(parameters: Map[String, String]): Long =
    parameters.get("startingVersion").map { s =>
      scala.util.Try(s.toLong).getOrElse(throw new IllegalArgumentException(
        s"gamma stream: startingVersion must be a commit version, got '$s'"))
    }.getOrElse(0L)

  /** Change-feed schema: the exposed read schema plus the change columns. */
  def schemaFor(root: String): StructType = {
    val meta = GammaSql.metaFor(root)
    StructType(GammaSql.exposedSchema(meta, root).fields.toIndexedSeq ++ Seq(
      StructField(GammaTable.ChangeTypeCol, StringType, nullable = false),
      StructField(GammaTable.ChangeVersionCol, LongType, nullable = true)))
  }
}
