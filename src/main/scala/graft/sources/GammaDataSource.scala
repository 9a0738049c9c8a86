package graft.sources

import java.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.{col, not}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, TableScan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.{GammaTable, TableMeta}

/** DataSource V2 reader for GammaTable roots — the SQL/catalog surface of
  * the engine (the reference is fully drivable through its C API,
  * c_api/gamma_api.h:20-206; this is the Spark-idiomatic equivalent: any
  * SQL client can read a table without a Scala-side handle).
  *
  * `spark.read.format("gamma").load(root)`, or in pure SQL
  * `CREATE TABLE t USING gamma OPTIONS (path '<root>')` /
  * `CREATE TEMPORARY VIEW v USING gamma OPTIONS (path '<root>')`.
  *
  * Semantics: LIVE documents only (`_deleted` rows filtered at the scan,
  * like every reference read path, common/gamma_common_data.h:99-108),
  * vector fields on the FLOAT surface (INT8-stored fields decode), and
  * `_docid` exposed (S4's dense docid). Storage internals (`_deleted`,
  * `_bucket`, `_version`) stay hidden.
  *
  * Scale design:
  *  - the manifest resolves driver-side with ZERO Spark jobs (schema is
  *    manifest-carried, never footer-inferred), and a Table handle pins
  *    the manifest version at creation — scans are snapshot-consistent
  *    under concurrent upserts;
  *  - pushed filters prune BUCKETS before any file is opened: range
  *    predicates against the manifest's per-bucket min/max stats, key
  *    equality/IN via the same driver-side hash twin the Scala point
  *    lookup uses (one bucket of N for `WHERE key = ...`);
  *  - the scan delegates row production to Spark's own parquet reader
  *    over exactly the pruned bucket-version files (V1Scan bridge), so
  *    vectorized decode, residual-filter pushdown into row groups, and
  *    column pruning all still apply inside.
  */
class GammaDataSource extends TableProvider with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSourceProvider {

  override def shortName(): String = "gamma"

  override def supportsExternalMetadata(): Boolean = false

  // ------------------------------------------------------------ streaming
  // `spark.readStream.format("gamma")` — the change-feed source
  // ([[GammaChangeSource]]): the batch table does not advertise
  // MICRO_BATCH_READ, so Spark falls back to this V1 stream provider.

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "gamma stream: the change-feed schema is " +
      "table-defined; drop the user-specified schema")
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "gamma stream requires a table root: .load(<root>)"))
    (shortName(), GammaChangeStream.schemaFor(root))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "gamma stream requires a table root: .load(<root>)"))
    new GammaChangeSource(sqlContext, root,
      GammaChangeStream.startingVersionOf(parameters),
      GammaChangeStream.schemaFor(root))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = GammaSql.rootOf(options)
    if (options.containsKey("changesFrom")) GammaChangeStream.schemaFor(root)
    else GammaSql.exposedSchema(
      GammaSql.metaAt(root, GammaSql.asOfOf(options)), root)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val root = GammaSql.rootOf(opts)
    if (opts.containsKey("changesFrom"))
      new GammaChangesTable(root,
        opts.get("changesFrom").toLong,
        Option(opts.get("changesTo")).map(_.toLong))
    else new GammaSqlTable(root, GammaSql.asOfOf(opts))
  }
}

/** One resolved gamma table. The manifest is re-read per SCAN (and per
  * write), not pinned at Table creation: a catalog entry or temp view
  * holds ONE Table instance across statements, so pinning here would
  * serve stale data after the view's own INSERT/DELETE. Each scan still
  * pins the manifest it read — snapshot-consistent within a query.
  *
  * `asOf` pins the table to a RETAINED manifest version instead — the
  * snapshot/time-travel surface (`VERSION AS OF n` through
  * [[GammaCatalog]], or `.option("versionAsOf", n)` on the reader): every
  * commit keeps `meta/v<N>.json`, and the MVCC bucket layout keeps the
  * superseded data files that manifest points at until vacuum(). A
  * snapshot is read-only — writes against it are refused.
  */
class GammaSqlTable(val root: String, val asOf: Option[Long] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  private def freshMeta: TableMeta = GammaSql.metaAt(root, asOf)

  override def name(): String =
    s"gamma(${freshMeta.name} @ $root${asOf.map(v => s" VERSION AS OF $v").getOrElse("")})"

  override def schema(): StructType = {
    val m = freshMeta
    GammaSql.exposedSchema(m, root)
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val m = freshMeta // pinned for this scan
    new GammaScanBuilder(root, m, GammaSql.exposedSchema(m, root))
  }

  /** `INSERT INTO ... USING gamma` (and `df.write.format("gamma")
    * .mode("append")`): V1Write bridge straight into the table's
    * upsert path — last-write-wins per key like the reference's
    * AddOrUpdateDoc (c_api/gamma_api.h:105-121), O(affected buckets).
    * Storage internals (`_docid` etc.) arriving as insert nulls are
    * dropped; the table assigns docids. INSERT OVERWRITE is refused
    * (use DELETE FROM + INSERT INTO — an overwrite that silently
    * truncates a serving table is a footgun, not a feature).
    */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    asOf.foreach(v => throw new UnsupportedOperationException(
      s"gamma: cannot write to a snapshot (VERSION AS OF $v) — writes go to the current table"))
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation: sources.InsertableRelation =
            new sources.InsertableRelation {
              override def insert(data: DataFrame, overwrite: Boolean): Unit = {
                if (overwrite) throw new UnsupportedOperationException(
                  "gamma: INSERT OVERWRITE is not supported; " +
                    "use DELETE FROM + INSERT INTO")
                val t = GammaTable.load(SparkSession.active, root)
                val clean = Seq(GammaTable.DocidCol, GammaTable.DeletedCol,
                  GammaTable.BucketCol, GammaTable.VersionCol)
                  .foldLeft(data)(_.drop(_))
                t.addOrUpdate(clean)
              }
            }
        }
    }
  }

  /** `DELETE FROM ... WHERE ...`: maps to the table's delete-by-query
    * path (R4 — bucket-rewriting logical delete, O(affected buckets)).
    * Only predicates expressible as Columns are accepted; Spark falls
    * back with a clear error otherwise (canDeleteWhere = false).
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    asOf.isEmpty && filters.forall(f => GammaSql.filterColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    asOf.foreach(v => throw new UnsupportedOperationException(
      s"gamma: cannot delete from a snapshot (VERSION AS OF $v)"))
    val t = GammaTable.load(SparkSession.active, root)
    val cond = filters.flatMap(GammaSql.filterColumn(_))
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    t.deleteByQuery(cond)
  }
}

private[sources] class GammaScanBuilder(
    root: String, meta: TableMeta, fullSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** All filters are accepted for PRUNING (bucket selection + inner
    * parquet pushdown) but every one is returned as residual: Spark
    * re-evaluates them above the scan, so pruning only ever has to be
    * conservative, never exact (null semantics, unsupported types).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GammaScan(root, meta, required, pushed)
}

private[sources] class GammaScan(
    root: String, meta: TableMeta, required: StructType,
    filters: Array[Filter]) extends Scan with V1Scan {

  private val keptBuckets: Seq[Long] = GammaSql.pruneBuckets(meta, filters)

  override def readSchema(): StructType = required

  // explain-visible: PlanSpecs assert the pruned fraction from this string
  override def description(): String =
    s"gamma ${meta.name} buckets=${keptBuckets.size}/${meta.bucketVersions.size} " +
      s"root=$root pushed=${filters.mkString(",")}"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new GammaV1Relation(context, root, meta, required, filters, keptBuckets,
      description()).asInstanceOf[T]
}

/** The V1 bridge relation: builds the inner DataFrame (pruned paths →
  * live-filter → int8 decode → residual filters → projection) and hands
  * its InternalRow RDD straight through (`needConversion = false`, the
  * standard delegation shape — the inner plan's unsafe rows feed the
  * parent scan without a Row round-trip).
  */
private[sources] class GammaV1Relation(
    context: SQLContext, root: String, meta: TableMeta,
    required: StructType, filters: Array[Filter], buckets: Seq[Long],
    desc: String)
    extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = context

  override def schema: StructType = required

  override def needConversion: Boolean = false

  override def toString: String = desc

  override def buildScan(): RDD[Row] = {
    val df = GammaSql.liveScan(
      context.sparkSession, root, meta, buckets, filters, required)
    df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

private[graft] object GammaSql {

  def rootOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "gamma source requires a table root: .load(<root>) or OPTIONS (path '<root>')")
    p
  }

  def metaFor(root: String): TableMeta = {
    val spark = SparkSession.active
    GammaTable.readMetaFor(spark, root)
  }

  /** Reader options for snapshot reads: `.option("versionAsOf", n)` pins a
    * commit version; `.option("timestampAsOf", "<ts|epoch-ms>")` resolves
    * the newest commit at or before the instant (same clock as the
    * catalog's TIMESTAMP AS OF). Mutually exclusive.
    */
  def asOfOf(options: CaseInsensitiveStringMap): Option[Long] = {
    val v = options.get("versionAsOf")
    val t = options.get("timestampAsOf")
    require(v == null || t == null,
      "gamma: versionAsOf and timestampAsOf are mutually exclusive")
    if (v != null)
      Some(scala.util.Try(v.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"gamma: versionAsOf must be a commit version number, got '$v'")))
    else if (t != null) {
      val ms = scala.util.Try(t.toLong).getOrElse(
        scala.util.Try(java.sql.Timestamp.valueOf(t).getTime).getOrElse(
          throw new IllegalArgumentException(
            s"gamma: timestampAsOf must be epoch millis or 'yyyy-MM-dd HH:mm:ss[.f]', got '$t'")))
      val root = rootOf(options)
      // memoized: inferSchema and getTable both resolve the same read's
      // options — without the memo a commit landing between the two calls
      // could pin the schema and the scan to DIFFERENT versions. The memo
      // is only semantically stable for timestamps strictly INSIDE the
      // committed history (stamps only grow, so an interior (root, ts)
      // can never resolve differently later); a ts at/after the NEWEST
      // stamp must keep re-resolving — a later commit with stamp <= ts
      // legitimately changes the answer — so boundary resolutions are
      // never cached. (The inferSchema->getTable pin then only holds up
      // to a commit landing between the two calls at the history edge —
      // in which case resolving the newer version is the correct answer.)
      if (tsResolveCache.size > 4096) tsResolveCache.clear()
      tsResolveCache.get((root, ms)).orElse {
        val (v, interior) = versionAtTimestampResolved(root, ms)
        if (interior) tsResolveCache.put((root, ms), v)
        Some(v)
      }
    } else None
  }

  // interior resolutions only (resolved version < newest retained) —
  // those are stable forever; boundary hits re-resolve every read
  private val tsResolveCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Long]

  /** The newest retained commit at or before `tsMillis`. The commit clock
    * is the manifest's own committedAtMs stamp (survives filesystem
    * copies); legacy pre-stamp manifests fall back to file mtime. Commits
    * are sequential (single-writer contract), so stamps are monotone in
    * version — resolution BINARY-SEARCHES the retained versions and reads
    * O(log n) manifests, not all n (at 10^5 retained commits the previous
    * shape paid 10^5 small reads per time-travel read).
    */
  def versionAtTimestamp(root: String, tsMillis: Long): Long =
    versionAtTimestampResolved(root, tsMillis)._1

  /** As [[versionAtTimestamp]], plus whether the resolution landed
    * strictly INSIDE the retained history (some retained version is
    * newer) — only interior answers are immutable and cacheable.
    */
  def versionAtTimestampResolved(root: String, tsMillis: Long): (Long, Boolean) = {
    val spark = SparkSession.active
    val metaDir = new org.apache.hadoop.fs.Path(s"$root/meta")
    val fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stampRe = "\"committedAtMs\":(\\d+)".r
    // ONE listing: version + status (the mtime rides along as the legacy
    // fallback so no extra getFileStatus is ever needed)
    val entries = fs.listStatus(metaDir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("v") && n.endsWith(".json"))
        scala.util.Try(n.stripPrefix("v").stripSuffix(".json").toLong).toOption
          .map(v => (v, st))
      else None
    }.sortBy(_._1)
    def stampOf(i: Int): Long = {
      val (_, st) = entries(i)
      graft.core.ManifestIO.readString(spark, st.getPath.toString)
        .flatMap(j => stampRe.findFirstMatchIn(j).map(_.group(1).toLong))
        .getOrElse(st.getModificationTime)
    }
    // rightmost version with stamp <= ts
    var lo = 0; var hi = entries.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (stampOf(mid) <= tsMillis) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (ans < 0) throw new IllegalArgumentException(
      s"gamma: no snapshot at $root at or before " +
        s"${java.time.Instant.ofEpochMilli(tsMillis)} " +
        s"(history: ${entries.map(_._1).mkString(", ")})")
    (entries(ans)._1, ans < entries.length - 1)
  }

  def metaAt(root: String, asOf: Option[Long]): TableMeta = asOf match {
    case Some(v) => GammaTable.readMetaVersionFor(SparkSession.active, root, v)
    case None => metaFor(root)
  }

  private val Internal =
    Set(GammaTable.DeletedCol, GammaTable.BucketCol, GammaTable.VersionCol)

  private def int8Fields(meta: TableMeta): Set[String] =
    meta.vectorFields.collect {
      case f if f.store != null && f.store.equalsIgnoreCase("INT8") => f.name
    }.toSet

  private def atRestSchema(meta: TableMeta, root: String): StructType =
    Option(meta.dataSchema) match {
      case Some(j) =>
        DataType.fromJson(j).asInstanceOf[StructType]
      case None =>
        // legacy manifest without the carried schema: one footer inference
        val paths = currentPaths(meta, root, Nil)
        SparkSession.active.read.parquet(paths: _*).schema
    }

  /** User-visible schema: at-rest order minus storage internals, INT8
    * vector structs surfaced as float arrays.
    */
  def exposedSchema(meta: TableMeta, root: String): StructType = {
    val i8 = int8Fields(meta)
    StructType(atRestSchema(meta, root).fields.toIndexedSeq
      .filterNot(f => Internal(f.name))
      .map { f =>
        if (i8(f.name) && f.dataType.isInstanceOf[StructType])
          StructField(f.name, ArrayType(FloatType), nullable = f.nullable)
        // _docid reads non-null but must be OMITTABLE on insert (the
        // table assigns docids; the writer drops the arriving nulls)
        else if (f.name == GammaTable.DocidCol) f.copy(nullable = true)
        else f
      })
  }

  def currentPaths(meta: TableMeta, root: String, buckets: Seq[Long]): Seq[String] = {
    val bv = meta.bucketVersions
    val sel = if (buckets.isEmpty) bv.keys.map(_.toLong).toSeq.sorted else buckets
    sel.flatMap(b => bv.get(b.toString).map(v => s"$root/data/b$b/v$v"))
  }

  /** Buckets that can hold matching rows given the pushed filters —
    * conservative: a bucket is dropped only when a filter PROVABLY
    * excludes it. Two prune sources, both manifest-only (no file opened):
    *  - numeric range/equality vs per-bucket min/max `bucketStats`
    *    (the manifest analog of the reference's per-field B-tree,
    *    table/field_range_index.cc:616-759);
    *  - key equality/IN on a STRING key via the driver-side hash twin
    *    ([[GammaTable.bucketOfValue]]) — the same routing a point lookup
    *    uses, so `WHERE key = ...` reads one bucket of N.
    */
  def pruneBuckets(meta: TableMeta, filters: Array[Filter]): Seq[Long] = {
    val all = meta.bucketVersions.keys.map(_.toLong).toSeq.sorted
    val stats = Option(meta.bucketStats).getOrElse(Map.empty)

    def num(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case _ => None
    }
    // bucket survives filter f? (missing stats => survive)
    def survives(b: Long, f: Filter): Boolean = {
      def bound(colName: String): Option[(Double, Double)] =
        stats.get(b.toString).flatMap(_.get(colName)).collect {
          case s if s.length == 2 => (s(0), s(1))
        }
      f match {
        case sources.EqualTo(c, v) =>
          num(v).flatMap(x => bound(c).map { case (mn, mx) => mn <= x && x <= mx })
            .getOrElse(true)
        case sources.GreaterThan(c, v) =>
          num(v).flatMap(x => bound(c).map { case (_, mx) => mx > x }).getOrElse(true)
        case sources.GreaterThanOrEqual(c, v) =>
          num(v).flatMap(x => bound(c).map { case (_, mx) => mx >= x }).getOrElse(true)
        case sources.LessThan(c, v) =>
          num(v).flatMap(x => bound(c).map { case (mn, _) => mn < x }).getOrElse(true)
        case sources.LessThanOrEqual(c, v) =>
          num(v).flatMap(x => bound(c).map { case (mn, _) => mn <= x }).getOrElse(true)
        case sources.In(c, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Number]) =>
          bound(c).map { case (mn, mx) =>
            vs.exists(v => { val x = v.asInstanceOf[Number].doubleValue(); mn <= x && x <= mx })
          }.getOrElse(true)
        case sources.And(l, r) => survives(b, l) && survives(b, r)
        // Or/Not/other: no safe manifest-level exclusion — keep the bucket
        case _ => true
      }
    }

    // key-hash routing: a top-level equality/IN on the string key confines
    // the scan to the hashed buckets (same ≤1024-value bound as the Scala
    // term-filter routing)
    def keyBuckets(f: Filter): Option[Set[Long]] = f match {
      case sources.EqualTo(c, v: String) if c == meta.keyField =>
        Some(Set(GammaTable.bucketOfValue(v, meta.nBuckets, Some(StringType))))
      case sources.In(c, vs)
          if c == meta.keyField && vs.nonEmpty && vs.length <= 1024 &&
            vs.forall(_.isInstanceOf[String]) =>
        Some(vs.map(v =>
          GammaTable.bucketOfValue(v, meta.nBuckets, Some(StringType))).toSet)
      case sources.And(l, r) =>
        (keyBuckets(l), keyBuckets(r)) match {
          case (Some(a), Some(b2)) => Some(a intersect b2)
          case (a, b2) => a.orElse(b2)
        }
      case _ => None
    }

    val hashConfined = filters.flatMap(keyBuckets(_))
      .reduceOption(_ intersect _)
    val base = hashConfined match {
      case Some(hb) => all.filter(hb)
      case None => all
    }
    base.filter(b => filters.forall(f => survives(b, f)))
  }

  /** Best-effort translation of pushed V1 filters back to Columns for the
    * INNER scan (parquet row-group pruning). Untranslatable filters are
    * skipped — they are residuals above the scan anyway.
    */
  def filterColumn(f: Filter): Option[Column] = f match {
    case sources.EqualTo(c, v) => Some(col(c) === v)
    case sources.EqualNullSafe(c, v) => Some(col(c) <=> v)
    case sources.GreaterThan(c, v) => Some(col(c) > v)
    case sources.GreaterThanOrEqual(c, v) => Some(col(c) >= v)
    case sources.LessThan(c, v) => Some(col(c) < v)
    case sources.LessThanOrEqual(c, v) => Some(col(c) <= v)
    case sources.In(c, vs) => Some(col(c).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(c) => Some(col(c).isNull)
    case sources.IsNotNull(c) => Some(col(c).isNotNull)
    case sources.StringStartsWith(c, v) => Some(col(c).startsWith(v))
    case sources.StringEndsWith(c, v) => Some(col(c).endsWith(v))
    case sources.StringContains(c, v) => Some(col(c).contains(v))
    case sources.And(l, r) =>
      for { a <- filterColumn(l); b <- filterColumn(r) } yield a && b
    case sources.Or(l, r) =>
      for { a <- filterColumn(l); b <- filterColumn(r) } yield a || b
    case sources.Not(x) => filterColumn(x).map(not)
    case _ => None
  }

  /** The inner DataFrame the bridge executes: pruned bucket files →
    * live-doc filter → INT8 decode (only for REQUIRED vector fields) →
    * translated residual filters → exact required projection.
    */
  def liveScan(
      spark: SparkSession, root: String, meta: TableMeta,
      buckets: Seq[Long], filters: Array[Filter],
      required: StructType): DataFrame = {
    val paths = currentPaths(meta, root, buckets)
    val needed = required.fieldNames.toSet
    if (paths.isEmpty) {
      return spark.createDataFrame(
        new util.ArrayList[Row](), required)
    }
    val atRest = atRestSchema(meta, root)
    var df = spark.read.schema(atRest).parquet(paths: _*)
      .filter(!col(GammaTable.DeletedCol))
    val i8 = int8Fields(meta)
    atRest.fields.foreach { f =>
      if (needed(f.name) && i8(f.name) && f.dataType.isInstanceOf[StructType])
        df = df.withColumn(f.name, graft.functions.Quant.int8Decode(col(f.name)))
    }
    // filters reference only exposed columns (Spark pushed them against
    // the exposed schema) — decoded-surface semantics hold after decode
    filters.flatMap(filterColumn).foreach(c => df = df.filter(c))
    // project to EXACTLY the required schema (order and presence); an
    // empty projection (count(*) scan) still needs the row stream
    if (required.isEmpty) df.select()
    else df.select(required.fieldNames.toIndexedSeq.map(col): _*)
  }
}
