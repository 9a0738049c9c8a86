package graft.sources

import java.util

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.{GammaTable, VectorFieldDef}

/** A DSv2 `TableCatalog` over a warehouse of GammaTable roots — the last
  * piece of the SQL surface: with it, EVERY reference C-API lifecycle verb
  * (c_api/gamma_api.h:20-206) has a pure-SQL equivalent, including
  * CreateTable (gamma_api.h:35), which previously needed a Scala handle.
  *
  * ```
  * spark.sql.catalog.gamma            = graft.sources.GammaCatalog
  * spark.sql.catalog.gamma.warehouse  = /data/gamma
  *
  * CREATE NAMESPACE gamma.prod;
  * CREATE TABLE gamma.prod.items (
  *   _id STRING, p_size INT, vec ARRAY<FLOAT>
  * ) TBLPROPERTIES ('key'='_id', 'buckets'='64', 'vector.vec'='dim=64,metric=L2');
  * INSERT INTO gamma.prod.items SELECT ...;      -- AddOrUpdateDoc upserts
  * DELETE FROM gamma.prod.items WHERE p_size > 9; -- DelDocByFilter
  * SELECT * FROM gamma.prod.items VERSION AS OF 3; -- snapshot read
  * DROP TABLE gamma.prod.items;
  * ```
  *
  * Layout: `<warehouse>/<namespace...>/<table>` — a directory is a TABLE
  * iff it holds `meta/meta.json`, otherwise it is a namespace. Catalog
  * operations are driver-side filesystem metadata only (zero Spark jobs),
  * like every other manifest path in the engine; the catalog works
  * unchanged on HDFS/object-store Hadoop filesystems.
  *
  * Time travel: `VERSION AS OF n` resolves the retained `meta/v<n>.json`
  * manifest (commits keep their manifest history; the MVCC bucket layout
  * keeps superseded files until vacuum()). `TIMESTAMP AS OF t` maps t to
  * the newest version committed at or before t — the commit clock is the
  * manifest's own `committedAtMs` stamp (survives filesystem copies);
  * legacy pre-stamp manifests fall back to file mtime.
  */
class GammaCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catName: String = _
  private var warehouse: String = _

  private def spark = SparkSession.active
  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"gamma catalog '$name' needs a warehouse: " +
        s"SET spark.sql.catalog.$name.warehouse=<dir>")
  }

  override def name(): String = catName

  // identifier segments become path components — refuse separators and
  // traversal outright rather than trusting downstream normalization.
  // Path parses its string as a URI, so URI-special characters are
  // refused too: '#' starts a fragment and '?' a query ('a#b' would
  // silently collide onto directory 'a'), '%' percent-decodes, ':'
  // separates a scheme
  private val BadSegmentChars = Set('/', '\\', '#', '?', '%', ':', '\u0000')
  private def safeSegment(s: String): String = {
    require(s.nonEmpty && s != ".." && s != "." && !s.exists(BadSegmentChars),
      s"illegal name segment '$s'")
    s
  }

  private def dirOf(ns: Seq[String]): Path =
    new Path((warehouse +: ns.map(safeSegment)).mkString("/"))

  private def tableDir(ident: Identifier): Path =
    new Path(dirOf(ident.namespace.toIndexedSeq), safeSegment(ident.name))

  private def isTableDir(p: Path): Boolean =
    fs(p).exists(new Path(p, "meta/meta.json"))

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirOf(namespace.toIndexedSeq)
    val f = fs(dir)
    if (!f.exists(dir) || isTableDir(dir)) throw new NoSuchNamespaceException(namespace)
    f.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(isTableDir)
      .map(p => Identifier.of(namespace, p.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val p = tableDir(ident)
    if (!isTableDir(p)) throw new NoSuchTableException(ident)
    new GammaSqlTable(p.toString)
  }

  /** `VERSION AS OF <n>` — a read-only snapshot at commit n. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = tableDir(ident)
    if (!isTableDir(p)) throw new NoSuchTableException(ident)
    val v = scala.util.Try(version.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"gamma: VERSION AS OF expects a commit version number, got '$version'"))
    new GammaSqlTable(p.toString, Some(v))
  }

  /** `TIMESTAMP AS OF <t>` (t in microseconds from Spark): the newest
    * retained manifest committed at or before t. The commit clock is the
    * manifest's own `committedAtMs` stamp (survives filesystem copies);
    * legacy pre-stamp manifests fall back to file mtime.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = tableDir(ident)
    if (!isTableDir(p)) throw new NoSuchTableException(ident)
    new GammaSqlTable(p.toString,
      Some(GammaSql.versionAtTimestamp(p.toString, timestamp / 1000L)))
  }

  override def tableExists(ident: Identifier): Boolean = isTableDir(tableDir(ident))

  override def createTable(
      ident: Identifier,
      columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident.toString)
    require(partitions.isEmpty,
      "gamma tables hash-bucket by primary key internally ('buckets' table " +
        "property); PARTITIONED BY is not supported")
    val schema = StructType(columns.toIndexedSeq.map(c =>
      StructField(c.name, c.dataType, c.nullable)))
    val props = properties
    // a typo'd property must fail, not silently default ('bucket' vs
    // 'buckets', 'Vector.vec' vs 'vector.vec' — the same silent-typo
    // class GraftConfig.set guards on the runtime side). Spark-reserved
    // keys it injects on CREATE pass through.
    val sparkReserved = Set("provider", "owner", "location", "comment",
      "external", "is_managed_location", "option.path", "path")
    props.keySet().forEach { k =>
      require(k == "key" || k == "buckets" || k.startsWith("vector.") ||
        sparkReserved(k.toLowerCase(java.util.Locale.ROOT)),
        s"unknown table property '$k' (expected 'key', 'buckets', or " +
          "'vector.<column>')")
    }
    val key = Option(props.get("key")).getOrElse {
      require(schema.fieldNames.contains("_id"),
        "gamma CREATE TABLE needs TBLPROPERTIES ('key'='<column>') or an _id column")
      "_id"
    }
    val nBuckets = Option(props.get("buckets")).map(_.toInt).getOrElse(16)
    require(nBuckets > 0, s"buckets must be positive, got $nBuckets")
    // vector declarations: 'vector.<col>' = 'dim=64[,metric=L2][,store=FLOAT][,retrievalType=FLAT]'
    val vecFields = mutable.ArrayBuffer.empty[VectorFieldDef]
    props.forEach { (k, v) =>
      if (k.startsWith("vector.")) {
        val colName = k.stripPrefix("vector.")
        val kv = v.split(',').iterator.map(_.trim).filter(_.nonEmpty).map { pair =>
          val i = pair.indexOf('=')
          require(i > 0, s"bad vector property '$k'='$v' (expected k=v pairs)")
          pair.take(i).trim -> pair.drop(i + 1).trim
        }.toMap
        val unknown = kv.keySet -- Set("dim", "metric", "store", "retrievalType")
        require(unknown.isEmpty, s"unknown vector attribute(s) ${unknown.mkString(", ")} in '$k'")
        val dim = kv.getOrElse("dim",
          throw new IllegalArgumentException(s"vector property '$k' needs dim=<n>")).toInt
        vecFields += VectorFieldDef(colName, dim,
          metric = kv.getOrElse("metric", "L2"),
          retrievalType = kv.getOrElse("retrievalType", "FLAT"),
          store = kv.getOrElse("store", "FLOAT"))
      }
    }
    val root = tableDir(ident).toString
    GammaTable.createEmpty(spark, root, ident.name, key, schema,
      vecFields.toSeq, nBuckets)
    new GammaSqlTable(root)
  }

  override def createTable(ident: Identifier, info: TableInfo): Table =
    createTable(ident, info.columns(), info.partitions(), info.properties())

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "gamma: ALTER TABLE is not supported — schema evolves through writes " +
        "(new columns union in; see GammaTable.addOrUpdate)")

  override def dropTable(ident: Identifier): Boolean = {
    val p = tableDir(ident)
    // the ANN rewrite's lazy-load cache keys on the root path: a dropped
    // (or later re-created) table must not keep serving the old entry
    graft.plans.IndexCatalog.unregisterUnder(p.toString)
    isTableDir(p) && fs(p).delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    val to = tableDir(newIdent)
    if (!isTableDir(from)) throw new NoSuchTableException(oldIdent)
    if (isTableDir(to)) throw new TableAlreadyExistsException(newIdent.toString)
    graft.plans.IndexCatalog.unregisterUnder(from.toString)
    fs(to.getParent).mkdirs(to.getParent)
    if (!fs(from).rename(from, to))
      throw new java.io.IOException(s"rename $from -> $to failed")
  }

  // --------------------------------------------------------- procedures
  // `CALL <cat>.system.history|vacuum|compact('<ns>.<table>', ...)` — the
  // maintenance verbs a SQL-only deployment needs (storage GC was the
  // last Scala-only surface besides BuildIndex). See [[GammaProcedures]].

  private def rootForTableName(qualified: String): String = {
    val segs = qualified.split('.').toIndexedSeq
    require(segs.nonEmpty && segs.forall(_.nonEmpty),
      s"procedure table argument must be '<ns...>.<table>', got '$qualified'")
    val p = new Path(dirOf(segs.init), safeSegment(segs.last))
    if (!isTableDir(p)) throw new NoSuchTableException(
      Identifier.of(segs.init.toArray, segs.last))
    p.toString
  }

  override def loadProcedure(ident: Identifier): procedures.UnboundProcedure =
    GammaProcedures.load(ident.name(), rootForTableName).getOrElse(
      throw new RuntimeException(
        s"gamma catalog: unknown procedure '${ident.name()}' " +
          s"(have: ${GammaProcedures.names.mkString(", ")})"))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GammaProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray

  // --------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = dirOf(namespace.toIndexedSeq)
    val f = fs(dir)
    if (namespace.nonEmpty && (!f.exists(dir) || isTableDir(dir)))
      throw new NoSuchNamespaceException(namespace)
    if (!f.exists(dir)) return Array.empty
    f.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filterNot(isTableDir)
      .map(p => namespace :+ p.getName)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    val dir = dirOf(namespace.toIndexedSeq)
    if (!fs(dir).exists(dir) || isTableDir(dir))
      throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit = {
    val dir = dirOf(namespace.toIndexedSeq)
    if (fs(dir).exists(dir)) throw new NamespaceAlreadyExistsException(namespace)
    fs(dir).mkdirs(dir)
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("gamma: ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = dirOf(namespace.toIndexedSeq)
    val f = fs(dir)
    if (!f.exists(dir) || isTableDir(dir)) return false
    if (!cascade && f.listStatus(dir).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty (use CASCADE)")
    f.delete(dir, true)
  }
}
