package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 reader for the TEXMEX vector file formats the reference
  * loads its benchmark corpora from (S12 — `fvecs_read`,
  * reference tests/test.h:274-304; same layout for `.ivecs`/`.bvecs`):
  * every record is a little-endian `int32 d` header followed by `d`
  * components (float32 / int32 / uint8), with `d` constant per file.
  *
  * `spark.read.format("vecs").load("/data/sift/base.fvecs")` yields
  * `(row_id BIGINT, vec ...)` where `row_id` is the record's global
  * position across the (path-sorted) input files — the implicit vector id
  * the TEXMEX ground-truth files refer to.
  *
  * Scale design: the fixed record size makes files SPLITTABLE at exact
  * record boundaries, so one 100 GB fvecs file fans out across executors
  * as byte-range partitions (`maxSplitBytes`, default 128 MB) instead of
  * one reader; column pruning is pushed down — a `count()`/`row_id`-only
  * scan reads NO vector bytes at all (partition row counts come from file
  * sizes alone).
  */
class VecsDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "vecs"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Vecs.schemaFor(Vecs.kindOf(options, Vecs.inputFiles(options).headOption))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new VecsTable(options)
  }
}

private[sources] class VecsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  private val files = Vecs.inputFiles(options)
  private val kind = Vecs.kindOf(options, files.headOption)

  override def name(): String = s"vecs(${files.map(_.getPath).mkString(",")})"

  override def schema(): StructType = Vecs.schemaFor(kind)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new VecsScanBuilder(files, kind, options)
}

private[sources] class VecsScanBuilder(
    files: Seq[FileStatus], kind: Vecs.Kind, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = Vecs.schemaFor(kind)

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new VecsScan(files, kind, required, options)
}

private[sources] class VecsScan(
    files: Seq[FileStatus], kind: Vecs.Kind, required: StructType,
    options: CaseInsensitiveStringMap) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"vecs ${kind.ext}, ${files.size} files, columns=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val maxSplit = math.max(1L << 20,
      Option(options.get("maxSplitBytes")).map(_.toLong).getOrElse(128L * 1024 * 1024))
    val out = Array.newBuilder[InputPartition]
    var baseRowId = 0L
    files.foreach { st =>
      val dim = Vecs.headerDim(st.getPath, conf)
      val rec = Vecs.recordBytes(kind, dim)
      require(st.getLen % rec == 0,
        s"${st.getPath}: size ${st.getLen} is not a multiple of the " +
          s"$rec-byte record (dim=$dim ${kind.ext}) — corrupt or mis-typed file")
      val nRecords = st.getLen / rec
      // record-aligned byte-range splits
      val recsPerSplit = math.max(1L, maxSplit / rec)
      var start = 0L
      while (start < nRecords) {
        val n = math.min(recsPerSplit, nRecords - start)
        out += VecsPartition(st.getPath.toString, start * rec, n, dim,
          kind.ext, baseRowId + start)
        start += n
      }
      baseRowId += nRecords
    }
    out.result()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    new VecsReaderFactory(conf, required)
  }
}

private[sources] case class VecsPartition(
    file: String, startByte: Long, numRecords: Long, dim: Int,
    kindExt: String, baseRowId: Long) extends InputPartition

private[sources] class VecsReaderFactory(
    conf: SerializableConfiguration, required: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[VecsPartition]
    new VecsPartitionReader(p, conf.value, required)
  }
}

private[sources] class VecsPartitionReader(
    p: VecsPartition, conf: Configuration, required: StructType)
    extends PartitionReader[InternalRow] {

  private val kind = Vecs.kinds(p.kindExt)
  private val needVec = required.fieldNames.contains("vec")
  private val rowIdAt = required.fieldNames.indexOf("row_id")
  private val vecAt = required.fieldNames.indexOf("vec")
  private val recBytes = Vecs.recordBytes(kind, p.dim).toInt // dim < 1e6 -> fits

  // a vec-free projection (count(), row_id-only) reads NOTHING: the row
  // count is fully determined by the file size at planning time
  private val in =
    if (!needVec) null
    else {
      val path = new Path(p.file)
      val s = path.getFileSystem(conf).open(path)
      s.seek(p.startByte)
      s
    }
  private val buf = new Array[Byte](recBytes)
  private var i = 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (i >= p.numRecords) return false
    val values = new Array[Any](required.length)
    if (rowIdAt >= 0) values(rowIdAt) = p.baseRowId + i
    if (needVec) {
      in.readFully(buf)
      val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      val d = bb.getInt
      if (d != p.dim)
        throw new java.io.IOException(
          s"${p.file}: record ${p.baseRowId + i} header dim $d != file dim ${p.dim}")
      if (vecAt >= 0) values(vecAt) = kind.ext match {
        case "fvecs" =>
          val a = new Array[Float](d); bb.asFloatBuffer().get(a)
          UnsafeArrayData.fromPrimitiveArray(a)
        case "ivecs" =>
          val a = new Array[Int](d); bb.asIntBuffer().get(a)
          UnsafeArrayData.fromPrimitiveArray(a)
        case "bvecs" =>
          util.Arrays.copyOfRange(buf, 4, 4 + d)
      }
    }
    current = new GenericInternalRow(values)
    i += 1
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (in != null) in.close()
}

/** Format metadata + driver-side helpers (fixture/export writer, header
  * probe, file listing).
  */
object Vecs {

  /** elemBytes = bytes per component after the int32 dim header. */
  final case class Kind(ext: String, elemBytes: Int)

  val kinds: Map[String, Kind] = Map(
    "fvecs" -> Kind("fvecs", 4),
    "ivecs" -> Kind("ivecs", 4),
    "bvecs" -> Kind("bvecs", 1))

  def recordBytes(kind: Kind, dim: Int): Long = 4L + kind.elemBytes.toLong * dim

  def schemaFor(kind: Kind): StructType = {
    val vecType: DataType = kind.ext match {
      case "fvecs" => ArrayType(FloatType, containsNull = false)
      case "ivecs" => ArrayType(IntegerType, containsNull = false)
      // packed uint8 codes land as the engine's binary-field surface
      case "bvecs" => BinaryType
    }
    StructType(Seq(
      StructField("row_id", LongType, nullable = false),
      StructField("vec", vecType, nullable = false)))
  }

  /** Kind from the `format` option or the first file's extension. */
  private[sources] def kindOf(
      options: CaseInsensitiveStringMap, first: Option[FileStatus]): Kind = {
    val byOpt = Option(options.get("vecformat")).map(_.toLowerCase(java.util.Locale.ROOT))
    val byExt = first.map(_.getPath.getName).flatMap { n =>
      n.lastIndexOf('.') match { case -1 => None; case i => Some(n.substring(i + 1)) }
    }
    val ext = byOpt.orElse(byExt).getOrElse(
      throw new IllegalArgumentException(
        "cannot determine vecs format: pass .fvecs/.ivecs/.bvecs files or vecformat option"))
    kinds.getOrElse(ext,
      throw new IllegalArgumentException(s"unsupported vecs format $ext"))
  }

  /** Resolve `path`/`paths` options to a path-sorted file list (glob and
    * directory expansion included) — path order DEFINES `row_id`.
    */
  private[sources] def inputFiles(options: CaseInsensitiveStringMap): Seq[FileStatus] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val raw: Seq[String] =
      Option(options.get("paths")).map(parseJsonArray).getOrElse(
        Option(options.get("path")).map(Seq(_)).getOrElse(
          throw new IllegalArgumentException("vecs source requires a path")))
    val out = raw.flatMap { s =>
      val p = new Path(s)
      val fs = p.getFileSystem(conf)
      val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      require(matched.nonEmpty, s"vecs path matches nothing: $s")
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq
            .filter(f => f.isFile && kinds.keys.exists(k => f.getPath.getName.endsWith(s".$k")))
        else Seq(st)
      }
    }
    out.sortBy(_.getPath.toString)
  }

  private def parseJsonArray(s: String): Seq[String] = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.readValue(s, classOf[Array[String]]).toSeq
  }

  /** Leading int32 header = the file's (constant) dimension. */
  private[sources] def headerDim(path: Path, conf: Configuration): Int = {
    val in = path.getFileSystem(conf).open(path)
    try {
      val b = new Array[Byte](4)
      in.readFully(b)
      val d = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
      require(d > 0 && d < 1000000, s"$path: unreasonable dimension $d")
      d
    } finally in.close()
  }

  /** One record in the TEXMEX codec: int32 dim header + components. */
  private def recordArray(k: Kind, v: Array[Float]): Array[Byte] = {
    val bb = ByteBuffer.allocate(recordBytes(k, v.length).toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(v.length)
    k.ext match {
      case "fvecs" => v.foreach(bb.putFloat)
      case "ivecs" => v.foreach(f => bb.putInt(f.toInt))
      case "bvecs" => v.foreach(f => bb.put(f.toInt.toByte))
    }
    bb.array()
  }

  /** Driver-side fixture/export writer (the reverse of `fvecs_read` — for
    * test fixtures and handing corpora to TEXMEX-consuming tools). For
    * corpora that do not fit one writer, use [[exportPartitioned]].
    */
  def write(
      spark: SparkSession, path: String, kind: String,
      rows: Iterator[Array[Float]]): Unit = {
    val k = kinds(kind)
    val p = new Path(path)
    val out = p.getFileSystem(spark.sessionState.newHadoopConf()).create(p, true)
    try rows.foreach(v => out.write(recordArray(k, v)))
    finally out.close()
  }

  /** Distributed bulk export: write `df`'s `vecCol` (array of float — the
    * engine's vector surface; ivecs/bvecs convert per component like
    * [[write]]) as ONE `part-NNNNN.<kind>` file per partition under `dir`,
    * plus a `_SUCCESS` marker. File names sort in partition order, so a
    * vecs-source re-read of `dir` assigns `row_id`s consecutively across
    * partitions; pass `orderCol` to make that a GLOBAL total order
    * (range-partition + in-partition sort ⇒ row_id == rank in `orderCol`
    * order, the TEXMEX ground-truth id contract). Returns records written.
    *
    * Scale design: no driver materialization and no shuffle beyond the
    * optional range partitioning — each task streams its partition through
    * the record codec straight to the filesystem. Task retries are safe:
    * an attempt writes `part-NNNNN.<kind>.attempt-<id>` and renames into
    * place; the loser of a duplicate-attempt race (speculation) deletes
    * its temp — both attempts carry identical bytes, so either winner is
    * correct. Pre-existing part files in `dir` are removed first
    * (overwrite semantics), so a re-export with fewer partitions cannot
    * leave stale tails.
    *
    * FILESYSTEM CONTRACT: the commit relies on atomic single-writer-wins
    * `rename` — HDFS/POSIX semantics. On object stores (S3A) rename is a
    * non-atomic copy+delete, so a speculative duplicate attempt can
    * interleave with the winner; export to HDFS/local and upload, or run
    * with speculation off when `dir` is an object store.
    */
  def exportPartitioned(
      df: org.apache.spark.sql.DataFrame,
      vecCol: String,
      dir: String,
      kind: String,
      orderCol: Option[String] = None,
      numPartitions: Int = 0): Long = {
    val spark = df.sparkSession
    val k = kinds(kind)
    // validate BEFORE the destructive cleanup below — a bad-argument call
    // must not wipe a previous valid export and then throw
    val isBinaryCol = df.schema(vecCol).dataType ==
      org.apache.spark.sql.types.BinaryType
    require(!isBinaryCol || k.ext == "bvecs",
      s"a BinaryType vector column exports as bvecs, not .${k.ext}")
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    fs.mkdirs(dirPath)
    // overwrite semantics across EVERY kind: a re-export with a different
    // kind must not leave the old kind's parts behind (the reader would
    // ingest both mixed and validateExport would flag strays)
    kinds.keys.foreach { x =>
      Option(fs.globStatus(new Path(dirPath, s"part-*.$x*")))
        .foreach(_.foreach(st => fs.delete(st.getPath, false)))
    }
    fs.delete(new Path(dirPath, "_SUCCESS"), false)

    val arranged = orderCol match {
      case Some(c) =>
        val n = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
        df.repartitionByRange(n, org.apache.spark.sql.functions.col(c))
          .sortWithinPartitions(c)
      case None =>
        if (numPartitions > 0) df.repartition(numPartitions) else df
    }
    val ext = k.ext
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // BinaryType vector columns (the engine's packed-code surface) export
    // straight to bvecs — no float adapter round-trip
    val parts =
      if (isBinaryCol) {
        writeTasks[Array[Byte]](
          arranged.select(col(vecCol).as("v")).as[Array[Byte]],
          dir, ext, conf, { b =>
            val bb = ByteBuffer.allocate(4 + b.length).order(ByteOrder.LITTLE_ENDIAN)
            bb.putInt(b.length); bb.put(b); bb.array()
          })
      } else if (k.ext == "ivecs") {
        // integer-typed path: routing ivecs through array<float> would
        // silently corrupt components above 2^24 (float32 mantissa) —
        // TEXMEX ground-truth ids in billion-scale corpora exceed that
        writeTasks[Array[Int]](
          arranged.select(col(vecCol).cast("array<int>").as("v")).as[Array[Int]],
          dir, ext, conf, { v =>
            val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
            bb.putInt(v.length); v.foreach(bb.putInt); bb.array()
          })
      } else {
        val kk = k
        writeTasks[Array[Float]](
          arranged.select(col(vecCol).cast("array<float>").as("v")).as[Array[Float]],
          dir, ext, conf, v => Vecs.recordArray(kk, v))
      }
    val written = parts.map(_._2).sum
    // _SUCCESS doubles as a manifest: per-part record counts let a reader
    // (or validateExport) detect truncated/missing/extra part files
    // without trusting file sizes alone
    val manifest = parts.sortBy(_._1)
      .map { case (p, c) => s""""${partName(p, ext)}":$c""" }
      .mkString(s"""{"records":$written,"parts":{""", ",", "}}")
    val out = fs.create(new Path(dirPath, "_SUCCESS"), true)
    try out.write(manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    written
  }

  /** 9-digit padding keeps path-sort == partition order past 1e5 parts;
    * the ONLY definition of the part-file format (writer + manifest).
    */
  private[sources] def partName(pid: Int, ext: String): String = f"part-$pid%09d.$ext"

  /** Re-derive every part file's record count from its size and dim
    * header and compare against the `_SUCCESS` manifest — catches
    * truncated, missing, or stray part files after transport. Throws with
    * a per-file diagnosis on any mismatch.
    */
  def validateExport(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val sPath = new Path(dirPath, "_SUCCESS")
    require(fs.exists(sPath), s"$dir: no _SUCCESS manifest — incomplete export")
    val in = fs.open(sPath)
    val manifest = try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      m.readTree(in)
    } finally in.close()
    // a zero-byte _SUCCESS (plain Spark marker / pre-manifest export)
    // parses to a missing node — diagnose instead of NPEing below
    require(manifest != null && manifest.has("parts") && manifest.has("records"),
      s"$dir: _SUCCESS carries no manifest (empty or pre-manifest export) — " +
        "re-export to validate record counts")
    val declared = {
      val parts = manifest.get("parts")
      val it = parts.fieldNames()
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) { val f = it.next(); b += (f -> parts.get(f).asLong()) }
      b.result()
    }
    val actual = fs.listStatus(dirPath).toSeq
      .filter(st => st.isFile && kinds.keys.exists(x => st.getPath.getName.endsWith(s".$x")))
      .map { st =>
        val name = st.getPath.getName
        val ext = name.substring(name.lastIndexOf('.') + 1)
        val dim = headerDim(st.getPath, conf)
        val rec = recordBytes(kinds(ext), dim)
        require(st.getLen % rec == 0,
          s"$name: size ${st.getLen} is not a multiple of the $rec-byte record — truncated?")
        (name, st.getLen / rec)
      }.toMap
    val problems =
      declared.collect {
        case (f, c) if !actual.contains(f) => s"$f: in manifest, file missing"
        case (f, c) if actual(f) != c      => s"$f: manifest says $c records, file holds ${actual(f)}"
      } ++
      actual.keys.filterNot(declared.contains).map(f => s"$f: stray file not in manifest")
    require(problems.isEmpty, s"$dir: export validation failed — ${problems.mkString("; ")}")
    val total = manifest.get("records").asLong()
    require(declared.values.sum == total,
      s"$dir: manifest parts sum ${declared.values.sum} != records $total")
  }

  /** One export task per partition: stream records through `encode` into
    * `part-NNNNNNNNN.<ext>` with an attempt-safe rename commit (9-digit
    * padding keeps path-sort == partition order past 1e5 partitions).
    * Returns (partition id, records written) per non-empty partition.
    */
  private def writeTasks[T](
      ds: org.apache.spark.sql.Dataset[T],
      dir: String, ext: String,
      conf: SerializableConfiguration,
      encode: T => Array[Byte]): Seq[(Int, Long)] =
    ds.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        // partName is the single source of the format — the manifest keys
        // must match the written files byte-for-byte
        val fin = new Path(dir, Vecs.partName(pid, ext))
        val tmp = new Path(dir, s"${Vecs.partName(pid, ext)}.attempt-${tc.taskAttemptId()}")
        val tfs = fin.getFileSystem(conf.value)
        val out = new java.io.BufferedOutputStream(tfs.create(tmp, true), 1 << 16)
        var n = 0L
        try it.foreach { v => out.write(encode(v)); n += 1 }
        finally out.close()
        if (!tfs.rename(tmp, fin)) {
          // a sibling attempt already committed identical bytes
          tfs.delete(tmp, false)
          if (!tfs.exists(fin))
            throw new java.io.IOException(s"vecs export commit failed for $fin")
        }
        Iterator.single((pid, n))
      }
    }(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaInt, org.apache.spark.sql.Encoders.scalaLong))
      .collect().toSeq
}
