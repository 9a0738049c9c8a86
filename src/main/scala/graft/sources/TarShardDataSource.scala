package graft.sources

import java.util

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 reader for tar-shard corpora — the WebDataset layout
  * large multimodal training sets ship in: the corpus is a directory of
  * `.tar` shards, each holding (entry name, payload bytes) records, and
  * the SHARD is the unit of parallelism (entries within a shard are
  * sequential; shards are independent).
  *
  * `spark.read.format("tarshard").load("/corpus/shard-*.tar")` yields
  * `(shard STRING, entry STRING, length BIGINT, data BINARY)`.
  *
  * Scale design: one InputPartition per shard file — a 100 TB corpus at
  * the conventional ~1 GB/shard fans out as ~100k independent
  * partitions with zero split coordination, which is exactly how the
  * format is meant to parallelize (tar has no random access, so
  * byte-range splitting is impossible; shard sizing is the producer's
  * contract). Column pruning is pushed down: a metadata-only projection
  * (`entry`/`length`/counts) SKIPS every payload via the tar stream's
  * seek path instead of materializing file bytes.
  *
  * No codec/media interpretation happens here (this container has no
  * image/audio libs — see MediaOps): payloads stay opaque `binary`,
  * feeding the typed-metadata + batched-decode plumbing downstream.
  */
class TarShardDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "tarshard"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TarShards.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new TarShardTable(options)
  }
}

private[sources] class TarShardTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  private val files = TarShards.inputFiles(options)

  override def name(): String = s"tarshard(${files.size} shards)"

  override def schema(): StructType = TarShards.schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new TarShardScanBuilder(files)
}

private[sources] class TarShardScanBuilder(files: Seq[FileStatus])
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = TarShards.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new TarShardScan(files, required)
}

private[sources] class TarShardScan(files: Seq[FileStatus], required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"tarshard, ${files.size} shards, columns=[${required.fieldNames.mkString(",")}]"

  // one partition per shard: the format's atomic unit of parallelism
  override def planInputPartitions(): Array[InputPartition] =
    files.map(st => TarShardPartition(st.getPath.toString): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    new TarShardReaderFactory(conf, required)
  }
}

private[sources] case class TarShardPartition(file: String) extends InputPartition

private[sources] class TarShardReaderFactory(
    conf: SerializableConfiguration, required: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TarShardPartition]
    new TarShardPartitionReader(p, conf.value, required)
  }
}

private[sources] class TarShardPartitionReader(
    p: TarShardPartition, conf: Configuration, required: StructType)
    extends PartitionReader[InternalRow] {

  private val shardAt = required.fieldNames.indexOf("shard")
  private val entryAt = required.fieldNames.indexOf("entry")
  private val lengthAt = required.fieldNames.indexOf("length")
  private val dataAt = required.fieldNames.indexOf("data")

  private val path = new Path(p.file)
  private val shardName = UTF8String.fromString(path.getName)
  private val in = {
    val raw = path.getFileSystem(conf).open(path)
    // gz shards decompress through; entry-skipping still avoids
    // MATERIALIZING payloads, but the bytes must stream past — size
    // compressed shards for that (the producer's contract anyway)
    val base: java.io.InputStream =
      if (TarShards.isGz(p.file))
        new org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream(raw)
      else raw
    new TarArchiveInputStream(base)
  }
  private var current: InternalRow = _

  override def next(): Boolean = {
    // getNextEntry skips any unread payload of the previous entry via the
    // stream's skip path — a data-pruned scan never materializes bytes
    var e: TarArchiveEntry = in.getNextEntry
    while (e != null && !e.isFile) e = in.getNextEntry
    if (e == null) return false
    val values = new Array[Any](required.length)
    if (shardAt >= 0) values(shardAt) = shardName
    if (entryAt >= 0) values(entryAt) = UTF8String.fromString(e.getName)
    if (lengthAt >= 0) values(lengthAt) = e.getSize
    if (dataAt >= 0) {
      val buf = new Array[Byte](e.getSize.toInt)
      var off = 0
      while (off < buf.length) {
        val n = in.read(buf, off, buf.length - off)
        if (n < 0) throw new java.io.EOFException(
          s"${p.file}:${e.getName}: truncated at $off of ${buf.length}")
        off += n
      }
      values(dataAt) = buf
    }
    current = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = in.close()
}

object TarShards {

  val schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("entry", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("data", BinaryType, nullable = false)))

  private[sources] def inputFiles(options: CaseInsensitiveStringMap): Seq[FileStatus] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val raw = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("tarshard source requires a path"))
    val p = new Path(raw)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    require(matched.nonEmpty, s"tarshard path matches nothing: $raw")
    val out = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(f => f.isFile && (f.getPath.getName.endsWith(".tar")
            || isGz(f.getPath.getName)))
      else Seq(st)
    }
    out.sortBy(_.getPath.toString)
  }

  private[sources] def isGz(name: String): Boolean =
    name.endsWith(".tar.gz") || name.endsWith(".tgz")

  /** Write `df` as tar shards under `dir` (`shard-NNNNN.tar`), one shard
    * per output partition: rows hash-route by entry name (a pure
    * function — stable under retries), entries sort within each shard,
    * and entry mtimes pin to 0, so the produced BYTES are deterministic.
    * Executors write their own shard directly to the target filesystem —
    * no driver collect, no shuffle beyond the one hash route.
    */
  def write(
      df: org.apache.spark.sql.DataFrame,
      entryCol: String, dataCol: String,
      dir: String, numShards: Int, compress: Boolean = false): Unit = {
    import org.apache.spark.sql.functions._
    require(numShards > 0, "numShards must be positive")
    val spark = df.sparkSession
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val shard = pmod(xxhash64(col(entryCol)), lit(numShards)).cast("int")
    // route EXACTLY: shard-NNNNN.tar holds precisely the entries whose
    // xxhash64 pmod numShards == N. A plain repartition(n, shardCol)
    // would re-hash the shard value with Murmur3 — files would be named
    // by PARTITION id, co-locating several shard values per file and
    // leaving others empty. The identity partitioner + shuffle-sorted
    // (shard, entry) keys keep one Exchange and a spillable sort.
    val keyed = df
      .select(shard.as("__s"), col(entryCol).cast("string").as("__e"),
        col(dataCol).cast("binary").as("__d"))
      .rdd.map(r => ((r.getInt(0), r.getString(1)), r.getAs[Array[Byte]](2)))
    val byShard = new org.apache.spark.Partitioner {
      override def numPartitions: Int = numShards
      override def getPartition(key: Any): Int =
        key.asInstanceOf[(Int, String)]._1
    }
    keyed.repartitionAndSortWithinPartitions(byShard)
      .map { case ((_, e), d) => (e, d) }
      .foreachPartition { (it: Iterator[(String, Array[Byte])]) =>
        // a shard value no entry hashed to writes no file at all
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val ext = if (compress) "tar.gz" else "tar"
          val path = new Path(dir, f"shard-$pid%05d.$ext")
          val fs = path.getFileSystem(conf.value)
          // gzip header mtime defaults to 0 in commons-compress, so the
          // compressed bytes stay deterministic too
          val sink: java.io.OutputStream =
            if (compress)
              new org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream(
                fs.create(path, true))
            else fs.create(path, true)
          val out = new TarArchiveOutputStream(sink)
          out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
          out.setAddPaxHeadersForNonAsciiNames(true)
          try {
            it.foreach { case (name, data) =>
              val e = new TarArchiveEntry(name)
              e.setSize(data.length.toLong)
              e.setModTime(0L)
              out.putArchiveEntry(e)
              out.write(data)
              out.closeArchiveEntry()
            }
          } finally out.close()
        }
      }
  }
}
