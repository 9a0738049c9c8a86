package graft

import org.apache.spark.sql.functions._

import graft.sources.TarShards

/** Tar-shard (WebDataset-layout) source + writer. */
class TarShardSpec extends GraftSuite {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("tar_spec").toString

  private def fixture = Seq(
    ("a.txt", "hello".getBytes("UTF-8")),
    ("b.bin", Array[Byte](0, 1, 2, -1, -128, 127)),
    ("ümlaut/ünïcode.txt", "ünïcode pàyload".getBytes("UTF-8")),
    // POSIX long-name path: > 100 chars forces a PAX extension header
    ("x" * 150 + ".dat", Array.fill[Byte](1024)(42)),
    ("empty.txt", Array.emptyByteArray)).toDF("entry", "data")

  test("round-trips names, lengths and bytes, including long/unicode/empty") {
    val dir = tmp()
    TarShards.write(fixture, "entry", "data", dir, numShards = 2)
    val back = spark.read.format("tarshard").load(s"$dir/*.tar")
    val got = back.select("entry", "data").as[(String, Array[Byte])]
      .collect().map { case (e, d) => e -> d.toSeq }.toMap
    val want = fixture.as[(String, Array[Byte])]
      .collect().map { case (e, d) => e -> d.toSeq }.toMap
    assert(got === want)
    // length column matches payload size
    assert(back.filter(col("length") =!= size_of_data()).count() === 0)
  }

  private def size_of_data() = length(col("data")).cast("long")

  test("one partition per shard; shard column names the file") {
    val dir = tmp()
    TarShards.write(fixture, "entry", "data", dir, numShards = 3)
    val back = spark.read.format("tarshard").load(s"$dir/*.tar")
    assert(back.rdd.getNumPartitions === 3)
    val shards = back.select("shard").distinct().as[String].collect().toSet
    assert(shards.forall(s => s.startsWith("shard-") && s.endsWith(".tar")))
  }

  test("shard-N holds exactly the entries with xxhash64(entry) pmod S == N") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val dir = tmp()
    TarShards.write(fixture, "entry", "data", dir, numShards = 3)
    val got = spark.read.format("tarshard").load(s"$dir/*.tar")
      .select(col("shard"), col("entry"))
      .withColumn("want", pmod(xxhash64(col("entry")), lit(3)).cast("int"))
      .as[(String, String, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (file, entry, want) =>
      assert(file === f"shard-$want%05d.tar",
        s"entry '$entry' routed to $file, expected shard $want")
    }
  }

  test("writer output is byte-deterministic across runs") {
    val d1 = tmp(); val d2 = tmp()
    TarShards.write(fixture, "entry", "data", d1, numShards = 2)
    TarShards.write(fixture, "entry", "data", d2, numShards = 2)
    def digests(dir: String): Map[String, String] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.endsWith(".tar")).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        f.getName -> md.map(b => f"$b%02x").mkString
      }.toMap
    }
    assert(digests(d1) === digests(d2))
  }

  test("gz shards round-trip and stay byte-deterministic") {
    val d1 = tmp(); val d2 = tmp()
    TarShards.write(fixture, "entry", "data", d1, numShards = 2, compress = true)
    TarShards.write(fixture, "entry", "data", d2, numShards = 2, compress = true)
    val back = spark.read.format("tarshard").load(s"$d1/*.tar.gz")
    val got = back.select("entry", "data").as[(String, Array[Byte])]
      .collect().map { case (e, d) => e -> d.toSeq }.toMap
    val want = fixture.as[(String, Array[Byte])]
      .collect().map { case (e, d) => e -> d.toSeq }.toMap
    assert(got === want)
    def bytes(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar.gz")).sortBy(_.getName)
      .map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq).toSeq
    assert(bytes(d1) === bytes(d2))
  }

  test("shard assignment is a reproducible permutation with dense positions") {
    import graft.operators.Shard
    val df = spark.range(0, 1000).select(col("id").as("doc_id"))
    val a = Shard.assign(df, "doc_id", numShards = 8)
    // every row assigned exactly once; positions dense 0..n-1 per shard
    assert(a.count() === 1000)
    val perShard = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .as[(Long, Long, Long, Long)].collect()
    assert(perShard.length === 8)
    perShard.foreach { case (_, n, mx, mn) =>
      assert(mn === 0L); assert(mx === n - 1)
    }
    // stable under repartition
    val b = Shard.assign(df.repartition(13), "doc_id", numShards = 8)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("metadata-only projection prunes the data column from the scan") {
    val dir = tmp()
    TarShards.write(fixture, "entry", "data", dir, numShards = 1)
    val meta = spark.read.format("tarshard").load(s"$dir/*.tar")
      .select("entry", "length")
    val scan = meta.queryExecution.executedPlan.toString
    assert(scan.contains("columns=[entry,length]"), scan)
    assert(meta.count() === 5)
  }
}
