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
