package graft

import org.apache.spark.sql.functions._

import graft.sources.Vecs

/** The TEXMEX vecs DataSource V2 (S12): record layout, splitting, global
  * row ids, column pruning, and the three element kinds.
  */
class VecsSourceSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-vecs").toString

  private def writeF(path: String, vecs: Seq[Array[Float]]): Unit =
    Vecs.write(spark, path, "fvecs", vecs.iterator)

  test("fvecs roundtrip with exact values and positional row_id") {
    val dir = tmp()
    val vecs = (0 until 100).map(i => Array(i.toFloat, i * 0.5f, -i.toFloat))
    writeF(s"$dir/base.fvecs", vecs)
    val df = spark.read.format("vecs").load(s"$dir/base.fvecs")
    assert(df.schema.fieldNames.toSeq === Seq("row_id", "vec"))
    val got = df.select($"row_id", $"vec").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    assert(got.length === 100)
    got.foreach { case (id, v) => assert(v.toSeq === vecs(id.toInt).toSeq) }
  }

  test("splits are record-aligned and cover every row exactly once") {
    val dir = tmp()
    val vecs = (0 until 1000).map(i => Array.fill(8)(i.toFloat))
    writeF(s"$dir/big.fvecs", vecs)
    // record = 4 + 8*4 = 36 B; force ~1 MiB floor splits via tiny option
    val df = spark.read.format("vecs")
      .option("maxSplitBytes", "1048576").load(s"$dir/big.fvecs")
    assert(df.count() === 1000L)
    assert(df.select(sum($"row_id")).as[Long].head() === 1000L * 999 / 2)
  }

  test("multiple files get consecutive path-ordered row ids") {
    val dir = tmp()
    writeF(s"$dir/a.fvecs", Seq(Array(1.0f), Array(2.0f)))
    writeF(s"$dir/b.fvecs", Seq(Array(3.0f)))
    val df = spark.read.format("vecs").load(dir)
    val got = df.select($"row_id", $"vec".getItem(0)).as[(Long, Float)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((0L, 1.0f), (1L, 2.0f), (2L, 3.0f)))
  }

  test("ivecs and bvecs kinds") {
    val dir = tmp()
    Vecs.write(spark, s"$dir/gt.ivecs", "ivecs",
      Seq(Array(5.0f, 7.0f), Array(9.0f, 11.0f)).iterator)
    val ints = spark.read.format("vecs").load(s"$dir/gt.ivecs")
      .select($"row_id", $"vec").as[(Long, Array[Int])].collect().sortBy(_._1)
    assert(ints.map(_._2.toSeq).toSeq === Seq(Seq(5, 7), Seq(9, 11)))

    Vecs.write(spark, s"$dir/codes.bvecs", "bvecs",
      Seq(Array(0.0f, 128.0f, 255.0f)).iterator)
    val bytes = spark.read.format("vecs").load(s"$dir/codes.bvecs")
      .select($"vec").as[Array[Byte]].head()
    assert(bytes.map(_ & 0xff).toSeq === Seq(0, 128, 255))
  }

  test("a vec-free projection plans without reading vector bytes") {
    val dir = tmp()
    writeF(s"$dir/base.fvecs", (0 until 50).map(i => Array.fill(16)(i.toFloat)))
    val df = spark.read.format("vecs").load(s"$dir/base.fvecs").select($"row_id")
    // pruned schema reaches the scan (shown in the batch description)
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("row_id"))
    assert(df.count() === 50L)
  }

  test("distributed export writes one file per partition in global order") {
    val dir = tmp() + "/out"
    val df = (0 until 997).map(i => (i.toLong, Array(i.toFloat, -i.toFloat)))
      .toDF("id", "v")
      // scrambled input order — the export's range partitioning must restore it
      .orderBy(md5($"id".cast("string")))
    val n = Vecs.exportPartitioned(df, "v", dir, "fvecs",
      orderCol = Some("id"), numPartitions = 7)
    assert(n === 997L)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
    assert(files.contains("_SUCCESS"))
    assert(files.count(_.endsWith(".fvecs")) <= 7)
    assert(!files.exists(_.contains("attempt")))
    val back = spark.read.format("vecs").load(dir)
      .select($"row_id", $"vec").as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(back.length === 997)
    // row_id == rank in id order, values intact
    back.foreach { case (rid, v) => assert(v.toSeq === Seq(rid.toFloat, -rid.toFloat)) }
  }

  test("binary columns export directly to bvecs and only bvecs") {
    val dir = tmp() + "/codes"
    val rows = (0 until 40).map(i => (i.toLong, Array((i % 256).toByte, (255 - i % 256).toByte)))
      .toDF("id", "v")
    val n = Vecs.exportPartitioned(rows, "v", dir, "bvecs", Some("id"), numPartitions = 3)
    assert(n === 40L)
    val back = spark.read.format("vecs").load(dir)
      .select($"row_id", $"vec").as[(Long, Array[Byte])].collect().sortBy(_._1)
    back.foreach { case (rid, b) =>
      assert(b.map(_ & 0xff).toSeq === Seq((rid % 256).toInt, (255 - rid % 256).toInt))
    }
    // validation precedes cleanup: the bad-kind call must throw WITHOUT
    // wiping the existing export in the same dir
    val e = intercept[IllegalArgumentException] {
      Vecs.exportPartitioned(rows, "v", dir, "fvecs", Some("id"))
    }
    assert(e.getMessage.contains("bvecs"))
    assert(spark.read.format("vecs").load(dir).count() === 40L)
  }

  test("export manifest validates; truncation and missing parts are diagnosed") {
    val dir = tmp() + "/val"
    Vecs.exportPartitioned(
      (0 until 200).map(i => (i.toLong, Array(i.toFloat, 2f * i))).toDF("id", "v"),
      "v", dir, "fvecs", Some("id"), numPartitions = 4)
    Vecs.validateExport(spark, dir) // clean export passes
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".fvecs"))
    assert(parts.nonEmpty)
    // truncate one part mid-record
    val victim = parts.head
    val ch = java.nio.file.Files.newByteChannel(victim.toPath,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(victim.length() - 5) finally ch.close()
    val e1 = intercept[IllegalArgumentException] { Vecs.validateExport(spark, dir) }
    assert(e1.getMessage.contains("truncated") || e1.getMessage.contains("record"))
    // restore to a record boundary (still the wrong count) -> count mismatch
    val ch2 = java.nio.file.Files.newByteChannel(victim.toPath,
      java.nio.file.StandardOpenOption.WRITE)
    try ch2.truncate(victim.length() - 7) finally ch2.close() // 12-byte records
    val e2 = intercept[IllegalArgumentException] { Vecs.validateExport(spark, dir) }
    assert(e2.getMessage.contains("manifest says"))
    // missing part
    assert(victim.delete())
    val e3 = intercept[IllegalArgumentException] { Vecs.validateExport(spark, dir) }
    assert(e3.getMessage.contains("file missing"))
    // a legacy zero-byte _SUCCESS is diagnosed, not an NPE
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/_SUCCESS"), Array[Byte]())
    val e4 = intercept[IllegalArgumentException] { Vecs.validateExport(spark, dir) }
    assert(e4.getMessage.contains("carries no manifest"))
  }

  test("re-export with a different kind removes the old kind's parts") {
    val dir = tmp() + "/swap"
    Vecs.exportPartitioned(
      (0 until 30).map(i => (i.toLong, Array(i.toFloat))).toDF("id", "v"),
      "v", dir, "fvecs", Some("id"), numPartitions = 2)
    Vecs.exportPartitioned(
      (0 until 30).map(i => (i.toLong, Array(i.toByte))).toDF("id", "v"),
      "v", dir, "bvecs", Some("id"), numPartitions = 2)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.endsWith(".fvecs")))
    Vecs.validateExport(spark, dir) // manifest matches the bvecs-only dir
    assert(spark.read.format("vecs").load(dir).count() === 30L)
  }

  test("re-export with fewer partitions leaves no stale part files") {
    val dir = tmp() + "/out"
    val mk = (n: Int) => (0 until n).map(i => (i.toLong, Array(i.toFloat))).toDF("id", "v")
    Vecs.exportPartitioned(mk(100), "v", dir, "fvecs", Some("id"), numPartitions = 8)
    Vecs.exportPartitioned(mk(10), "v", dir, "fvecs", Some("id"), numPartitions = 2)
    assert(spark.read.format("vecs").load(dir).count() === 10L)
  }

  test("SIFT-style recall flow: fixture -> fvecs export -> re-read -> partial-probe IVFPQ") {
    // the reference's benchmark method end-to-end through OUR corpus
    // format: a clustered fixture exported to fvecs, re-read through the
    // splittable source (row_id = rank, the TEXMEX contract), indexed,
    // and recall-gated at a partial probe — proving the vecs reader feeds
    // the index path losslessly
    val dir = tmp() + "/sift"
    val fix = graft.index.GaussianFixture
      .mixtureOfGaussians(spark, 20000L, 16, 32, sigma = 0.8, seed = 5L)
    Vecs.exportPartitioned(fix, "embedding", dir, "fvecs",
      orderCol = Some("vec_id"), numPartitions = 8)
    val corpus = spark.read.format("vecs").load(dir)
      .select($"row_id".as("vec_id"), $"vec".as("embedding"))
    assert(corpus.count() === 20000L)
    val queries = corpus.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq
    val idx = graft.index.IndexRegistry.build("IVFPQ", spark, corpus,
      "vec_id", "embedding",
      graft.index.IndexParams(ncentroids = 32, nsubvector = 8, recallNum = 100))
    val q = queries.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qvec")
    val truth = graft.operators.Knn.flatSearch(corpus, "vec_id", "embedding",
        q, "qid", "qvec", 10, graft.core.Metric.L2)
      .select($"qid", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // nprobe=3/32 < 10% probe fraction — the baseline's operating regime
    val got = idx.search(queries, 10, Some(3))
      .select($"qid", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = truth.map { case (qi, t) =>
      got.getOrElse(qi, Set.empty).count(t).toDouble / t.size
    }.sum / truth.size
    assert(recall >= 0.95, s"partial-probe recall through the vecs source: $recall")
  }

  test("corrupt sizes fail fast") {
    val dir = tmp()
    // plain-java write (no hadoop .crc sidecar): a valid 2-float record
    // plus one stray byte -> size is no longer a record multiple
    val bb = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(2).putFloat(1.0f).putFloat(2.0f).put(7.toByte)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.fvecs"), bb.array())
    val e = intercept[Exception] {
      spark.read.format("vecs").load(s"$dir/bad.fvecs").count()
    }
    assert(e.getMessage.contains("record"))
  }
}
