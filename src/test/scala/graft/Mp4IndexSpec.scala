package graft

import java.io.ByteArrayOutputStream

import graft.media.Mp4Index

/** ISO-BMFF sample-table indexing: the stsz/stsc/stco|co64/stts walk that
  * turns an opaque MP4 into per-sample byte ranges + timestamps.
  */
class Mp4IndexSpec extends GraftSuite {
  import spark.implicits._

  test("sample table matches the fixture's closed form (stco and co64, multi-run stsc)") {
    for (id <- 0L until 12L) { // even ids: stco; odd: co64
      val locs = Mp4Index.parseSampleTable(Mp4Index.synthMp4(id))
      val n = (6 + id % 5).toInt
      assert(locs.size === n, s"id=$id")
      val sizes = Array.tabulate(n)(i => (10 + (17 * id + 31 * i) % 90).toLong)
      val delta = 100 + id % 50
      var off = 32L
      locs.zipWithIndex.foreach { case (l, i) =>
        assert(l.sampleIdx === i)
        assert(l.chunkIdx === i / 3)
        assert(l.size === sizes(i), s"id=$id i=$i")
        assert(l.offset === off, s"id=$id i=$i")
        assert(l.pts === i * delta)
        off += sizes(i)
      }
      // the byte ranges really address the mdat payload the fixture wrote
      val bytes = Mp4Index.synthMp4(id)
      val first = locs.head
      assert((bytes(first.offset.toInt) & 0xff) === ((id + 0) & 0xff).toInt)
    }
  }

  test("fixed-size stsz path: hand-built container") {
    // minimal ftyp + mdat + moov with stsz sample_size=20 (no table)
    val out = new ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    be32(16); tag("ftyp"); tag("isom"); be32(0)
    be32(8 + 80); tag("mdat"); (0 until 80).foreach(out.write) // 4 samples x 20
    def box(name: String)(body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      val sz = 8 + body.length
      o.write((sz >> 24) & 0xff); o.write((sz >> 16) & 0xff)
      o.write((sz >> 8) & 0xff); o.write(sz & 0xff)
      o.write(name.getBytes("US-ASCII")); o.write(body)
      o.toByteArray
    }
    def ints(vs: Long*): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      vs.foreach { x =>
        o.write(((x >> 24) & 0xff).toInt); o.write(((x >> 16) & 0xff).toInt)
        o.write(((x >> 8) & 0xff).toInt); o.write((x & 0xff).toInt)
      }
      o.toByteArray
    }
    val stbl = box("stbl")(
      box("stsz")(ints(0, 20, 4)) ++           // fixed size 20, 4 samples
        box("stsc")(ints(0, 1, 1, 2, 1)) ++    // 2 per chunk
        box("stco")(ints(0, 2, 24, 64)) ++     // 2 chunks
        box("stts")(ints(0, 1, 4, 10)))
    out.write(box("moov")(box("trak")(box("mdia")(box("minf")(stbl)))))
    val locs = Mp4Index.parseSampleTable(out.toByteArray)
    assert(locs.map(l => (l.sampleIdx, l.chunkIdx, l.offset, l.size, l.pts)) ===
      Seq((0, 0, 24L, 20L, 0L), (1, 0, 44L, 20L, 10L),
        (2, 1, 64L, 20L, 20L), (3, 1, 84L, 20L, 30L)))
  }

  test("malformed/truncated containers are refused with precise errors") {
    val good = Mp4Index.synthMp4(3L)
    intercept[IllegalArgumentException](
      Mp4Index.parseSampleTable(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      Mp4Index.parseSampleTable(good.take(40))) // moov missing
    // moov present but cut mid-stbl
    val e = intercept[IllegalArgumentException](
      Mp4Index.parseSampleTable(good.take(good.length - 6)))
    assert(e.getMessage != null && e.getMessage.nonEmpty)
    // a box whose size overruns its enclosing box is loud, not a scan-past
    val corrupt = good.clone()
    val moovAt = (0 until good.length - 4).find(i =>
      new String(good.slice(i, i + 4), "US-ASCII") == "moov").get - 4
    corrupt(moovAt) = 0x7f.toByte // absurd moov size
    intercept[IllegalArgumentException](Mp4Index.parseSampleTable(corrupt))
  }

  test("distributed sampleIndex: one row per sample, parse stays executor-local") {
    val ids = (0L until 30L).toDF("doc_id")
    val idx = Mp4Index.sampleIndex(
      Mp4Index.synthMp4Payload(ids, "doc_id"), "doc_id", "bytes")
    val n = idx.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 30L).foreach(id => assert(n(id) === 6 + id % 5, s"id=$id"))
    val plan = idx.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mp4 index parse shuffled:\n$plan")
  }
}
