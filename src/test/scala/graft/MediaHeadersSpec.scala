package graft

import org.apache.spark.sql.functions._

import graft.media.MediaHeaders

/** Header sniffing against REAL container prefixes (byte-for-byte file
  * prefixes from the public specs), malformed-input behavior, and the
  * synth→parse round trip the gate relies on.
  */
class MediaHeadersSpec extends GraftSuite {
  import spark.implicits._

  private def sniff(b: Array[Byte]) = {
    val df = Seq(Tuple1(b)).toDF("bytes")
    MediaHeaders.parseHeaders(df, "bytes")
      .select("media_kind", "width", "height", "sample_rate", "channels",
        "duration_ms")
      .collect().head
  }

  test("real 1x1 PNG prefix parses (signature + IHDR from the RFC)") {
    // first 33 bytes of an actual 1x1 RGBA PNG
    val png = Array(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
      0x08, 0x06, 0x00, 0x00, 0x00, 0x1f, 0x15, 0xc4, 0x89).map(_.toByte)
    val r = sniff(png)
    assert(r.getString(0) === "png" && r.getInt(1) === 1 && r.getInt(2) === 1)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("GIF89a logical screen is little-endian") {
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x20, 0x01, 0x2c, 0x01, 0, 0, 0) // 288 x 300
    val r = sniff(gif)
    assert(r.getString(0) === "gif" && r.getInt(1) === 288 && r.getInt(2) === 300)
  }

  test("JPEG marker walk skips APPn/COM and finds progressive SOF2") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8, 0xff, 0xe1, 0x00, 0x04, 0x45, 0x78).map(_.toByte)) // APP1
    out.write(Array(0xff, 0xfe, 0x00, 0x05, 0x61, 0x62, 0x63).map(_.toByte))       // COM
    out.write(Array(0xff, 0xc2, 0x00, 0x0b, 0x08, 0x01, 0x00, 0x02, 0x80).map(_.toByte)) // SOF2 256h x 640w
    out.write(Array(0x01, 0x01, 0x11, 0x00).map(_.toByte))
    val r = sniff(out.toByteArray)
    assert(r.getString(0) === "jpeg" && r.getInt(1) === 640 && r.getInt(2) === 256)
  }

  test("WAV chunk walk reaches fmt past a LIST chunk; BMP parses") {
    val w = sniff({
      val df = Seq((3L, 0L)).toDF("doc_id", "n_chars")
      MediaHeaders.synthHeaderPayload(df, "doc_id", "n_chars")
        .select("bytes").as[Array[Byte]].collect().head
    })
    assert(w.getString(0) === "wav" && w.getInt(3) === 8000 && w.getInt(4) === 1)
    val bmp = "BM".getBytes("US-ASCII") ++ Array.fill[Byte](16)(0) ++
      Array[Byte](0x40, 0, 0, 0) ++ Array[Byte](0x30, 0, 0, 0) ++ Array.fill[Byte](4)(0)
    val r = sniff(bmp)
    assert(r.getString(0) === "bmp" && r.getInt(1) === 64 && r.getInt(2) === 48)
  }

  test("malformed bytes are unknown, never a throw") {
    for (b <- Seq(Array.empty[Byte], "hello".getBytes("US-ASCII"),
        Array(0xff, 0xd8, 0x00).map(_.toByte), // JPEG SOI then garbage
        "RIFFxxxxWAVE".getBytes("US-ASCII"), // RIFF with no fmt chunk
        // chunk size near Int.MaxValue: an Int offset would wrap negative,
        // slip past the bounds guard, and throw instead of "unknown"
        "RIFFxxxxWAVEJUNK".getBytes("US-ASCII") ++
          Array(0xf0, 0xff, 0xff, 0x7f).map(_.toByte) ++ Array.fill[Byte](64)(0),
        // same wrap vector through the JPEG segment walk (len=0xFFFF)
        Array(0xff, 0xd8, 0xff, 0xe1, 0xff, 0xff).map(_.toByte) ++
          Array.fill[Byte](64)(0)))
      assert(sniff(b).getString(0) === "unknown", b.toSeq)
  }

  test("ISO-BMFF box walk: hand-built mvhd/tkhd per 14496-12, both versions") {
    // 320x240, 90 s at timescale 600 (54000 units), v0 boxes, built here
    // from the spec tables independently of the synth fixture
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, p: Array[Byte]): Array[Byte] =
      be32(8L + p.length) ++ t.getBytes("US-ASCII") ++ p
    val mvhd = box("mvhd",
      Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ // v0, ctime, mtime
        be32(600) ++ be32(54000) ++ be32(0x00010000L) ++
        Array.fill[Byte](2 + 2 + 8)(0) ++
        (Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
          .flatMap(be32).toArray) ++
        Array.fill[Byte](24)(0) ++ be32(2))
    val tkhd = box("tkhd",
      Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++
        be32(54000) ++ Array.fill[Byte](8 + 2 + 2 + 2 + 2)(0) ++
        (Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
          .flatMap(be32).toArray) ++
        be32(320L << 16) ++ be32(240L << 16))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512) ++
      "isom".getBytes("US-ASCII"))
    val r = sniff(ftyp ++ box("moov", mvhd ++ box("trak", tkhd)))
    assert(r.getString(0) === "mp4" && r.getInt(1) === 320 && r.getInt(2) === 240)
    assert(r.getLong(5) === 90000L)
    // malformed: box size smaller than its header must be unknown
    val bad = ftyp ++ be32(3) ++ "moov".getBytes("US-ASCII")
    assert(sniff(bad).getString(0) === "unknown")
  }

  test("TIFF IFD scan: both byte orders, SHORT and LONG dims, EXIF-style") {
    // big-endian, LONG dims, hand-assembled from the TIFF 6.0 layout
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Int): Unit = { w16((v >> 16) & 0xffff); w16(v & 0xffff) }
    out.write("MM".getBytes("US-ASCII")); w16(42); w32(8)
    w16(2)
    w16(0x0100); w16(4); w32(1); w32(1920)
    w16(0x0101); w16(4); w32(1); w32(1080)
    w32(0)
    val r = sniff(out.toByteArray)
    assert(r.getString(0) === "tiff" && r.getInt(1) === 1920 && r.getInt(2) === 1080)
    // truncated IFD (count says 5 entries, bytes end) must be unknown
    val trunc = out.toByteArray.take(12)
    assert(sniff("II".getBytes("US-ASCII") ++ Array[Byte](42, 0, 8, 0, 0, 0, 5, 0))
      .getString(0) === "unknown")
    assert(sniff(trunc).getString(0) === "unknown")
  }

  test("v2 synth -> parse round trip: mp4/tiff across version/endian/type knobs") {
    val df = (0L until 64L).map(i => (i, i * 37L)).toDF("doc_id", "n_chars")
    val got = MediaHeaders.parseHeaders(
      MediaHeaders.synthContainerPayload(df, "doc_id", "n_chars"), "bytes")
      .select(col("doc_id"), col("media_kind"), col("width"), col("height"),
        col("duration_ms"))
      .collect()
    got.foreach { r =>
      val id = r.getLong(0); val nc = id * 37L
      assert(r.getInt(2) === (nc % 1000 + 1).toInt, s"width id=$id")
      assert(r.getInt(3) === (id % 500 + 1).toInt, s"height id=$id")
      if (id % 2 == 0) {
        assert(r.getString(1) === "mp4")
        assert(r.getLong(4) === (id % 3600 + 1) * 1000L, s"duration id=$id")
      } else {
        assert(r.getString(1) === "tiff" && r.isNullAt(4))
      }
    }
  }

  test("synth -> parse round trip matches the arithmetic contract") {
    val df = (0L until 64L).map(i => (i, i * 37L)).toDF("doc_id", "n_chars")
    val got = MediaHeaders.parseHeaders(
      MediaHeaders.synthHeaderPayload(df, "doc_id", "n_chars"), "bytes")
      .select(col("doc_id"), col("media_kind"), col("width"), col("height"),
        col("sample_rate"), col("channels"))
      .collect()
    got.foreach { r =>
      val id = r.getLong(0); val nc = id * 37L
      (id % 4) match {
        case 0 => assert(r.getString(1) === "png" &&
          r.getInt(2) === (nc % 1000 + 1).toInt && r.getInt(3) === (id % 500 + 1).toInt)
        case 1 => assert(r.getString(1) === "gif" &&
          r.getInt(2) === (nc % 1000 + 1).toInt && r.getInt(3) === (id % 500 + 1).toInt)
        case 2 => assert(r.getString(1) === "jpeg" &&
          r.getInt(2) === (nc % 1000 + 1).toInt && r.getInt(3) === (id % 500 + 1).toInt)
        case _ => assert(r.getString(1) === "wav" &&
          r.getInt(4) === 8000 + ((id / 4) % 8).toInt * 4000 &&
          r.getInt(5) === 1 + ((id / 4) % 2).toInt)
      }
    }
  }
}
