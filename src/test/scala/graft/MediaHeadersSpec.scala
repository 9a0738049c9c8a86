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
      .select("media_kind", "width", "height", "sample_rate", "channels")
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
    assert(w.getString(0) === "wav" && w.getInt(3) === 20000 && w.getInt(4) === 2)
    val bmp = "BM".getBytes("US-ASCII") ++ Array.fill[Byte](16)(0) ++
      Array[Byte](0x40, 0, 0, 0) ++ Array[Byte](0x30, 0, 0, 0) ++ Array.fill[Byte](4)(0)
    val r = sniff(bmp)
    assert(r.getString(0) === "bmp" && r.getInt(1) === 64 && r.getInt(2) === 48)
  }

  test("malformed bytes are unknown, never a throw") {
    for (b <- Seq(Array.empty[Byte], "hello".getBytes("US-ASCII"),
        Array(0xff, 0xd8, 0x00).map(_.toByte), // JPEG SOI then garbage
        "RIFFxxxxWAVE".getBytes("US-ASCII"))) // RIFF with no fmt chunk
      assert(sniff(b).getString(0) === "unknown", b.toSeq)
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
          r.getInt(4) === 8000 + (id % 8).toInt * 4000 && r.getInt(5) === 1 + (id % 2).toInt)
      }
    }
  }
}
