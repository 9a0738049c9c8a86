package graft.media

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL multimodal metadata extraction — container-format header parsing
  * over opaque binary columns. Unlike the decode kernels (MediaOps
  * stubs: no codecs in this environment), dimension/sample-rate sniffing
  * needs no codec at all: PNG/GIF/BMP/JPEG/WAV publish their geometry in
  * the first bytes of the container, so a pure byte walk recovers
  * (kind, width, height, sample_rate, channels) — the metadata a
  * 100 TB multimodal pipeline filters and routes on BEFORE paying any
  * decode (drop tiny images, bucket by aspect ratio, split audio by
  * rate) while the payload stays an opaque column that never needs to
  * leave parquet more than once.
  *
  * Formats (public container specs):
  *  - PNG  (RFC 2083): 8-byte signature, IHDR width/height BE32 at 16/20
  *  - GIF  (GIF89a spec): "GIF8[79]a", logical screen LE16 at 6/8
  *  - BMP  (BITMAPINFOHEADER): "BM", width/height LE32 at 18/22
  *  - JPEG (ITU T.81): marker walk from SOI past APPn/COM segments to
  *    the first SOF frame header (height BE16 at +5, width BE16 at +7)
  *  - WAV  (RIFF): chunk walk to "fmt " — channels LE16, rate LE32
  *
  * Executed as a partition kernel (the repo's ShingleHash shape): per-row
  * imperative byte logic, no UDF registration, one pass, no shuffle.
  */
object MediaHeaders {

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def le16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def le32(b: Array[Byte], o: Int): Int =
    ((b(o + 3) & 0xff) << 24) | ((b(o + 2) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    o + s.length <= b.length && (0 until s.length).forall(i => (b(o + i) & 0xff) == s.charAt(i))

  /** (kind, width, height, sample_rate, channels); nulls where the
    * format has no such field or the bytes don't parse ("unknown").
    */
  private[media] def sniff(b: Array[Byte])
      : (String, Integer, Integer, Integer, Integer) = {
    val n = if (b == null) 0 else b.length
    def unknown = ("unknown", null: Integer, null: Integer, null: Integer, null: Integer)
    if (n < 12) return unknown
    // PNG: \x89PNG\r\n\x1a\n + IHDR
    if ((b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG") &&
        (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
        (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a) {
      if (n >= 24 && ascii(b, 12, "IHDR"))
        return ("png", Int.box(be32(b, 16)), Int.box(be32(b, 20)), null, null)
      return unknown
    }
    // GIF87a / GIF89a
    if (ascii(b, 0, "GIF8") && ((b(4) & 0xff) == '7' || (b(4) & 0xff) == '9') &&
        (b(5) & 0xff) == 'a')
      return ("gif", Int.box(le16(b, 6)), Int.box(le16(b, 8)), null, null)
    // BMP
    if (ascii(b, 0, "BM") && n >= 26)
      return ("bmp", Int.box(le32(b, 18)), Int.box(le32(b, 22)), null, null)
    // WAV: RIFF....WAVE, then chunk walk to "fmt "
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
      var o = 12
      while (o + 8 <= n) {
        val size = le32(b, o + 4)
        if (size < 0) return unknown
        if (ascii(b, o, "fmt ") && o + 16 <= n)
          return ("wav", null, null, Int.box(le32(b, o + 12)), Int.box(le16(b, o + 10)))
        o += 8 + size + (size & 1) // chunks pad to even length
      }
      return unknown
    }
    // JPEG: SOI then marker walk to the first frame header (SOF0..15,
    // excluding DHT/JPG/DAC which reuse the 0xC stripe)
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var o = 2
      while (o + 4 <= n) {
        if ((b(o) & 0xff) != 0xff) return unknown
        val m = b(o + 1) & 0xff
        if (m == 0xff) { o += 1 } // fill bytes before a marker
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) { o += 2 } // standalone
        else {
          val len = be16(b, o + 2)
          if (len < 2) return unknown
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (o + 9 <= n)
              return ("jpeg", Int.box(be16(b, o + 7)), Int.box(be16(b, o + 5)), null, null)
            return unknown
          }
          o += 2 + len
        }
      }
      return unknown
    }
    unknown
  }

  /** Adds (media_kind, width, height, sample_rate, channels) parsed from
    * `bytesCol`. Pure per-partition projection — no shuffle, payloads
    * never move.
    */
  def parseHeaders(df: DataFrame, bytesCol: String): DataFrame = {
    val schema = df.schema
      .add("media_kind", StringType)
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("sample_rate", IntegerType)
      .add("channels", IntegerType)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (k, w, h, sr, ch) = sniff(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq ++ Seq(k, w, h, sr, ch))
      }
    }(Encoders.row(schema))
  }

  // ------------------------------------------------------ fixture synth

  /** Deterministic header-bytes fixture: real container layouts (the
    * parser above can't tell them from files) with geometry derived from
    * two integer columns, so an SQL oracle can state the expected parse
    * without reading bytes. Synthesis and parsing share NOTHING but the
    * public format specs — the gate round-trips spec-compliance, not a
    * private encoding. kind cycles png/gif/jpeg/wav on `idCol % 4`;
    * image dims are (dimCol % 1000 + 1) × (idCol % 500 + 1); wav is
    * (8000 + idCol % 8 · 4000) Hz, 1 + idCol % 2 channels. The JPEG
    * carries an APP0 and a variable-length COM segment (idCol % 7 bytes)
    * so the marker walk is exercised, not a fixed offset.
    */
  def synthHeaderPayload(df: DataFrame, idCol: String, dimCol: String): DataFrame = {
    val schema = df.schema.add("bytes", BinaryType)
    val idIdx = df.schema.fieldIndex(idCol)
    val dimIdx = df.schema.fieldIndex(dimCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        // any integral column works as id/dim (replicas may narrow types)
        val id = r.getAs[Number](idIdx).longValue()
        val dim = r.getAs[Number](dimIdx).longValue()
        val w = (dim % 1000 + 1).toInt
        val h = (id % 500 + 1).toInt
        val bytes = (id % 4) match {
          case 0 => pngBytes(w, h)
          case 1 => gifBytes(w, h)
          case 2 => jpegBytes(w, h, comLen = (id % 7).toInt)
          case _ => wavBytes(8000 + (id % 8).toInt * 4000, 1 + (id % 2).toInt)
        }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(Encoders.row(schema))
  }

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(Array[Byte](0, 0, 0, 13)) // IHDR length
    out.write("IHDR".getBytes("US-ASCII"))
    writeBe32(out, w); writeBe32(out, h)
    out.write(Array[Byte](8, 2, 0, 0, 0)) // depth, color, compress, filter, interlace
    out.write(Array[Byte](0, 0, 0, 0))    // CRC (not validated by header sniff)
    out.toByteArray
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    writeLe16(out, w); writeLe16(out, h)
    out.write(Array[Byte](0, 0, 0)) // flags, bg, aspect
    out.toByteArray
  }

  private def jpegBytes(w: Int, h: Int, comLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    out.write(Array(0xff, 0xe0).map(_.toByte)) // APP0
    writeBe16Pair(out, 16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(Array.fill[Byte](10)(0))
    out.write(Array(0xff, 0xfe).map(_.toByte)) // COM, variable length
    writeBe16Pair(out, 2 + comLen)
    out.write(Array.fill[Byte](comLen)('x'.toByte))
    out.write(Array(0xff, 0xc0).map(_.toByte)) // SOF0
    writeBe16Pair(out, 11)
    out.write(8) // precision
    writeBe16Pair(out, h); writeBe16Pair(out, w)
    out.write(1); out.write(Array[Byte](1, 0x11, 0)) // 1 component
    out.write(Array(0xff, 0xd9).map(_.toByte)) // EOI
    out.toByteArray
  }

  private def wavBytes(rate: Int, channels: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); writeLe32(out, 36)
    out.write("WAVE".getBytes("US-ASCII"))
    // a LIST chunk before fmt so the chunk walk is exercised
    out.write("LIST".getBytes("US-ASCII")); writeLe32(out, 4)
    out.write("INFO".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); writeLe32(out, 16)
    writeLe16(out, 1); writeLe16(out, channels)
    writeLe32(out, rate); writeLe32(out, rate * channels * 2)
    writeLe16(out, channels * 2); writeLe16(out, 16)
    out.write("data".getBytes("US-ASCII")); writeLe32(out, 0)
    out.toByteArray
  }

  private def writeBe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }
  private def writeBe16Pair(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }
  private def writeLe16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
  }
  private def writeLe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
    o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }
}
