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
  *  - ISO-BMFF (ISO/IEC 14496-12; MP4/MOV): box walk to moov — mvhd
  *    timescale/duration (v0/v1), first trak/tkhd 16.16 width/height
  *  - TIFF (TIFF 6.0 / EXIF): II/MM byte order, IFD0 entry scan for
  *    ImageWidth (0x0100) / ImageLength (0x0101), SHORT or LONG
  *
  * Executed as a partition kernel (the repo's ShingleHash shape): per-row
  * imperative byte logic, no UDF registration, one pass, no shuffle.
  */
object MediaHeaders {

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def be64(b: Array[Byte], o: Int): Long =
    ((be32(b, o) & 0xffffffffL) << 32) | (be32(b, o + 4) & 0xffffffffL)
  private def le16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def le32(b: Array[Byte], o: Int): Int =
    ((b(o + 3) & 0xff) << 24) | ((b(o + 2) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    o + s.length <= b.length && (0 until s.length).forall(i => (b(o + i) & 0xff) == s.charAt(i))

  /** Parsed header metadata; nulls where the format has no such field or
    * the bytes don't parse ("unknown").
    */
  private[media] case class Sniffed(
      kind: String, width: Integer, height: Integer,
      sampleRate: Integer, channels: Integer, durationMs: java.lang.Long)

  private[media] val Unknown = Sniffed("unknown", null, null, null, null, null)

  private[media] def sniff(b: Array[Byte]): Sniffed = {
    val n = if (b == null) 0 else b.length
    def unknown = Unknown
    if (n < 12) return unknown
    // PNG: \x89PNG\r\n\x1a\n + IHDR
    if ((b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG") &&
        (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
        (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a) {
      if (n >= 24 && ascii(b, 12, "IHDR"))
        return Sniffed("png", Int.box(be32(b, 16)), Int.box(be32(b, 20)), null, null, null)
      return unknown
    }
    // GIF87a / GIF89a
    if (ascii(b, 0, "GIF8") && ((b(4) & 0xff) == '7' || (b(4) & 0xff) == '9') &&
        (b(5) & 0xff) == 'a')
      return Sniffed("gif", Int.box(le16(b, 6)), Int.box(le16(b, 8)), null, null, null)
    // BMP
    if (ascii(b, 0, "BM") && n >= 26)
      return Sniffed("bmp", Int.box(le32(b, 18)), Int.box(le32(b, 22)), null, null, null)
    // WAV: RIFF....WAVE, then chunk walk to "fmt ". The offset is
    // tracked as Long: a hostile/corrupt chunk size near Int.MaxValue
    // would wrap an Int offset negative and defeat the bounds guard
    // (malformed bytes must be "unknown", never a throw).
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
      var o = 12L
      while (o + 8 <= n) {
        val oi = o.toInt
        val size = le32(b, oi + 4)
        if (size < 0) return unknown
        if (ascii(b, oi, "fmt ") && o + 16 <= n)
          return Sniffed("wav", null, null,
            Int.box(le32(b, oi + 12)), Int.box(le16(b, oi + 10)), null)
        o += 8L + size + (size & 1) // chunks pad to even length
      }
      return unknown
    }
    // JPEG: SOI then marker walk to the first frame header (SOF0..15,
    // excluding DHT/JPG/DAC which reuse the 0xC stripe)
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var o = 2L // Long for the same wrap-proofing as the WAV walk
      while (o + 4 <= n) {
        val oi = o.toInt
        if ((b(oi) & 0xff) != 0xff) return unknown
        val m = b(oi + 1) & 0xff
        if (m == 0xff) { o += 1 } // fill bytes before a marker
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) { o += 2 } // standalone
        else {
          val len = be16(b, oi + 2)
          if (len < 2) return unknown
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (o + 9 <= n)
              return Sniffed("jpeg",
                Int.box(be16(b, oi + 7)), Int.box(be16(b, oi + 5)), null, null, null)
            return unknown
          }
          o += 2L + len
        }
      }
      return unknown
    }
    // ISO-BMFF (MP4/MOV): box walk. Every real file leads with ftyp
    // (ISO/IEC 14496-12 §4.3); geometry lives in moov/trak/tkhd and
    // duration in moov/mvhd.
    if (ascii(b, 4, "ftyp")) return sniffIsoBmff(b, n)
    // TIFF 6.0 / EXIF: "II" LE or "MM" BE byte order + magic 42
    val tiffLe = ascii(b, 0, "II") && (b(2) & 0xff) == 0x2a && (b(3) & 0xff) == 0x00
    val tiffBe = ascii(b, 0, "MM") && (b(2) & 0xff) == 0x00 && (b(3) & 0xff) == 0x2a
    if (tiffLe || tiffBe) return sniffTiff(b, n, bigEndian = tiffBe)
    unknown
  }

  /** ISO-BMFF box walk (ISO/IEC 14496-12): find moov at top level, mvhd
    * (v0: timescale@12 duration@16; v1: timescale@20 duration@24 as 64-bit)
    * for duration, first trak/tkhd (v0: 16.16 width@76 height@80 of the
    * FullBox payload; v1: @88/@92) with nonzero dims for geometry.
    * Offsets tracked as Long (64-bit largesize boxes are legal).
    */
  private def sniffIsoBmff(b: Array[Byte], n: Int): Sniffed = {
    var w: Integer = null; var h: Integer = null; var dur: java.lang.Long = null

    /** Walk child boxes of [lo, hi); returns false on malformed layout. */
    def walk(lo: Long, hi: Long, depth: Int): Boolean = {
      if (depth > 4) return true // tkhd sits at depth 3; deeper is payload
      var o = lo
      while (o + 8 <= hi) {
        val oi = o.toInt
        val size32 = be32(b, oi) & 0xffffffffL
        val hdr = if (size32 == 1L) 16L else 8L
        val boxEnd =
          if (size32 == 0L) hi // "to end of file"
          else if (size32 == 1L) {
            if (o + 16 > hi) return false
            o + be64(b, oi + 8)
          } else o + size32
        if (boxEnd < o + hdr || boxEnd > hi) return false
        val body = o + hdr
        if (ascii(b, oi + 4, "moov") || ascii(b, oi + 4, "trak")) {
          if (!walk(body, boxEnd, depth + 1)) return false
        } else if (ascii(b, oi + 4, "mvhd") && dur == null) {
          if (body + 4 > boxEnd) return false
          val v = b(body.toInt) & 0xff
          if (v == 0 && body + 20 <= boxEnd) {
            val ts = be32(b, body.toInt + 12) & 0xffffffffL
            val d = be32(b, body.toInt + 16) & 0xffffffffL
            if (ts > 0) dur = java.lang.Long.valueOf(d * 1000L / ts)
          } else if (v == 1 && body + 32 <= boxEnd) {
            val ts = be32(b, body.toInt + 20) & 0xffffffffL
            val d = be64(b, body.toInt + 24)
            if (ts > 0 && d >= 0) dur = java.lang.Long.valueOf(d * 1000L / ts)
          }
        } else if (ascii(b, oi + 4, "tkhd") && w == null) {
          if (body + 4 > boxEnd) return false
          val v = b(body.toInt) & 0xff
          val wOff = if (v == 1) 88L else 76L
          if (body + wOff + 8 <= boxEnd) {
            // 16.16 fixed point; integer part only
            val tw = be32(b, (body + wOff).toInt) >>> 16
            val th = be32(b, (body + wOff + 4).toInt) >>> 16
            if (tw > 0 && th > 0) { w = Int.box(tw); h = Int.box(th) }
          }
        }
        if (boxEnd <= o) return false // no progress => malformed
        o = boxEnd
      }
      true
    }
    if (!walk(0L, n.toLong, 0)) return Unknown
    if (w == null && dur == null) Unknown
    else Sniffed("mp4", w, h, null, null, dur)
  }

  /** TIFF 6.0 IFD0 entry scan: ImageWidth (0x0100) / ImageLength (0x0101),
    * value type SHORT (3) or LONG (4), count 1 — the inline-value layout
    * every baseline TIFF and EXIF thumbnail uses.
    */
  private def sniffTiff(b: Array[Byte], n: Int, bigEndian: Boolean): Sniffed = {
    def u16(o: Int): Int = if (bigEndian) be16(b, o) else le16(b, o)
    def u32(o: Int): Long =
      (if (bigEndian) be32(b, o) else le32(b, o)) & 0xffffffffL
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > n) return Unknown
    val count = u16(ifd.toInt)
    var w: Integer = null; var h: Integer = null
    var i = 0
    while (i < count) {
      val e = ifd + 2 + 12L * i
      if (e + 12 > n) return Unknown
      val tag = u16(e.toInt)
      val typ = u16(e.toInt + 2)
      val cnt = u32(e.toInt + 4)
      if ((tag == 0x0100 || tag == 0x0101) && cnt == 1L) {
        // SHORT values sit in the value field's FIRST two bytes
        // (TIFF 6.0 §2: values are left-justified in the 4-byte field)
        val v: Long =
          if (typ == 3) u16(e.toInt + 8).toLong
          else if (typ == 4) u32(e.toInt + 8)
          else -1L
        if (v > 0 && v <= Int.MaxValue) {
          if (tag == 0x0100) w = Int.box(v.toInt) else h = Int.box(v.toInt)
        }
      }
      i += 1
    }
    if (w == null || h == null) Unknown else Sniffed("tiff", w, h, null, null, null)
  }

  /** Adds (media_kind, width, height, sample_rate, channels, duration_ms)
    * parsed from `bytesCol`. Pure per-partition projection — no shuffle,
    * payloads never move.
    */
  def parseHeaders(df: DataFrame, bytesCol: String): DataFrame = {
    val schema = df.schema
      .add("media_kind", StringType)
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("sample_rate", IntegerType)
      .add("channels", IntegerType)
      .add("duration_ms", LongType)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val s = sniff(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq ++
          Seq(s.kind, s.width, s.height, s.sampleRate, s.channels, s.durationMs))
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
    * (8000 + (idCol/4) % 8 · 4000) Hz, 1 + (idCol/4) % 2 channels —
    * derived from id/4 because the %4 kind selector fixes id's low bits
    * (id%4==3 ⇒ id odd), which would otherwise degenerate channels to a
    * constant 2 and rates to two values. The JPEG
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
          case _ => wavBytes(8000 + ((id / 4) % 8).toInt * 4000, 1 + ((id / 4) % 2).toInt)
        }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(Encoders.row(schema))
  }

  /** v2 fixture: ISO-BMFF (MP4) and TIFF container layouts, same
    * methodology as [[synthHeaderPayload]] — real spec layouts, geometry
    * derived from integer columns so a SQL oracle can state the expected
    * parse without reading bytes. kind alternates mp4/tiff on
    * `idCol % 2`; dims are (dimCol % 1000 + 1) × (idCol % 500 + 1); mp4
    * duration is (idCol % 3600 + 1) whole seconds written at the classic
    * timescale 600 (units = seconds · 600, so duration_ms recovers
    * exactly as seconds · 1000 — integer-statable). Box/IFD layout knobs
    * the oracle can't see are varied from id/2 and id/4 so both mvhd/tkhd
    * versions (v0/v1), both TIFF byte orders (II/MM), and both dimension
    * value types (SHORT/LONG) are exercised.
    */
  def synthContainerPayload(df: DataFrame, idCol: String, dimCol: String): DataFrame = {
    val schema = df.schema.add("bytes", BinaryType)
    val idIdx = df.schema.fieldIndex(idCol)
    val dimIdx = df.schema.fieldIndex(dimCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getAs[Number](idIdx).longValue()
        val dim = r.getAs[Number](dimIdx).longValue()
        val w = (dim % 1000 + 1).toInt
        val h = (id % 500 + 1).toInt
        val bytes =
          if (id % 2 == 0)
            mp4Bytes(w, h, durSec = (id % 3600 + 1).toInt, v1 = (id / 2) % 2 == 1)
          else
            tiffBytes(w, h, bigEndian = (id / 2) % 2 == 1, longDims = (id / 4) % 2 == 1)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(Encoders.row(schema))
  }

  /** Minimal spec-complete ISO-BMFF: ftyp + moov[mvhd, trak[tkhd]].
    * mvhd/tkhd at `v1 = true` use the 64-bit time variant (version 1).
    */
  private def mp4Bytes(w: Int, h: Int, durSec: Int, v1: Boolean): Array[Byte] = {
    val timescale = 600
    val durUnits = durSec.toLong * timescale
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      writeBe32(out, 8 + payload.length)
      out.write(tpe.getBytes("US-ASCII"))
      out.write(payload)
      out.toByteArray
    }
    val ftyp = box("ftyp", {
      val o = new java.io.ByteArrayOutputStream()
      o.write("isom".getBytes("US-ASCII")); writeBe32(o, 512)
      o.write("isom".getBytes("US-ASCII")) // one compatible brand
      o.toByteArray
    })
    val mvhd = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(if (v1) 1 else 0); o.write(Array[Byte](0, 0, 0)) // version, flags
      if (v1) { writeBe64(o, 0L); writeBe64(o, 0L) } // ctime, mtime
      else { writeBe32(o, 0); writeBe32(o, 0) }
      writeBe32(o, timescale)
      if (v1) writeBe64(o, durUnits) else writeBe32(o, durUnits.toInt)
      writeBe32(o, 0x00010000) // rate 1.0
      o.write(Array[Byte](0x01, 0x00)) // volume 1.0
      o.write(Array.fill[Byte](2 + 8)(0)) // reserved
      writeMatrix(o)
      o.write(Array.fill[Byte](24)(0)) // pre_defined
      writeBe32(o, 2) // next_track_ID
      box("mvhd", o.toByteArray)
    }
    val tkhd = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(if (v1) 1 else 0); o.write(Array[Byte](0, 0, 7)) // flags: enabled
      if (v1) { writeBe64(o, 0L); writeBe64(o, 0L) }
      else { writeBe32(o, 0); writeBe32(o, 0) }
      writeBe32(o, 1) // track_ID
      writeBe32(o, 0) // reserved
      if (v1) writeBe64(o, durUnits) else writeBe32(o, durUnits.toInt)
      o.write(Array.fill[Byte](8)(0)) // reserved
      o.write(Array.fill[Byte](2 + 2 + 2 + 2)(0)) // layer/alt_group/volume/res
      writeMatrix(o)
      writeBe32(o, w << 16); writeBe32(o, h << 16) // 16.16 fixed
      box("tkhd", o.toByteArray)
    }
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov
  }

  private def writeMatrix(o: java.io.ByteArrayOutputStream): Unit = {
    // identity: 0x00010000, 0, 0 / 0, 0x00010000, 0 / 0, 0, 0x40000000
    val m = Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    m.foreach(writeBe32(o, _))
  }

  /** Minimal TIFF 6.0: header + IFD0 with sorted entries (ImageWidth,
    * ImageLength, BitsPerSample, PhotometricInterpretation), no next IFD.
    * `longDims` writes the dimensions as LONG (type 4) instead of SHORT.
    */
  private def tiffBytes(w: Int, h: Int, bigEndian: Boolean, longDims: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (bigEndian) writeBe16Pair(out, v) else writeLe16(out, v)
    def w32(v: Int): Unit =
      if (bigEndian) writeBe32(out, v) else writeLe32(out, v)
    out.write((if (bigEndian) "MM" else "II").getBytes("US-ASCII"))
    w16(42)
    w32(8) // IFD0 right after the header
    w16(4) // entry count
    def entry(tag: Int, typ: Int, value: Int): Unit = {
      w16(tag); w16(typ); w32(1)
      if (typ == 3) { w16(value); w16(0) } // SHORT: left-justified
      else w32(value)
    }
    val dimType = if (longDims) 4 else 3
    entry(0x0100, dimType, w) // ImageWidth
    entry(0x0101, dimType, h) // ImageLength
    entry(0x0102, 3, 8)       // BitsPerSample
    entry(0x0106, 3, 1)       // PhotometricInterpretation
    w32(0) // no next IFD
    out.toByteArray
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
  private def writeBe64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeBe32(o, (v >>> 32).toInt); writeBe32(o, v.toInt)
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
