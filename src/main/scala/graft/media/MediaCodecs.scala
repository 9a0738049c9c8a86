package graft.media

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL image/audio codecs in pure JVM bytes — no external libraries.
  *
  * The round-7..11 media surface stopped at container-header metadata
  * because "the container has no codecs"; that is only true of the
  * compressed-DCT formats. PNG is zlib (java.util.zip) + four byte-level
  * row filters, BMP is bare pixels, WAV-PCM is bare samples — all
  * decodable (and encodable, for fixtures) with nothing beyond the JDK.
  * Baseline JPEG (Huffman + IDCT) lives in [[JpegCodec]] and MP4
  * sample-table indexing in [[Mp4Index]] (r13); H.264/HEVC entropy
  * decode is the one remaining documented boundary.
  *
  * Decoded surface: `Image(w, h, channels, pixels)` with row-major
  * interleaved 8-bit samples, `Audio(sampleRate, channels, samples)` with
  * interleaved 16-bit PCM. Everything is deterministic and
  * executor-local; these run inside `mapPartitions` batches
  * (MediaDecode) so pixels never cross a shuffle.
  */
object MediaCodecs {

  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  // ------------------------------------------------------------------ PNG

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** 8-bit non-interlaced PNG: gray / gray+alpha / RGB / RGBA, all five
    * row filters. Throws with a precise message on anything else.
    */
  def decodePng(b: Array[Byte]): Image = {
    require(b.length > 8 && PngSig.indices.forall(i => b(i) == PngSig(i)), "not a PNG")
    var o = 8
    var w = 0; var h = 0; var channels = 0
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && o + 8 <= b.length) {
      val len = be32(b, o); val tpe = new String(b, o + 4, 4, "US-ASCII")
      val data = o + 8
      require(len >= 0 && data + len + 4 <= b.length, s"truncated PNG chunk $tpe")
      tpe match {
        case "IHDR" =>
          require(len >= 13, "short IHDR")
          w = be32(b, data); h = be32(b, data + 4)
          val bitDepth = b(data + 8) & 0xff
          val colorType = b(data + 9) & 0xff
          val interlace = b(data + 12) & 0xff
          require(bitDepth == 8, s"unsupported PNG bit depth $bitDepth (only 8)")
          require(interlace == 0, "interlaced PNG not supported")
          channels = colorType match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
            case 3 => throw new IllegalArgumentException(
              "palette PNG not supported")
            case ct => throw new IllegalArgumentException(s"bad PNG color type $ct")
          }
        case "IDAT" => idat.write(b, data, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      o = data + len + 4
    }
    require(w > 0 && h > 0 && channels > 0, "PNG without IHDR")
    val stride = w * channels
    val raw = inflate(idat.toByteArray, (stride + 1) * h)
    require(raw.length == (stride + 1) * h,
      s"PNG inflate size ${raw.length} != ${(stride + 1) * h}")
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val filter = raw(y * (stride + 1)) & 0xff
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val rawV = raw(src + x) & 0xff
        val a = if (x >= channels) out(dst + x - channels) & 0xff else 0
        val up = if (y > 0) out(dst - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= channels) out(dst - stride + x - channels) & 0xff else 0
        val rec = filter match {
          case 0 => rawV
          case 1 => rawV + a
          case 2 => rawV + up
          case 3 => rawV + ((a + up) >> 1)
          case 4 => rawV + paeth(a, up, ul)
          case f => throw new IllegalArgumentException(s"bad PNG filter $f at row $y")
        }
        out(dst + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Image(w, h, channels, out)
  }

  /** Fixture/export encoder: filter-0 rows, one IDAT. `filters` optionally
    * assigns a per-row filter (0-4) so specs can exercise every decode
    * path with round-trip-exact data.
    */
  def encodePng(img: Image, filters: Int => Int = _ => 0): Array[Byte] = {
    val Image(w, h, ch, px) = img
    require(px.length == w * h * ch, "pixel buffer size mismatch")
    val colorType = ch match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case c => throw new IllegalArgumentException(s"unsupported channel count $c")
    }
    val stride = w * ch
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val f = filters(y); require(f >= 0 && f <= 4, s"bad filter $f")
      raw(y * (stride + 1)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = px(y * stride + x) & 0xff
        val a = if (x >= ch) px(y * stride + x - ch) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= ch) px((y - 1) * stride + x - ch) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - up
          case 3 => cur - ((a + up) >> 1)
          case 4 => cur - paeth(a, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = colorType.toByte; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeChunk(out: ByteArrayOutputStream, tpe: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putBe32(len, 0, data.length)
    out.write(len, 0, 4)
    val t = tpe.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32(); crc.update(t); crc.update(data)
    val c = new Array[Byte](4); putBe32(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(z: Array[Byte], expect: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(z)
    val out = new ByteArrayOutputStream(expect)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) out.write(buf, 0, inf.inflate(buf))
    inf.end()
    out.toByteArray
  }

  // ------------------------------------------------------------------ BMP

  /** Uncompressed 24/32-bit BMP (BITMAPINFOHEADER), bottom-up or
    * top-down. Output is row-major RGB (alpha dropped for 32-bit).
    */
  def decodeBmp(b: Array[Byte]): Image = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP")
    val dataOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    require(compression == 0, s"compressed BMP (method $compression) not supported")
    require(bpp == 24 || bpp == 32, s"unsupported BMP bpp $bpp (24/32 only)")
    val bytesPerPx = bpp / 8
    val rowSize = ((w * bytesPerPx + 3) / 4) * 4
    require(dataOff + rowSize.toLong * h <= b.length, "truncated BMP pixel data")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOff + (if (topDown) y else h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val s = srcRow + x * bytesPerPx
        val d = (y * w + x) * 3
        out(d) = b(s + 2) // BMP stores BGR(A)
        out(d + 1) = b(s + 1)
        out(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Image(w, h, 3, out)
  }

  /** 24-bit bottom-up BMP from row-major RGB pixels. */
  def encodeBmp(img: Image): Array[Byte] = {
    require(img.channels == 3, "BMP encoder takes RGB")
    val Image(w, h, _, px) = img
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val b = new Array[Byte](54 + dataSize)
    b(0) = 'B'; b(1) = 'M'
    putLe32(b, 2, 54 + dataSize); putLe32(b, 10, 54)
    putLe32(b, 14, 40); putLe32(b, 18, w); putLe32(b, 22, h)
    putLe16(b, 26, 1); putLe16(b, 28, 24); putLe32(b, 34, dataSize)
    var y = 0
    while (y < h) {
      val dstRow = 54 + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        val d = dstRow + x * 3
        b(d) = px(s + 2); b(d + 1) = px(s + 1); b(d + 2) = px(s)
        x += 1
      }
      y += 1
    }
    b
  }

  // ------------------------------------------------------------------ GIF

  /** GIF87a/89a first frame: variable-width LZW (LSB-first, dictionary
    * growth to 12 bits, clear/EOF codes), global or local color table,
    * optional interlace, extensions skipped. Output row-major RGB.
    */
  def decodeGif(b: Array[Byte]): Image = {
    require(b.length > 13 && ascii(b, 0, "GIF8") &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a', "not a GIF")
    val flags = b(10) & 0xff
    var o = 13
    var gct: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      gct = java.util.Arrays.copyOfRange(b, o, o + n * 3)
      o += n * 3
    }
    // truncated input must surface as a precise message, never a bare
    // ArrayIndexOutOfBounds from a sub-block walk running off the buffer
    def at(i: Int): Int = {
      require(i < b.length, s"truncated GIF: need byte $i of ${b.length}")
      b(i) & 0xff
    }
    while (o < b.length) {
      at(o) match {
        case 0x21 => // extension: label + sub-blocks
          o += 2
          while (at(o) != 0) o += at(o) + 1
          o += 1
        case 0x2c => // image descriptor — decode this (first) frame
          require(o + 10 <= b.length, "truncated GIF image descriptor")
          val w = le16(b, o + 5); val h = le16(b, o + 7)
          val iflags = b(o + 9) & 0xff
          val interlaced = (iflags & 0x40) != 0
          o += 10
          var ct = gct
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            ct = java.util.Arrays.copyOfRange(b, o, o + n * 3)
            o += n * 3
          }
          require(ct != null, "GIF image without a color table")
          val minCode = at(o); o += 1
          // concatenate the data sub-blocks
          val data = new ByteArrayOutputStream()
          while (at(o) != 0) {
            val n = b(o) & 0xff
            require(o + 1 + n <= b.length,
              s"truncated GIF data sub-block at byte $o")
            data.write(b, o + 1, n)
            o += n + 1
          }
          val indices = lzwDecode(data.toByteArray, minCode, w * h)
          // lzwDecode returns what the stream yields — a truncated/corrupt
          // stream can fall short of a full frame
          require(indices.length >= w * h,
            s"truncated GIF LZW stream: ${indices.length} of ${w * h} pixels")
          val out = new Array[Byte](w * h * 3)
          val rowOrder =
            if (!interlaced) 0 until h
            else (0 until h by 8) ++ (4 until h by 8) ++
              (2 until h by 4) ++ (1 until h by 2)
          var i = 0
          rowOrder.foreach { y =>
            var x = 0
            while (x < w) {
              val idx = indices(i) & 0xff
              require(idx * 3 + 2 < ct.length, s"GIF index $idx outside color table")
              val d = (y * w + x) * 3
              out(d) = ct(idx * 3); out(d + 1) = ct(idx * 3 + 1); out(d + 2) = ct(idx * 3 + 2)
              i += 1; x += 1
            }
          }
          return Image(w, h, 3, out)
        case 0x3b => throw new IllegalArgumentException("GIF trailer before any image")
        case t => throw new IllegalArgumentException(f"bad GIF block 0x$t%02x")
      }
    }
    throw new IllegalArgumentException("GIF without an image descriptor")
  }

  private def lzwDecode(z: Array[Byte], minCode: Int, expect: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eof = clear + 1
    val out = new ByteArrayOutputStream(expect)
    // dictionary: prefix code + appended byte per entry
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictSize = eof + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0L; var bits = 0; var pos = 0
    val first = new Array[Byte](4096) // first byte of each code's expansion
    var i = 0
    while (i < clear) { suffix(i) = i.toByte; first(i) = i.toByte; i += 1 }
    def expand(code: Int): Unit = {
      // walk the chain into a scratch, emit reversed
      var c = code; var n = 0
      val scratch = new Array[Byte](4096)
      while (c >= clear + 2) { scratch(n) = suffix(c); n += 1; c = prefix(c) }
      scratch(n) = suffix(c); n += 1
      while (n > 0) { n -= 1; out.write(scratch(n)) }
    }
    while (pos < z.length && out.size < expect) {
      acc |= (z(pos) & 0xffL) << bits
      bits += 8; pos += 1
      while (bits >= width && out.size < expect) {
        val code = (acc & ((1L << width) - 1)).toInt
        acc >>>= width; bits -= width
        if (code == clear) {
          dictSize = eof + 1; width = minCode + 1; prev = -1
        } else if (code == eof) {
          return out.toByteArray
        } else {
          require(code < dictSize || (code == dictSize && prev >= 0),
            s"corrupt GIF LZW code $code (dict $dictSize)")
          if (prev < 0) {
            expand(code)
          } else {
            if (code == dictSize) {
              // KwKwK case: expansion = expand(prev) + first(prev)
              expand(prev); out.write(first(prev))
            } else expand(code)
            if (dictSize < 4096) {
              prefix(dictSize) = prev
              suffix(dictSize) = if (code == dictSize) first(prev) else first(code)
              first(dictSize) = first(prev)
              dictSize += 1
              if (dictSize == (1 << width) && width < 12) width += 1
            }
          }
          if (code < clear) first(code) = code.toByte
          prev = code
        }
      }
    }
    out.toByteArray
  }

  /** Indexed-GIF encoder for fixtures/round-trips: a palette (≤256 RGB
    * entries) + index map, optionally interlaced. The LZW stream emits a
    * CLEAR before every literal (the classic "uncompressed GIF" shape —
    * bigger but universally decodable, incl. by [[decodeGif]]).
    */
  def encodeGif(
      width: Int, height: Int, palette: Array[Byte], indices: Array[Byte],
      interlaced: Boolean = false): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length <= 768, "bad palette")
    require(indices.length == width * height, "index buffer size mismatch")
    val nColors = palette.length / 3
    var ctBits = 1
    while ((1 << ctBits) < nColors) ctBits += 1
    val ctSize = 1 << ctBits
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    out.write(0x80 | (ctBits - 1)) // GCT present, size
    out.write(0); out.write(0)
    out.write(palette, 0, palette.length)
    var i = palette.length
    while (i < ctSize * 3) { out.write(0); i += 1 }
    // image descriptor
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    out.write(if (interlaced) 0x40 else 0x00)
    val minCode = math.max(2, ctBits)
    out.write(minCode)
    val clear = 1 << minCode
    // bit packer, LSB-first
    val lzw = new ByteArrayOutputStream()
    var acc = 0L; var bits = 0
    val w = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << bits; bits += w
      while (bits >= 8) { lzw.write((acc & 0xff).toInt); acc >>>= 8; bits -= 8 }
    }
    val rowOrder =
      if (!interlaced) 0 until height
      else (0 until height by 8) ++ (4 until height by 8) ++
        (2 until height by 4) ++ (1 until height by 2)
    rowOrder.foreach { y =>
      var x = 0
      while (x < width) {
        put(clear) // keep the dictionary empty: width never grows
        put(indices(y * width + x) & 0xff)
        x += 1
      }
    }
    put(clear + 1) // EOF
    if (bits > 0) lzw.write((acc & 0xff).toInt)
    val z = lzw.toByteArray
    var off = 0
    while (off < z.length) {
      val n = math.min(255, z.length - off)
      out.write(n); out.write(z, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------------ WAV

  /** PCM WAV: 16-bit (and 8-bit unsigned, widened) via the fmt/data
    * chunk walk — extra chunks (LIST, fact) are skipped like a real
    * reader must.
    */
  def decodeWav(b: Array[Byte]): Audio = {
    require(b.length >= 44 && ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE"), "not a WAV")
    var o = 12
    var rate = 0; var channels = 0; var bits = 0
    var samples: Array[Short] = null
    while (o + 8 <= b.length && (samples == null || rate == 0)) {
      val id = new String(b, o, 4, "US-ASCII")
      val len = le32(b, o + 4)
      val data = o + 8
      require(len >= 0 && data + len <= b.length, s"truncated WAV chunk $id")
      id match {
        case "fmt " =>
          val fmt = le16(b, data)
          require(fmt == 1, s"non-PCM WAV (format $fmt) not supported")
          channels = le16(b, data + 2)
          rate = le32(b, data + 4)
          bits = le16(b, data + 14)
          require(bits == 16 || bits == 8, s"unsupported WAV bit depth $bits")
        case "data" =>
          require(bits != 0, "WAV data before fmt")
          val n = len / (bits / 8)
          samples = new Array[Short](n)
          var i = 0
          if (bits == 16) while (i < n) { samples(i) = le16s(b, data + i * 2); i += 1 }
          else while (i < n) { samples(i) = (((b(data + i) & 0xff) - 128) << 8).toShort; i += 1 }
        case _ => ()
      }
      o = data + len + (len & 1) // RIFF chunks are 2-byte aligned
    }
    require(rate > 0 && samples != null, "WAV without fmt/data")
    Audio(rate, channels, samples)
  }

  def encodeWav(a: Audio): Array[Byte] = {
    val n = a.samples.length
    val b = new Array[Byte](44 + n * 2)
    def asc(o: Int, s: String): Unit = { var i = 0; while (i < s.length) { b(o + i) = s.charAt(i).toByte; i += 1 } }
    asc(0, "RIFF"); putLe32(b, 4, 36 + n * 2); asc(8, "WAVE")
    asc(12, "fmt "); putLe32(b, 16, 16); putLe16(b, 20, 1)
    putLe16(b, 22, a.channels); putLe32(b, 24, a.sampleRate)
    putLe32(b, 28, a.sampleRate * a.channels * 2); putLe16(b, 32, a.channels * 2)
    putLe16(b, 34, 16)
    asc(36, "data"); putLe32(b, 40, n * 2)
    var i = 0
    while (i < n) { putLe16(b, 44 + i * 2, a.samples(i) & 0xffff); i += 1 }
    b
  }

  // -------------------------------------------------------------- helpers

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le16s(b: Array[Byte], o: Int): Short = le16(b, o).toShort
  private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    s.indices.forall(i => b(o + i) == s.charAt(i).toByte)
  private def putBe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v >>> 24).toByte; b(o + 1) = (v >>> 16).toByte
    b(o + 2) = (v >>> 8).toByte; b(o + 3) = v.toByte
  }
  private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >>> 8).toByte
    b(o + 2) = (v >>> 16).toByte; b(o + 3) = (v >>> 24).toByte
  }
  private def putLe16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >>> 8).toByte
  }
}
