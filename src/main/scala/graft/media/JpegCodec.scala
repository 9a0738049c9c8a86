package graft.media

import java.io.ByteArrayOutputStream

import graft.media.MediaCodecs.Image

/** Baseline sequential JPEG (ITU-T T.81, public spec): pure-JVM Huffman
  * entropy decode, dequantization, 2-D IDCT and YCbCr->RGB — retiring the
  * repo's last media-decode stub. Scope (documented): baseline DCT
  * (SOF0), 8-bit samples, 1 or 3 components at sampling factors 1x1
  * (grayscale / 4:4:4), optional restart markers. Progressive (SOF2),
  * arithmetic coding and subsampled chroma are REJECTED loudly — a
  * precise error, never a wrong image.
  *
  * Exactness contract the gates rely on: a FLAT 8x8 block holds only its
  * DC coefficient (AC of a constant block is identically zero), and with
  * DC quantizer 1 the IDCT of a DC-only block is the constant S00/8 + 128
  * — integer-exact under ANY conforming IDCT, no rounding ambiguity. So
  * closed-form TILED fixtures decode bit-exactly and a SQL oracle can
  * recompute every pixel: the same oracle trick the PNG/BMP/GIF fixtures
  * use, adapted to the one lossless corner of a lossy codec. General
  * (non-flat) content round-trips within IDCT rounding and is spec-tested
  * against an independent naive IDCT.
  *
  * Reference mapping: vearch stores image payloads as opaque bytes (no
  * codec anywhere in the reference); this implements the public T.81
  * bitstream so decode-dependent operators (stats, aHash, resize) extend
  * to the dominant photographic container.
  */
object JpegCodec {

  // zigzag index -> natural (row-major) index
  private val Zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var i = 0; var x = 0; var y = 0; var up = true
    while (i < 64) {
      z(i) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
      i += 1
    }
    z
  }

  // T.81 Annex K.3 typical luminance Huffman tables (public spec tables)
  private val DcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).map(_.toByte).toArray
  private val AcBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Canonical Huffman table per T.81 F.2.2.3: decode by length-indexed
    * (mincode, maxcode, valptr); encode by symbol -> (code, length).
    */
  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val symbols: Array[Int] = vals.map(_ & 0xff)
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        var i = 0
        while (i < bits(l)) {
          codeOf(vals(k) & 0xff) = code
          lenOf(vals(k) & 0xff) = l
          code += 1; k += 1; i += 1
        }
        maxCode(l) = code - 1
        if (bits(l) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  private val DcHuff = new Huff(DcBits, DcVals)
  private val AcHuff = new Huff(AcBits, AcVals)

  // cos((2x+1) u pi / 16) — 64 distinct values shared by FDCT and IDCT;
  // evaluating math.cos per (x,y,u,v) pair made encode 10x slower than
  // the table at fixture scale
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val InvSqrt2 = 1.0 / math.sqrt(2)

  // ------------------------------------------------------------- encoder

  private def fdctQuant(block: Array[Int], q: Array[Int]): Array[Int] = {
    // T.81 A.3.3 FDCT in double precision, then round-to-nearest quantize
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            s += block(y * 8 + x) * CosT(x)(u) * CosT(y)(v)
            y += 1
          }
          x += 1
        }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        val coef = 0.25 * cu * cv * s
        out(v * 8 + u) = math.round(coef / q(v * 8 + u)).toInt
        v += 1
      }
      u += 1
    }
    out
  }

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0L
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val b = ((acc >> (nBits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nBits -= 8
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1-bits per spec
      val pad = 8 - nBits
      put((1 << pad) - 1, pad)
    }
  }

  private def category(v: Int): Int = {
    var m = math.abs(v); var c = 0
    while (m != 0) { m >>= 1; c += 1 }
    c
  }

  /** Encode baseline JPEG: grayscale (channels=1) or YCbCr color
    * (channels=3, BT.601 rounding) at 4:4:4 or — with `subsample420` —
    * 4:2:0 (luma 2x2, chroma quarter-res via rounded 2x2 box average).
    * `qDc`/`qAc` fill the single quantization table (DC position gets
    * qDc, the 63 AC positions qAc) — qDc=1 is the DC-exact operating
    * point the fixtures use.
    */
  def encodeJpeg(img: Image, qDc: Int = 1, qAc: Int = 16,
      subsample420: Boolean = false, restartInterval: Int = 0): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"encodeJpeg: 1 or 3 channels, got ${img.channels}")
    // a zero/negative quant divides the FDCT by <= 0 — coefficients blow
    // past the Annex K symbol range and the old encoder emitted a
    // silently CORRUPT bitstream (the symbol guards below now also catch
    // it, but the precise error belongs at the API edge)
    require(qDc >= 1 && qAc >= 1,
      s"encodeJpeg: quant steps must be >= 1, got qDc=$qDc qAc=$qAc")
    val w = img.width; val h = img.height
    val nc = img.channels
    // planar component samples (level-shift happens at FDCT input)
    val planes = Array.fill(nc)(new Array[Int](w * h))
    var i = 0
    while (i < w * h) {
      if (nc == 1) planes(0)(i) = (img.pixels(i) & 0xff) - 128
      else {
        val r = img.pixels(i * 3) & 0xff
        val g = img.pixels(i * 3 + 1) & 0xff
        val b = img.pixels(i * 3 + 2) & 0xff
        planes(0)(i) = (math.round(0.299 * r + 0.587 * g + 0.114 * b)).toInt - 128
        planes(1)(i) = (math.round(-0.168736 * r - 0.331264 * g + 0.5 * b)).toInt
        planes(2)(i) = (math.round(0.5 * r - 0.418688 * g - 0.081312 * b)).toInt
      }
      i += 1
    }
    require(!subsample420 || nc == 3, "4:2:0 needs 3 channels")
    // 4:2:0: chroma planes shrink to quarter resolution (rounded 2x2 box
    // average, edge cells average whatever the image covers)
    val sub = subsample420
    val cw = if (sub) (w + 1) / 2 else w
    val chh = if (sub) (h + 1) / 2 else h
    val chroma: Array[Array[Int]] =
      if (!sub) Array(if (nc == 3) planes(1) else null,
        if (nc == 3) planes(2) else null)
      else Array.tabulate(2) { ci =>
        val src = planes(ci + 1)
        val d = new Array[Int](cw * chh)
        var yy = 0
        while (yy < chh) {
          var xx = 0
          while (xx < cw) {
            var sum = 0; var n = 0
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val px = xx * 2 + dx; val py = yy * 2 + dy
                if (px < w && py < h) { sum += src(py * w + px); n += 1 }
                dx += 1
              }
              dy += 1
            }
            d(yy * cw + xx) = math.round(sum.toDouble / n).toInt
            xx += 1
          }
          yy += 1
        }
        d
      }
    val q = Array.tabulate(64)(k => if (k == 0) qDc else qAc)
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); out.write(0x00) // DQT, Pq=0 Tq=0
    var k = 0
    while (k < 64) { out.write(q(Zigzag(k))); k += 1 } // stored in zigzag
    marker(0xc0) // SOF0
    u16(8 + 3 * nc); out.write(8); u16(h); u16(w); out.write(nc)
    var c = 0
    while (c < nc) {
      out.write(c + 1)
      out.write(if (sub && c == 0) 0x22 else 0x11)
      out.write(0)
      c += 1
    }
    def dht(tc: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); out.write(tc << 4)
      var l = 1
      while (l <= 16) { out.write(bits(l)); l += 1 }
      out.write(vals)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    if (restartInterval > 0) { // DRI
      marker(0xdd); u16(4); u16(restartInterval)
    }
    marker(0xda) // SOS
    u16(6 + 2 * nc); out.write(nc)
    c = 0
    while (c < nc) { out.write(c + 1); out.write(0x00); c += 1 } // DC 0 / AC 0
    out.write(0); out.write(63); out.write(0) // Ss/Se/AhAl
    val bw = new BitWriter(out)
    val pred = new Array[Int](nc)
    val mcuPx = if (sub) 16 else 8
    val mcusX = (w + mcuPx - 1) / mcuPx; val mcusY = (h + mcuPx - 1) / mcuPx
    // one data unit: FDCT + entropy-code an 8x8 block of component `c`
    // read from (plane, pw, ph) at origin (ox, oy) with replication pad
    def unit(c: Int, plane: Array[Int], pw0: Int, ph0: Int,
        ox: Int, oy: Int): Unit = {
      val block = new Array[Int](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val sx = math.min(ox + x, pw0 - 1)
          val sy = math.min(oy + y, ph0 - 1)
          block(y * 8 + x) = plane(sy * pw0 + sx)
          x += 1
        }
        y += 1
      }
      val coefs = fdctQuant(block, q)
      val diff = coefs(0) - pred(c)
      pred(c) = coefs(0)
      val s = category(diff)
      // a symbol missing from the Annex K tables would look up code 0 /
      // length 0 and bw.put(_, 0) is a no-op — a silently CORRUPT
      // bitstream. Reachable through the public qDc/qAc knobs (qDc=1 on
      // wide-range input yields DC categories beyond the table); the
      // file's contract is a precise error, never a wrong image.
      require(DcHuff.lenOf(s) > 0,
        f"JPEG DC symbol 0x$s%02x outside the Annex K table — " +
          "coefficient magnitude too large for baseline tables (raise qDc)")
      bw.put(DcHuff.codeOf(s), DcHuff.lenOf(s))
      if (s > 0)
        bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC run-length coding over zigzag order
      var run = 0
      var kk = 1
      while (kk < 64) {
        val v = coefs(Zigzag(kk))
        if (v == 0) run += 1
        else {
          while (run > 15) {
            bw.put(AcHuff.codeOf(0xf0), AcHuff.lenOf(0xf0)); run -= 16
          }
          val sz = category(v)
          val rs = (run << 4) | sz
          require(AcHuff.lenOf(rs) > 0,
            f"JPEG AC symbol 0x$rs%02x outside the Annex K table — " +
              "coefficient magnitude too large for baseline tables (raise qAc)")
          bw.put(AcHuff.codeOf(rs), AcHuff.lenOf(rs))
          bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
          run = 0
        }
        kk += 1
      }
      if (run > 0) bw.put(AcHuff.codeOf(0x00), AcHuff.lenOf(0x00)) // EOB
    }
    var my = 0
    var mcuIdx = 0
    var rstN = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // byte-align and emit RSTn between restart groups; DC predictors
        // reset on both sides (T.81 E.1.4)
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + rstN)
          rstN = (rstN + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        mcuIdx += 1
        if (!sub) {
          c = 0
          while (c < nc) {
            val plane = if (c == 0) planes(0) else chroma(c - 1)
            unit(c, plane, w, h, mx * 8, my * 8)
            c += 1
          }
        } else {
          // 4:2:0 MCU: 4 luma blocks (2x2 raster) then Cb, Cr
          var by = 0
          while (by < 2) {
            var bx = 0
            while (bx < 2) {
              unit(0, planes(0), w, h, (mx * 2 + bx) * 8, (my * 2 + by) * 8)
              bx += 1
            }
            by += 1
          }
          unit(1, chroma(0), cw, chh, mx * 8, my * 8)
          unit(2, chroma(1), cw, chh, mx * 8, my * 8)
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------- decoder

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nBits = 0
    def bit(): Int = {
      if (nBits == 0) {
        require(pos < b.length, "truncated JPEG entropy stream")
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          require(pos < b.length, "truncated JPEG after 0xFF")
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else if (m >= 0xd0 && m <= 0xd7) {
            // restart marker: consumed by resync(); reaching it mid-symbol
            // is a stream error
            throw new IllegalArgumentException("unexpected RST marker in JPEG stream")
          } else {
            // EOI or other marker reached while bits were still needed
            throw new IllegalArgumentException(
              f"truncated JPEG: marker 0xff$m%02x inside entropy data")
          }
          v = 0xff
        }
        acc = v; nBits = 8
      }
      nBits -= 1
      ((acc >> nBits) & 1).toInt
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Align to a restart marker (DRI resync): drop partial bits, expect
      * FFD0+((n)%8).
      */
    def resync(): Unit = {
      nBits = 0
      require(pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
        ((b(pos + 1) & 0xff) & 0xf8) == 0xd0, "JPEG: expected restart marker")
      pos += 2
    }
  }

  // T.81 F.2.2.3 DECODE: extend the code one bit at a time until it falls
  // inside some length's [mincode, maxcode] window
  private def huffDecode(br: BitReader, t: Huff): Int = {
    var code = br.bit()
    var l = 1
    while (l <= 16) {
      if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
        return t.symbols(t.valPtr(l) + code - t.minCode(l))
      code = (code << 1) | br.bit()
      l += 1
    }
    throw new IllegalArgumentException("invalid JPEG Huffman code")
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def idct(coefs: Array[Int]): Array[Int] = {
    // T.81 A.3.3 IDCT in double precision; callers level-shift + clamp
    val out = new Array[Int](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val cu = if (u == 0) InvSqrt2 else 1.0
            val cv = if (v == 0) InvSqrt2 else 1.0
            s += cu * cv * coefs(v * 8 + u) * CosT(x)(u) * CosT(y)(v)
            v += 1
          }
          u += 1
        }
        val p = math.round(s / 4.0).toInt + 128
        out(y * 8 + x) = math.max(0, math.min(255, p))
        y += 1
      }
      x += 1
    }
    out
  }

  private def clamp8(v: Double): Int =
    math.max(0, math.min(255, math.round(v).toInt))

  /** Decode a baseline sequential JPEG. Returns Image(w, h, 1|3, pixels)
    * — grayscale stays 1-channel, color comes back as interleaved RGB.
    */
  def decodeJpeg(b: Array[Byte]): Image = {
    require(b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      "not a JPEG (missing SOI)")
    var pos = 2
    def u16(o: Int): Int = {
      require(o + 1 < b.length, "truncated JPEG segment")
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    }
    def segLen(): Int = {
      val len = u16(pos)
      require(len >= 2 && pos + len <= b.length, "truncated JPEG segment")
      len
    }
    val quant = Array.fill(4)(null: Array[Int])
    val dcTables = Array.fill(4)(null: Huff)
    val acTables = Array.fill(4)(null: Huff)
    var w = 0; var h = 0
    var nc = 0
    var compQ: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var restartInterval = 0
    var sosComps: Array[(Int, Int, Int)] = null // (compIdx, dcT, acT)

    while (pos < b.length) {
      require(pos + 1 < b.length, "truncated JPEG: marker cut short")
      require((b(pos) & 0xff) == 0xff, f"bad JPEG marker alignment at $pos")
      val m = b(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd9 => throw new IllegalArgumentException("JPEG EOI before scan data")
        case 0xdb => // DQT
          val len = segLen(); var o = pos + 2
          while (o < pos + len) {
            val pq = (b(o) & 0xff) >> 4; val tq = b(o) & 0x0f
            require(pq == 0, "JPEG: only 8-bit quant tables supported")
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(Zigzag(k)) = b(o + 1 + k) & 0xff; k += 1 }
            quant(tq) = t
            o += 65
          }
          pos += len
        case 0xc4 => // DHT
          val len = segLen(); var o = pos + 2
          while (o < pos + len) {
            val tc = (b(o) & 0xff) >> 4; val th = b(o) & 0x0f
            val bits = new Array[Int](17)
            var n = 0
            var l = 1
            while (l <= 16) { bits(l) = b(o + l) & 0xff; n += bits(l); l += 1 }
            require(o + 17 + n <= pos + len, "truncated JPEG DHT")
            val vals = java.util.Arrays.copyOfRange(b, o + 17, o + 17 + n)
            val tab = new Huff(bits, vals)
            if (tc == 0) dcTables(th) = tab else acTables(th) = tab
            o += 17 + n
          }
          pos += len
        case 0xc0 | 0xc1 => // SOF0 (and SOF1 extended sequential: same decode)
          val len = segLen()
          require((b(pos + 2) & 0xff) == 8, "JPEG: only 8-bit precision supported")
          h = u16(pos + 3); w = u16(pos + 5)
          nc = b(pos + 7) & 0xff
          require(nc == 1 || nc == 3, s"JPEG: 1 or 3 components supported, got $nc")
          compQ = new Array[Int](nc)
          compH = new Array[Int](nc)
          compV = new Array[Int](nc)
          var c = 0
          while (c < nc) {
            val hv = b(pos + 9 + c * 3) & 0xff
            compH(c) = hv >> 4; compV(c) = hv & 0x0f
            // supported grid: factors 1 or 2, chroma always 1x1 — covers
            // grayscale, 4:4:4, 4:2:0 (2,2) and 4:2:2 (2,1)/(1,2)
            require(compH(c) >= 1 && compH(c) <= 2 &&
              compV(c) >= 1 && compV(c) <= 2 &&
              (c == 0 || hv == 0x11),
              f"JPEG: unsupported sampling 0x$hv%02x for component $c " +
                "(luma 1..2, chroma 1x1)")
            compQ(c) = b(pos + 10 + c * 3) & 0x0f
            c += 1
          }
          if (nc == 1) { compH(0) = 1; compV(0) = 1 } // non-interleaved gray
          pos += len
        case 0xc2 => throw new IllegalArgumentException(
          "progressive JPEG (SOF2) not supported (baseline decoder)")
        case sof if sof >= 0xc3 && sof <= 0xcf && sof != 0xc8 =>
          throw new IllegalArgumentException(
            f"unsupported JPEG frame type 0xff$sof%02x (baseline decoder)")
        case 0xdd => // DRI
          val len = segLen()
          restartInterval = u16(pos + 2)
          pos += len
        case 0xda => // SOS -> entropy-coded segment follows
          val len = segLen()
          val ns = b(pos + 2) & 0xff
          require(ns == nc, "JPEG: single interleaved scan expected")
          sosComps = Array.tabulate(ns) { j =>
            val cs = b(pos + 3 + j * 2) & 0xff
            val tt = b(pos + 4 + j * 2) & 0xff
            (cs - 1, tt >> 4, tt & 0x0f)
          }
          pos += len
          // ---- entropy decode (interleaved MCUs, general h/v grid) ----
          require(w > 0 && h > 0, "JPEG SOS before SOF")
          val hmax = compH.max; val vmax = compV.max
          val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
          val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
          // per-component plane, padded to its own whole-block grid
          val pw = Array.tabulate(nc)(c => mcusX * 8 * compH(c))
          val planes = Array.tabulate(nc)(c => new Array[Int](pw(c) * mcusY * 8 * compV(c)))
          val br = new BitReader(b, pos)
          val pred = new Array[Int](nc)
          var mcu = 0
          val totalMcus = mcusX * mcusY
          while (mcu < totalMcus) {
            if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
              br.resync()
              java.util.Arrays.fill(pred, 0)
            }
            val mx = mcu % mcusX; val my = mcu / mcusX
            var j = 0
            while (j < nc) {
              val (ci, dcT, acT) = sosComps(j)
              val dc = dcTables(dcT); val ac = acTables(acT)
              require(dc != null && ac != null, "JPEG scan references missing DHT")
              val q = quant(compQ(ci))
              require(q != null, "JPEG frame references missing DQT")
              var by = 0
              while (by < compV(ci)) {
                var bx = 0
                while (bx < compH(ci)) {
                  val coefs = new Array[Int](64)
                  val s = huffDecode(br, dc)
                  val diff = extend(br.receive(s), s)
                  pred(ci) += diff
                  coefs(0) = pred(ci) * q(0)
                  var k = 1
                  var eob = false
                  while (k < 64 && !eob) {
                    val rs = huffDecode(br, ac)
                    val r = rs >> 4; val sz = rs & 0x0f
                    if (sz == 0) {
                      if (r == 15) k += 16 else eob = true
                    } else {
                      k += r
                      require(k < 64, "JPEG AC run past block end")
                      coefs(Zigzag(k)) = extend(br.receive(sz), sz) * q(Zigzag(k))
                      k += 1
                    }
                  }
                  val px = idct(coefs)
                  val ox = (mx * compH(ci) + bx) * 8
                  val oy = (my * compV(ci) + by) * 8
                  var y = 0
                  while (y < 8) {
                    var x = 0
                    while (x < 8) {
                      planes(ci)((oy + y) * pw(ci) + ox + x) = px(y * 8 + x)
                      x += 1
                    }
                    y += 1
                  }
                  bx += 1
                }
                by += 1
              }
              j += 1
            }
            mcu += 1
          }
          // crop + (upsampling) color convert: chroma samples at
          // (x*h_i/hmax, y*v_i/vmax) — nearest-neighbor replication
          val out = new Array[Byte](w * h * (if (nc == 3) 3 else 1))
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              if (nc == 1) out(y * w + x) = planes(0)(y * pw(0) + x).toByte
              else {
                val yy = planes(0)(y * pw(0) + x)
                val cbX = x * compH(1) / hmax; val cbY = y * compV(1) / vmax
                val crX = x * compH(2) / hmax; val crY = y * compV(2) / vmax
                val cb = planes(1)(cbY * pw(1) + cbX) - 128
                val cr = planes(2)(crY * pw(2) + crX) - 128
                val d = (y * w + x) * 3
                out(d) = clamp8(yy + 1.402 * cr).toByte
                out(d + 1) = clamp8(yy - 0.344136 * cb - 0.714136 * cr).toByte
                out(d + 2) = clamp8(yy + 1.772 * cb).toByte
              }
              x += 1
            }
            y += 1
          }
          return Image(w, h, if (nc == 3) 3 else 1, out)
        case 0x01 => // TEM, standalone
        case rst if rst >= 0xd0 && rst <= 0xd7 => // standalone, outside scan
        case _ => // APPn / COM / other segments with length
          pos += segLen()
      }
    }
    throw new IllegalArgumentException("JPEG without a scan (no SOS)")
  }
}
