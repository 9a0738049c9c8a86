package graft

import graft.media.{MediaCodecs, MediaDecode}
import graft.media.MediaCodecs.{Audio, Image}

/** The real media codecs (PNG/BMP/WAV, pure JVM) and the one-pass
  * decode->stat operators built on them.
  */
class MediaDecodeSpec extends GraftSuite {
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  private def randImage(w: Int, h: Int, ch: Int): Image =
    Image(w, h, ch, Array.fill(w * h * ch)(rng.nextInt(256).toByte))

  test("PNG round-trips exactly for every filter type and channel count") {
    for (ch <- Seq(1, 2, 3, 4); filter <- 0 to 4) {
      val img = randImage(5 + rng.nextInt(20), 3 + rng.nextInt(20), ch)
      val back = MediaCodecs.decodePng(MediaCodecs.encodePng(img, _ => filter))
      assert(back.width === img.width && back.height === img.height &&
        back.channels === ch)
      assert(back.pixels.toSeq === img.pixels.toSeq, s"ch=$ch filter=$filter")
    }
    // per-row mixed filters (what the fixtures emit)
    val img = randImage(17, 11, 3)
    val back = MediaCodecs.decodePng(MediaCodecs.encodePng(img, row => row % 5))
    assert(back.pixels.toSeq === img.pixels.toSeq)
  }

  test("BMP round-trips exactly (incl. the 4-byte row padding widths)") {
    for (w <- Seq(1, 2, 3, 4, 5, 16, 17)) {
      val img = randImage(w, 7, 3)
      val back = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(img))
      assert(back.pixels.toSeq === img.pixels.toSeq, s"w=$w")
      assert((back.width, back.height, back.channels) === ((w, 7, 3)))
    }
  }

  test("WAV PCM16 round-trips; decoder skips extra RIFF chunks") {
    val a = Audio(16000, 2, Array.fill(999)(rng.nextInt(65536).toShort))
    val bytes = MediaCodecs.encodeWav(a)
    val back = MediaCodecs.decodeWav(bytes)
    assert(back.sampleRate === 16000 && back.channels === 2)
    assert(back.samples.toSeq === a.samples.toSeq)
    // splice a LIST chunk between fmt and data — real WAVs carry these
    val head = bytes.take(36)
    val tail = bytes.drop(36)
    val junk = Array[Byte]('L', 'I', 'S', 'T', 6, 0, 0, 0, 'I', 'N', 'F', 'O', 1, 2)
    val spliced = head ++ junk ++ tail
    assert(MediaCodecs.decodeWav(spliced).samples.toSeq === a.samples.toSeq)
  }

  test("GIF round-trips exactly: LZW decode, palette lookup, interlace") {
    for (interlaced <- Seq(false, true); nColors <- Seq(4, 17, 256)) {
      val w = 3 + rng.nextInt(25); val h = 3 + rng.nextInt(20)
      val palette = Array.fill(nColors * 3)(rng.nextInt(256).toByte)
      val indices = Array.fill(w * h)(rng.nextInt(nColors).toByte)
      val bytes = MediaCodecs.encodeGif(w, h, palette, indices, interlaced)
      val img = MediaCodecs.decodeGif(bytes)
      assert((img.width, img.height, img.channels) === ((w, h, 3)))
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val want = palette((indices(y * w + x) & 0xff) * 3 + c)
        assert(img.pixels((y * w + x) * 3 + c) === want,
          s"($x,$y,$c) interlaced=$interlaced colors=$nColors")
      }
    }
  }

  test("GIF decoder handles dictionary-growing LZW (KwKwK), not just clear-coded streams") {
    // hand-built stream with minCode=2: clear(100) a(000) then code 6
    // (= "aa", the KwKwK case), then EOF(101), width 3, LSB-first
    val codes = Seq(4 -> 3, 0 -> 3, 6 -> 3, 5 -> 3)
    var acc = 0L; var bits = 0
    val lzw = new java.io.ByteArrayOutputStream()
    codes.foreach { case (c, w) =>
      acc |= c.toLong << bits; bits += w
      while (bits >= 8) { lzw.write((acc & 0xff).toInt); acc >>>= 8; bits -= 8 }
    }
    if (bits > 0) lzw.write((acc & 0xff).toInt)
    val z = lzw.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(3); out.write(0); out.write(1); out.write(0) // 3x1
    out.write(0x80); out.write(0); out.write(0)            // GCT 2 entries
    out.write(Array[Byte](10, 20, 30, 40, 50, 60))         // palette
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(3); out.write(0); out.write(1); out.write(0)
    out.write(0)
    out.write(2) // min code size
    out.write(z.length); out.write(z); out.write(0)
    out.write(0x3b)
    val img = MediaCodecs.decodeGif(out.toByteArray)
    // expected pixels: a, a, a -> palette entry 0 three times
    assert(img.pixels.toSeq === Seq[Byte](10, 20, 30, 10, 20, 30, 10, 20, 30))
  }

  test("truncated GIF surfaces a precise error, never a bare index exception") {
    val w = 16; val h = 12
    val palette = Array.fill(8 * 3)(rng.nextInt(256).toByte)
    val indices = Array.fill(w * h)(rng.nextInt(8).toByte)
    val full = MediaCodecs.encodeGif(w, h, palette, indices, interlaced = false)
    // every truncation point must raise IllegalArgumentException with a
    // message (the decoder's contract) — not ArrayIndexOutOfBounds from
    // the sub-block walk or the pixel loop reading past a short LZW stream
    // (full.length - 1 only drops the trailer AFTER a complete frame —
    // that still decodes, by design; cut inside header/palette/data)
    for (cut <- Seq(14, 40, full.length / 2, full.length - 2)
         if cut < full.length) {
      val e = intercept[IllegalArgumentException](
        MediaCodecs.decodeGif(full.take(cut)))
      assert(e.getMessage != null && e.getMessage.nonEmpty, s"cut=$cut")
    }
    // corrupt sub-block length claiming bytes beyond the buffer
    val descAt = full.indexWhere(_ == 0x2c.toByte)
    assert(descAt > 0)
    val corrupt = full.take(descAt + 11) :+ 0xff.toByte // oversized sub-block
    intercept[IllegalArgumentException](MediaCodecs.decodeGif(corrupt))
  }

  test("nearest-neighbor resample matches a naive reference; identity at same size") {
    val img = randImage(13, 9, 3)
    val same = MediaDecode.resampleNearest(img, 13, 9)
    assert(same.pixels.toSeq === img.pixels.toSeq)
    val rs = MediaDecode.resampleNearest(img, 8, 8)
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3) {
      val sx = x * 13 / 8; val sy = y * 9 / 8
      assert(rs.pixels((y * 8 + x) * 3 + c) === img.pixels((sy * 13 + sx) * 3 + c))
    }
  }

  test("ahash64 matches a naive reference and is invariant to encode format") {
    val img = randImage(24, 18, 3)
    val h = MediaDecode.ahash64(img)
    // naive reference
    val small = MediaDecode.resampleNearest(img, 8, 8)
    val gray: Seq[Int] = (0 until 64).map(i =>
      ((small.pixels(i * 3) & 0xff) + (small.pixels(i * 3 + 1) & 0xff) +
        (small.pixels(i * 3 + 2) & 0xff)) / 3)
    val mean = gray.sum / 64
    val want = gray.zipWithIndex.foldLeft(0L) { case (acc, (g, i)) =>
      if (g > mean) acc | (1L << i) else acc
    }
    assert(h === want)
    // PNG and BMP encodings of the same pixels hash identically
    val viaPng = MediaDecode.ahash64(MediaCodecs.decodePng(MediaCodecs.encodePng(img)))
    val viaBmp = MediaDecode.ahash64(MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(img)))
    assert(viaPng === h && viaBmp === h)
  }

  test("decode rejects malformed payloads loudly") {
    intercept[Exception](MediaCodecs.decodePng(Array[Byte](1, 2, 3)))
    intercept[Exception](MediaCodecs.decodeBmp(Array[Byte]('B', 'M', 0)))
    intercept[Exception](MediaCodecs.decodeWav("RIFFxxxxNOPE".getBytes))
    // PNG with a bad filter byte
    val img = randImage(4, 4, 3)
    val ok = MediaCodecs.encodePng(img)
    // corrupt: bit depth 16 in IHDR (offset: 8 sig + 8 hdr + 8th byte)
    val bad = ok.clone(); bad(8 + 8 + 8) = 16
    intercept[Exception](MediaCodecs.decodePng(bad))
  }

  test("JPEG: DC-exact tiled fixtures decode bit-exactly (gray and color)") {
    import graft.media.JpegCodec
    for (id <- 0L until 12L) {
      val w = (8 + id % 9).toInt; val h = (8 + (id * 3) % 9).toInt
      def tile(x: Int, y: Int): Int =
        (((31L * id + 7L * (x / 8) + 13L * (y / 8)) % 256L) & 0xffL).toInt
      val gray = Image(w, h, 1,
        Array.tabulate(w * h)(i => tile(i % w, i / w).toByte))
      val back = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(gray, qDc = 1))
      assert((back.width, back.height, back.channels) === ((w, h, 1)))
      assert(back.pixels.toSeq === gray.pixels.toSeq, s"gray id=$id")
      // 3-component: equal channels -> Cb=Cr=128 exactly, conversion
      // round-trips without error on flat tiles
      val rgb = Image(w, h, 3, Array.tabulate(w * h * 3)(i => tile((i / 3) % w, i / 3 / w).toByte))
      val backRgb = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(rgb, qDc = 1))
      assert(backRgb.channels === 3)
      assert(backRgb.pixels.toSeq === rgb.pixels.toSeq, s"rgb id=$id")
    }
  }

  test("JPEG: general content round-trips within IDCT rounding at quant 1; rejects unsupported streams") {
    import graft.media.JpegCodec
    val img = randImage(19, 13, 1)
    val back = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(img, qDc = 1, qAc = 1))
    assert((back.width, back.height) === ((19, 13)))
    val maxErr = img.pixels.indices.map(i =>
      math.abs((img.pixels(i) & 0xff) - (back.pixels(i) & 0xff))).max
    assert(maxErr <= 2, s"gray roundtrip err $maxErr")
    // color path: random RGB, quant 1 — YCbCr rounding adds ~1/channel
    val rgb = randImage(16, 16, 3)
    val backRgb = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(rgb, qDc = 1, qAc = 1))
    val maxErrRgb = rgb.pixels.indices.map(i =>
      math.abs((rgb.pixels(i) & 0xff) - (backRgb.pixels(i) & 0xff))).max
    assert(maxErrRgb <= 4, s"rgb roundtrip err $maxErrRgb")
    // imageStats sniffs and serves the jpeg format tag
    val ids = Seq(3L).toDF("doc_id")
    val st = MediaDecode.imageStats(
      MediaDecode.synthJpegPayload(ids, "doc_id"), "doc_id", "bytes").head()
    assert(st.getString(1) === "jpeg")
    // progressive (SOF2) refused loudly
    val good = JpegCodec.encodeJpeg(img, qDc = 1)
    val prog = good.clone()
    val sof = (0 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](JpegCodec.decodeJpeg(prog))
    assert(e.getMessage.contains("progressive"))
    // truncation refused loudly
    intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg(good.take(good.length / 2)))
    intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg(Array[Byte](0, 1, 2, 3)))
  }

  test("JPEG restart markers: DRI streams resync and stay DC-exact") {
    import graft.media.JpegCodec
    for (id <- Seq(2L, 5L); ri <- Seq(1, 2, 3)) {
      val w = (8 + id % 9).toInt; val h = (8 + (id * 3) % 9).toInt
      def tile(x: Int, y: Int): Int =
        (((31L * id + 7L * (x / 8) + 13L * (y / 8)) % 256L) & 0xffL).toInt
      val gray = Image(w, h, 1,
        Array.tabulate(w * h)(i => tile(i % w, i / w).toByte))
      val bytes = JpegCodec.encodeJpeg(gray, qDc = 1, restartInterval = ri)
      // the stream really carries RSTn markers (encoder emitted DRI)
      assert((0 until bytes.length - 1).exists(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) >= 0xd0 &&
          (bytes(i + 1) & 0xff) <= 0xd7) || w <= 8 * ri && h <= 8,
        s"no RST marker emitted at ri=$ri for ${w}x$h")
      val back = JpegCodec.decodeJpeg(bytes)
      assert(back.pixels.toSeq === gray.pixels.toSeq, s"id=$id ri=$ri")
    }
    // 4:2:0 + restarts together
    val img = Image(20, 17, 3, Array.tabulate(20 * 17 * 3)(i => ((i / 3) % 256).toByte))
    val back = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(
      img, qDc = 1, qAc = 1, subsample420 = true, restartInterval = 1))
    assert((back.width, back.height, back.channels) === ((20, 17, 3)))
  }

  test("JPEG 4:2:0: subsampled encode decodes through the general h/v grid") {
    import graft.media.JpegCodec
    // flat gray color: Y flat, Cb=Cr=128 everywhere — box-downsample of a
    // constant is the constant, so 4:2:0 is DC-exact like 4:4:4
    for (v <- Seq(0, 7, 128, 200, 255); (w, h) <- Seq((16, 16), (19, 13), (8, 24))) {
      val img = Image(w, h, 3, Array.fill(w * h * 3)(v.toByte))
      val back = JpegCodec.decodeJpeg(
        JpegCodec.encodeJpeg(img, qDc = 1, subsample420 = true))
      assert((back.width, back.height, back.channels) === ((w, h, 3)))
      assert(back.pixels.toSeq === img.pixels.toSeq, s"flat v=$v ${w}x$h")
    }
    // gray-valued content (r=g=b): chroma is constant 128, so subsampling
    // loses nothing — roundtrip error is IDCT rounding on the Y detail
    val g = Array.tabulate(20 * 17)(i => (rng.nextInt(256)).toByte)
    val gray3 = Image(20, 17, 3, Array.tabulate(20 * 17 * 3)(i => g(i / 3)))
    val back3 = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpeg(gray3, qDc = 1, qAc = 1, subsample420 = true))
    val maxErr = gray3.pixels.indices.map(i =>
      math.abs((gray3.pixels(i) & 0xff) - (back3.pixels(i) & 0xff))).max
    assert(maxErr <= 3, s"4:2:0 gray roundtrip err $maxErr")
    // 2x2-constant color: the box downsample is lossless on the chroma,
    // replication upsample restores it — bounded roundtrip error
    val blocks = Image(16, 16, 3, Array.tabulate(16 * 16 * 3) { i =>
      val p = i / 3; val x = p % 16; val y = p / 16
      (((x / 2) * 37 + (y / 2) * 91 + (i % 3) * 53) % 256).toByte
    })
    val backB = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpeg(blocks, qDc = 1, qAc = 1, subsample420 = true))
    val maxErrB = blocks.pixels.indices.map(i =>
      math.abs((blocks.pixels(i) & 0xff) - (backB.pixels(i) & 0xff))).max
    assert(maxErrB <= 5, s"4:2:0 block-color roundtrip err $maxErrB")
    // unsupported factors refused loudly: patch Y's sampling to 3x1
    val bytes = JpegCodec.encodeJpeg(gray3, subsample420 = true)
    val sof = (0 until bytes.length - 1).find(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0).get
    val bad = bytes.clone()
    bad(sof + 11) = 0x31.toByte // component 1's HiVi byte
    val e = intercept[IllegalArgumentException](JpegCodec.decodeJpeg(bad))
    assert(e.getMessage.contains("sampling"))
  }

  test("JPEG encode refuses out-of-range quants; worst-case content stays inside Annex K") {
    import graft.media.JpegCodec
    // a zero quant divides the FDCT into symbols past the Annex K tables
    // — the old encoder looked up code 0 / length 0 and silently emitted
    // a CORRUPT bitstream; the contract is a precise error at the edge
    val px = Array.tabulate(16 * 16)(i =>
      if ((i % 16 + i / 16) % 2 == 0) 0.toByte else 255.toByte)
    val e = intercept[IllegalArgumentException](
      JpegCodec.encodeJpeg(Image(16, 16, 1, px), qDc = 1, qAc = 0))
    assert(e.getMessage.contains("quant"))
    // the symbol guard is not over-tight: a pixel-level checkerboard at
    // qAc=1 is the max-energy case 8-bit input can produce (AC category
    // 10 — the table's last row) and must still encode and decode
    val ok = JpegCodec.encodeJpeg(Image(16, 16, 1, px), qDc = 1, qAc = 1)
    val back = JpegCodec.decodeJpeg(ok)
    assert(back.width === 16 && back.height === 16)
  }

  test("multimodal near-dup: decode -> aHash -> banded Hamming finds the planted twins, never all-pairs") {
    val ids = (0L until 60L).toDF("doc_id")
    val corpus = MediaDecode.synthNearDupCorpus(ids, "doc_id")
    assert(corpus.count() === 66) // 60 bases + 6 twins (ids % 10 == 0)
    val hashed = MediaDecode.imageStats(corpus, "doc_id", "bytes")
      .select($"doc_id", $"ahash64")
    val pairs = graft.dedup.Dedup.hammingPairs(
      hashed, "doc_id", "ahash64", bits = 64, blocks = 4, maxHamming = 3)
    // pigeonhole guarantee: any pair at true hamming < 4 MUST be found —
    // verify against the brute-force reference over the hashes
    val hs = hashed.collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want)
    // the planted twins are in the result (their aHash is within a couple
    // of bits of the base by construction)
    val twinPairs = got.filter { case (a, b, _) => b == a + MediaDecode.TwinOffset }
    assert(twinPairs.nonEmpty, "no planted twin survived the hamming threshold")
    twinPairs.foreach { case (_, _, d) => assert(d <= 3) }
    // scale shape: banded candidates only — no cartesian / nested-loop join
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"hammingPairs planned an all-pairs join:\n$plan")
  }

  test("audio fingerprint: distributed afp64 matches local recompute; planted twins pair") {
    val ids = (0L until 80L).toDF("doc_id")
    val corpus = MediaDecode.synthAudioNearDupCorpus(ids, "doc_id")
    assert(corpus.count() === 88) // 80 bases + 8 twins
    val fp = MediaDecode.audioFingerprint64(corpus, "doc_id", "bytes")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // local recompute from the generator closed form
    def localFp(src: Long, pert: Boolean): Long = {
      val n = (64 + src % 64).toInt
      val e = new Array[Long](64)
      for (i <- 0 until n) {
        val v = ((src % 2003) * (i + 3) * (i + 3) + (src % 1999) * (i + 5)) % 2003 -
          1001L + (if (pert && i == 0) 100L else 0L)
        e(i * 64 / n) += v * v
      }
      val mean = e.sum / 64
      (0 until 64).foldLeft(0L)((b, i) => if (e(i) > mean) b | (1L << i) else b)
    }
    for (id <- 0L until 80L) assert(fp(id) === localFp(id, pert = false), s"id=$id")
    for (id <- 0L until 80L by 10L)
      assert(fp(id + MediaDecode.TwinOffset) === localFp(id, pert = true), s"twin $id")
    // the +100 first-sample bump moves frame 0's energy (and the mean) a
    // little: most twins stay inside the hamming radius...
    val close = (0L until 80L by 10L).count(id =>
      java.lang.Long.bitCount(fp(id) ^ fp(id + MediaDecode.TwinOffset)) <= 3)
    assert(close >= 5, s"only $close/8 twins within hamming 3")
    // ...and the pairs surface finds EXACTLY those (pigeonhole certainty
    // at hamming < blocks; same-hash pairs via the collapse arm)
    val pairs = graft.dedup.Dedup.hammingPairs(
      MediaDecode.audioFingerprint64(corpus, "doc_id", "bytes"), "doc_id", "afp64")
      .as[(Long, Long, Int)].collect()
    val twinPairs = pairs.count { case (a, b, _) => b == a + MediaDecode.TwinOffset }
    assert(twinPairs === close)
  }

  test("audio fixture entropy: base fingerprints are distinct at scale (pair output stays linear)") {
    // the r14 1000x sweep caught the first-cut generator ((17*src+29*i)
    // % 2001, 29 | 2001) collapsing 5M docs onto ~1e4 fingerprints — the
    // PAIR output is quadratic in identical-hash group size, so a pairs
    // gate needs a corpus with distinct base hashes; mass-dup corpora
    // belong to hammingClusters. Guard the generator's entropy directly.
    def localFp(src: Long): Long = {
      val n = (64 + src % 64).toInt
      val e = new Array[Long](64)
      for (i <- 0 until n) {
        val v = ((src % 2003) * (i + 3) * (i + 3) + (src % 1999) * (i + 5)) % 2003 - 1001L
        e(i * 64 / n) += v * v
      }
      val mean = e.sum / 64
      (0 until 64).foldLeft(0L)((b, i) => if (e(i) > mean) b | (1L << i) else b)
    }
    val n = 50000
    val distinct = (0L until n).map(localFp).distinct.size
    assert(distinct >= n - 5, s"audio fingerprints collapsed: $distinct/$n distinct")
  }

  test("distributed one-pass stats match local decode over the fixture payloads") {
    val ids = (0L until 40L).toDF("doc_id")
    val imgs = MediaDecode.synthImagePayload(ids, "doc_id")
    val stats = MediaDecode.imageStats(imgs, "doc_id", "bytes").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(stats.size === 40)
    // spot-check one id per container (png/bmp/gif) against a local decode
    for (id <- Seq(6L, 7L, 8L)) {
      val bytes = imgs.filter($"doc_id" === id).select("bytes")
        .as[Array[Byte]].head()
      val img = (id % 3) match {
        case 0 => MediaCodecs.decodePng(bytes)
        case 1 => MediaCodecs.decodeBmp(bytes)
        case _ => MediaCodecs.decodeGif(bytes)
      }
      val want = (0 until 3).map(c =>
        img.pixels.indices.filter(_ % 3 == c).map(img.pixels(_) & 0xff)
          .foldLeft(0L)(_ + _))
      val got = stats(id)
      assert((got.getLong(5), got.getLong(6), got.getLong(7)) ===
        ((want(0), want(1), want(2))))
      assert(got.getString(1) ===
        (id % 3 match { case 0 => "png"; case 1 => "bmp"; case _ => "gif" }))
    }
    // audio
    val wavs = MediaDecode.synthAudioPayload(ids, "doc_id")
    val a = MediaDecode.audioStats(wavs, "doc_id", "bytes")
      .filter($"doc_id" === 5).head()
    val n = 64 + 5 % 64
    val samples = (0 until n).map(i => ((17L * 5 + 29L * i) % 2001L - 1000L))
    assert(a.getLong(3) === n.toLong)
    assert(a.getLong(4) === samples.map(s => s * s).sum)
    assert(a.getInt(6) === samples.map(math.abs).max.toInt)
  }
}
