package graft.media

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import MediaCodecs.{Audio, Image}

/** REAL decode + feature operators over opaque media `binary` columns —
  * the round-12 replacement for MediaOps' documented md5-fake kernels
  * (PNG / BMP / GIF / WAV-PCM in [[MediaCodecs]]; baseline JPEG in
  * [[JpegCodec]] and MP4 sample-table indexing in [[Mp4Index]] since r13
  * — H.264/HEVC entropy decode is the one remaining documented boundary).
  *
  * Scale design (what matters at 100 TB):
  *  - decode and statistics happen in ONE `mapPartitions` pass and only
  *    the bounded stats leave the executor — raw pixels/samples never
  *    materialize into a column, so nothing pixel-sized ever crosses an
  *    Exchange;
  *  - resize is decode -> resample -> stats in the same pass (an export
  *    variant would re-encode in place — same shape);
  *  - all statistics are exact integers (channel sums, squared sums,
  *    peak, perceptual-hash bits), so a DuckDB oracle can recompute them
  *    from the synthetic generator's closed form and hash-match.
  */
object MediaDecode {

  /** Deterministic pixel generator shared by the fixtures and the gate
    * oracles: channel c of (x, y) in doc `id` is
    * `(31*id + (7 + (id>>8)%251)*x + (13 + (id>>16)%241)*y + 97*c) mod 256`.
    * The x/y gradient coefficients carry the id's HIGH bits (r13): the old
    * `7x + 13y` form made the whole image a function of id mod 2304, so a
    * 1000x replica held ~2400-member groups of IDENTICAL images and any
    * pairwise operator's OUTPUT went quadratic — a generator artifact, not
    * an operator property. With high-bit gradients the pattern space is
    * ~2^24, images are effectively unique at 5M docs, and near-dup output
    * stays linear in the planted-dup count.
    */
  @inline private def pixel(id: Long, x: Int, y: Int, c: Int): Byte =
    (((31L * id + (7L + (id >> 8) % 251L) * x + (13L + (id >> 16) % 241L) * y
      + 97L * c) % 256L) & 0xffL).toByte

  private def dimsOf(id: Long): (Int, Int) =
    ((8 + (id % 9)).toInt, (8 + ((id * 3) % 9)).toInt)

  /** Synthesize REAL image payloads carrying the deterministic pixels,
    * rotating the container by id % 3: PNG (row filter cycling 0..4 so
    * the decoder's filter paths all run on real data), 24-bit BMP, and
    * GIF — the generator's color set is exactly the 256 triples
    * `(v, v+97, v+194)`, so a 256-entry palette encodes the SAME image
    * and the same oracle arithmetic applies. Output: (idCol, bytes).
    */
  def synthImagePayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map(r => Row(r.getLong(idIdx), imageBytesOf(r.getLong(idIdx))))
    }(Encoders.row(schema))
  }

  /** Dup-heavy image corpus: row `id` carries the payload of SOURCE image
    * `id % groups` — every source repeats ~n/groups times, so identical
    * fingerprints form real mass groups (the web-corpus shape: solid
    * images, exact re-posts). This is the adversarial fixture for the
    * collapse-before-pairing path ([[graft.dedup.Dedup.hammingClusters]]);
    * closed-form in (id, groups) so a SQL oracle recomputes every hash
    * from `src = id % groups` alone.
    */
  def synthDupHeavyCorpus(df: DataFrame, idCol: String, groups: Long): DataFrame = {
    require(groups >= 1, s"synthDupHeavyCorpus: groups >= 1, got $groups")
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        Row(id, imageBytesOf(id % groups))
      }
    }(Encoders.row(schema))
  }

  private def imageBytesOf(id: Long): Array[Byte] = {
    val (w, h) = dimsOf(id)
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 3
        px(d) = pixel(id, x, y, 0)
        px(d + 1) = pixel(id, x, y, 1)
        px(d + 2) = pixel(id, x, y, 2)
        x += 1
      }
      y += 1
    }
    val img = Image(w, h, 3, px)
    val bytes = (id % 3) match {
      case 0 => MediaCodecs.encodePng(img, filters = row => (row + id.toInt) % 5)
      case 1 => MediaCodecs.encodeBmp(img)
      case _ =>
        // palette[v] = (v, v+97, v+194); the pixel base IS the index
        val palette = new Array[Byte](256 * 3)
        var v = 0
        while (v < 256) {
          palette(v * 3) = v.toByte
          palette(v * 3 + 1) = ((v + 97) % 256).toByte
          palette(v * 3 + 2) = ((v + 194) % 256).toByte
          v += 1
        }
        val indices = new Array[Byte](w * h)
        var yy = 0
        while (yy < h) {
          var xx = 0
          while (xx < w) {
            indices(yy * w + xx) = pixel(id, xx, yy, 0)
            xx += 1
          }
          yy += 1
        }
        MediaCodecs.encodeGif(w, h, palette, indices,
          interlaced = id % 2 == 0) // both row orders on real data
    }
    bytes
  }

  /** Twin ids in [[synthNearDupCorpus]] live at `base + TwinOffset` — far
    * above any doc_id the testdata mints, so the two id spaces never
    * collide.
    */
  val TwinOffset = 1000000000000L

  /** Near-duplicate image corpus: every id's payload (format-rotating,
    * as [[synthImagePayload]]) PLUS, for ids divisible by 10, a perturbed
    * twin at `id + TwinOffset`: the SAME pixels except channel 0 of pixel
    * (0,0) shifted by +8 (mod 256), encoded as BMP. Pixel (0,0) is always
    * an aHash sample point (cell 0 reads `(0*w/8, 0*h/8)`), so the twin's
    * fingerprint lands within a couple of bits of its base — the planted
    * near-dup population for the banded Hamming join. Output (idCol,
    * bytes); the generator is closed-form so a SQL oracle can recompute
    * every hash.
    */
  def synthNearDupCorpus(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val twins = df.filter(col(idCol) % 10 === 0).mapPartitions { rows =>
      rows.map { r =>
        val base = r.getLong(idIdx)
        val (w, h) = dimsOf(base)
        val px = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val d = (y * w + x) * 3
            px(d) =
              if (x == 0 && y == 0) (((pixel(base, 0, 0, 0) & 0xff) + 8) % 256).toByte
              else pixel(base, x, y, 0)
            px(d + 1) = pixel(base, x, y, 1)
            px(d + 2) = pixel(base, x, y, 2)
            x += 1
          }
          y += 1
        }
        Row(base + TwinOffset, MediaCodecs.encodeBmp(Image(w, h, 3, px)))
      }
    }(Encoders.row(schema))
    synthImagePayload(df, idCol).unionByName(twins)
  }

  /** Synthesize REAL baseline-JPEG payloads whose decode is BIT-EXACT:
    * grayscale images tiled by 8x8 block — pixel (x,y) reads the tile
    * value `(31*id + 7*(x/8) + 13*(y/8)) % 256` — so every DCT block is
    * FLAT. A flat block quantized with DC step 1 carries only its DC
    * coefficient, and the IDCT of a DC-only block is integer-exact under
    * any conforming IDCT: the one lossless corner of a lossy codec, which
    * is what lets a SQL oracle recompute every decoded pixel closed-form.
    * Dims follow the other image fixtures (so edge blocks exercise the
    * pad-and-crop path; replication padding keeps edge blocks flat too).
    */
  def synthJpegPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val (w, h) = dimsOf(id)
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(y * w + x) =
              (((31L * id + 7L * (x / 8) + 13L * (y / 8)) % 256L) & 0xffL).toByte
            x += 1
          }
          y += 1
        }
        Row(id, JpegCodec.encodeJpeg(Image(w, h, 1, px), qDc = 1, qAc = 16))
      }
    }(Encoders.row(schema))
  }

  /** Synthesize REAL WAV-PCM payloads: mono, `64 + id % 64` samples of
    * `(17*id + 29*i) mod 2001 - 1000`, rate `8000 + (id % 3) * 4000`.
    */
  def synthAudioPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val n = (64 + (id % 64)).toInt
        val samples = Array.tabulate(n)(i =>
          (((17L * id + 29L * i) % 2001L) - 1000L).toShort)
        Row(id, MediaCodecs.encodeWav(
          Audio((8000 + (id % 3) * 4000).toInt, 1, samples)))
      }
    }(Encoders.row(schema))
  }

  private def sniffDecode(bytes: Array[Byte]): (String, Image) =
    if (bytes.length > 2 && bytes(0) == 'B' && bytes(1) == 'M')
      ("bmp", MediaCodecs.decodeBmp(bytes))
    else if (bytes.length > 4 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
      ("gif", MediaCodecs.decodeGif(bytes))
    else if (bytes.length > 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      ("jpeg", JpegCodec.decodeJpeg(bytes))
    else ("png", MediaCodecs.decodePng(bytes))

  /** Decode + per-channel integer sums + 64-bit average-hash, one pass:
    * (id, fmt, width, height, channels, r_sum, g_sum, b_sum, ahash64).
    * The aHash is the standard near-dup image fingerprint: nearest-
    * neighbor 8x8 grayscale, bit set where the cell exceeds the mean.
    */
  def imageStats(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("fmt", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false),
      StructField("ahash64", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (fmt, img) = sniffDecode(r.getAs[Array[Byte]](bIdx))
        val ch = img.channels
        val sums = new Array[Long](3)
        var i = 0
        while (i < img.pixels.length) {
          val c = i % ch
          if (c < 3) sums(c) += img.pixels(i) & 0xff // alpha excluded
          i += 1
        }
        Row(r.getLong(idIdx), fmt, img.width, img.height, ch,
          sums(0), sums(1), sums(2), ahash64(img))
      }
    }(Encoders.row(schema))
  }

  /** Nearest-neighbor resample to (W, H) then channel sums, one pass —
    * the real resize kernel measured by its exact output instead of a
    * metadata rewrite: (id, r_sum, g_sum, b_sum).
    */
  def resizeStats(df: DataFrame, idCol: String, bytesCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (_, img) = sniffDecode(r.getAs[Array[Byte]](bIdx))
        val rs = resampleNearest(img, targetW, targetH)
        val sums = new Array[Long](3)
        var i = 0
        while (i < rs.pixels.length) {
          val c = i % rs.channels
          if (c < 3) sums(c) += rs.pixels(i) & 0xff
          i += 1
        }
        Row(r.getLong(idIdx), sums(0), sums(1), sums(2))
      }
    }(Encoders.row(schema))
  }

  private[graft] def resampleNearest(img: Image, tw: Int, th: Int): Image = {
    val out = new Array[Byte](tw * th * img.channels)
    val ch = img.channels
    var y = 0
    while (y < th) {
      val sy = y * img.height / th
      var x = 0
      while (x < tw) {
        val sx = x * img.width / tw
        var c = 0
        while (c < ch) {
          out((y * tw + x) * ch + c) = img.pixels((sy * img.width + sx) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(tw, th, ch, out)
  }

  /** 64-bit average hash: 8x8 nearest-neighbor grayscale
    * (`(r+g+b)/3` integer division), bit i set where cell i exceeds the
    * integer mean. Hamming distance between hashes is the image near-dup
    * measure (same banding/LSH machinery as SimHash applies downstream).
    */
  private[graft] def ahash64(img: Image): Long = {
    val g = new Array[Int](64)
    val small = resampleNearest(img, 8, 8)
    val ch = small.channels
    var i = 0
    while (i < 64) {
      var s = 0
      var c = 0
      while (c < math.min(ch, 3)) { s += small.pixels(i * ch + c) & 0xff; c += 1 }
      g(i) = s / math.min(ch, 3)
      i += 1
    }
    val mean = g.sum / 64
    var bits = 0L
    i = 0
    while (i < 64) { if (g(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** 64-bit audio energy fingerprint (the Haitsma-Kalman robust-hash
    * shape reduced to exact integers): decode WAV PCM, bucket samples into
    * 64 frames by nearest-neighbor index (frame of sample i = i*64/n —
    * every frame non-empty for n >= 64), exact integer frame energies
    * (sum of squared samples, channel-interleaved), bit f set where
    * energy(f) exceeds the integer mean. Same mean-threshold shape as
    * [[ahash64]], so the SAME collapse-then-blocked-Hamming machinery
    * ([[graft.dedup.Dedup.hammingPairs]] /
    * [[graft.dedup.Dedup.hammingClusters]]) closes the audio half of
    * multimodal near-dup. Output (idCol, afp64).
    */
  def audioFingerprint64(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("afp64", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val a = MediaCodecs.decodeWav(r.getAs[Array[Byte]](bIdx))
        Row(r.getLong(idIdx), afp64(a.samples))
      }
    }(Encoders.row(schema))
  }

  private[graft] def afp64(samples: Array[Short]): Long = {
    val n = samples.length
    require(n > 0, "audio fingerprint of an empty stream")
    val e = new Array[Long](64)
    var i = 0
    while (i < n) {
      val v = samples(i).toLong
      e((i.toLong * 64L / n).toInt) += v * v
      i += 1
    }
    val mean = e.sum / 64
    var bits = 0L
    i = 0
    while (i < 64) { if (e(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** Near-duplicate AUDIO corpus: every id's WAV plus, for ids divisible
    * by 10, a perturbed twin at `id + TwinOffset` whose FIRST sample is
    * shifted by +100 — frame 0's energy (and the integer mean) move a
    * little, so the twin's fingerprint lands within a couple of bits of
    * its base. Closed-form so a SQL oracle recomputes every hash from the
    * generator arithmetic.
    *
    * Generator (r14): sample(i) = ((src%2003)·(i+3)² + (src%1999)·(i+5))
    * mod 2003 − 1001 — src at TWO coprime moduli through a quadratic, so
    * fingerprints are distinct across replica-scale corpora (measured:
    * 300k/300k distinct). The first cut ((17·src + 29·i) mod 2001, with
    * 29 | 2001) collapsed 5M docs onto ~10^4 fingerprints and the PAIR
    * output — inherently quadratic in identical-hash group size — filled
    * the local disk at the 1000× replica. Mass-duplicate corpora are the
    * clusters surface ([[graft.dedup.Dedup.hammingClusters]], proven on
    * the image dup-heavy gate); a pairs gate needs a corpus whose pair
    * count is linear, which this generator guarantees.
    */
  def synthAudioNearDupCorpus(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    def wav(src: Long, pert: Boolean): Array[Byte] = {
      val n = (64 + (src % 64)).toInt
      val a = src % 2003
      val c = src % 1999
      val samples = Array.tabulate(n) { i =>
        val v = (a * (i + 3) * (i + 3) + c * (i + 5)) % 2003 - 1001
        (v + (if (pert && i == 0) 100L else 0L)).toShort
      }
      MediaCodecs.encodeWav(Audio((8000 + (src % 3) * 4000).toInt, 1, samples))
    }
    val bases = df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx); Row(id, wav(id, pert = false))
      }
    }(Encoders.row(schema))
    val twins = df.filter(col(idCol) % 10 === 0).mapPartitions { rows =>
      rows.map { r =>
        val base = r.getLong(idIdx)
        Row(base + TwinOffset, wav(base, pert = true))
      }
    }(Encoders.row(schema))
    bases.unionByName(twins)
  }

  /** WAV decode + exact integer statistics in one pass:
    * (id, sample_rate, channels, n_samples, sum_sq, sum_abs, peak).
    */
  def audioStats(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sum_sq", LongType, nullable = false),
      StructField("sum_abs", LongType, nullable = false),
      StructField("peak", IntegerType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val a = MediaCodecs.decodeWav(r.getAs[Array[Byte]](bIdx))
        var sumSq = 0L; var sumAbs = 0L; var peak = 0
        var i = 0
        while (i < a.samples.length) {
          val s = a.samples(i).toInt
          sumSq += s.toLong * s
          val ab = math.abs(s)
          sumAbs += ab
          if (ab > peak) peak = ab
          i += 1
        }
        Row(r.getLong(idIdx), a.sampleRate, a.channels,
          a.samples.length.toLong, sumSq, sumAbs, peak)
      }
    }(Encoders.row(schema))
  }
}
