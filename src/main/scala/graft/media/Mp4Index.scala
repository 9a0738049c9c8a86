package graft.media

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** ISO-BMFF (ISO/IEC 14496-12) SAMPLE-TABLE indexing — the container-level
  * half of video frame sampling. A 100 TB video pipeline's first pass is
  * not a decode: it is "where are the samples" — per-sample byte ranges
  * and timestamps from the `stbl` boxes (stsz sizes, stsc
  * samples-per-chunk runs, stco/co64 chunk offsets, stts time deltas) —
  * so downstream GPU decoders can seek straight to the frames they were
  * told to sample. This implements that walk in pure JVM bytes, codec-
  * agnostic (the payload stays opaque; H.264/HEVC entropy decode remains
  * the documented out-of-scope boundary).
  *
  * Reference mapping: vearch carries media as opaque byte payloads with no
  * container awareness at all; this extends the header surface
  * ([[MediaHeaders]]) the same way the image codecs extended decode.
  *
  * Scale shape: parse happens per-row inside `mapPartitions`; one row per
  * SAMPLE leaves the executor (bounded integers — offsets, sizes, pts),
  * payload bytes never cross an Exchange.
  */
object Mp4Index {

  /** One sample's location and timing: offset is the absolute byte offset
    * in the container; dts/pts in media timescale units (exact integers;
    * callers divide by the timescale). pts = dts + ctts composition offset
    * (equal when the stream carries no ctts — no B-frame reordering);
    * isSync from stss (ALL samples are sync when stss is absent, per
    * ISO/IEC 14496-12 8.6.2 — a keyframe-seeking reader may start
    * anywhere).
    */
  final case class SampleLoc(
      sampleIdx: Int, chunkIdx: Int, offset: Long, size: Long,
      dts: Long, pts: Long, isSync: Boolean)

  private def be32(b: Array[Byte], o: Int): Long = {
    require(o + 4 <= b.length, s"truncated MP4: need 4 bytes at $o")
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }
  private def be64(b: Array[Byte], o: Int): Long = {
    require(o + 8 <= b.length, s"truncated MP4: need 8 bytes at $o")
    (be32(b, o) << 32) | be32(b, o + 4)
  }
  private def fourcc(b: Array[Byte], o: Int): String = {
    require(o + 4 <= b.length, s"truncated MP4: need fourcc at $o")
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "US-ASCII")
  }

  /** Find the first child box with type `name` inside [from, to); returns
    * (payloadStart, payloadEnd) or null. Box = BE32 size + fourcc
    * (size 1 -> 64-bit largesize; size 0 -> to end of enclosing box).
    */
  private def child(b: Array[Byte], from: Int, to: Int, name: String): (Int, Int) = {
    var o = from
    while (o + 8 <= to) {
      val sz0 = be32(b, o)
      val t = fourcc(b, o + 4)
      val (hdr, sz) =
        if (sz0 == 1L) (16, be64(b, o + 8))
        else if (sz0 == 0L) (8, (to - o).toLong)
        else (8, sz0)
      require(sz >= hdr && o + sz <= to,
        s"malformed MP4 box '$t' at $o: size $sz exceeds enclosing box")
      if (t == name) return (o + hdr, o + sz.toInt)
      o += sz.toInt
    }
    null
  }

  /** Every child box with type `name` inside [from, to), in file order;
    * entries are (boxStart, payloadStart, payloadEnd) — boxStart included
    * because `default-base-is-moof` addressing is relative to the box
    * HEADER, not its payload.
    */
  private def childrenOf(
      b: Array[Byte], from: Int, to: Int, name: String): Vector[(Int, Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int, Int)]
    var o = from
    while (o + 8 <= to) {
      val sz0 = be32(b, o)
      val t = fourcc(b, o + 4)
      val (hdr, sz) =
        if (sz0 == 1L) (16, be64(b, o + 8))
        else if (sz0 == 0L) (8, (to - o).toLong)
        else (8, sz0)
      require(sz >= hdr && o + sz <= to,
        s"malformed MP4 box '$t' at $o: size $sz exceeds enclosing box")
      if (t == name) out += ((o, o + hdr, o + sz.toInt))
      o += sz.toInt
    }
    out.result()
  }

  /** Per-track handle from one moov walk: 1-based file order, track_ID
    * (tkhd; file order when tkhd is absent — minimal fixtures and some
    * in-the-wild muxers omit it), handler fourcc (hdlr; "" when absent),
    * and the mdia/stbl payload ranges the per-track walks read from.
    */
  final case class TrakMeta(
      order: Int, trackId: Long, handler: String,
      trakFrom: Int, trakTo: Int,
      mdiaFrom: Int, mdiaTo: Int, stblFrom: Int, stblTo: Int)

  /** Walk moov once and return every trak's metadata in file order.
    * Real containers carry >= 2 traks (audio is often muxed FIRST), so
    * every public operator goes through this + [[selectTrack]] instead of
    * grabbing the first trak.
    */
  private[graft] def parseTraks(b: Array[Byte]): ((Int, Int), Vector[TrakMeta]) = {
    require(b.length >= 16 && {
      val t = fourcc(b, 4); t == "ftyp" || t == "moov" || t == "mdat"
    }, "not an ISO-BMFF container")
    val moov = child(b, 0, b.length, "moov")
    require(moov != null, "MP4 without a moov box")
    val traks = childrenOf(b, moov._1, moov._2, "trak")
    require(traks.nonEmpty, "MP4 moov without a trak")
    val metas = traks.zipWithIndex.map { case ((_, tFrom, tTo), i) =>
      val tkhd = child(b, tFrom, tTo, "tkhd")
      val trackId: Long =
        if (tkhd == null) (i + 1).toLong
        else {
          val v = b(tkhd._1) & 0xff
          require(v <= 1, s"MP4 tkhd version $v unsupported")
          // v0: verflags(4) + creation(4) + modification(4) -> track_ID;
          // v1 widens the two times to 64-bit
          if (v == 1) be32(b, tkhd._1 + 20) else be32(b, tkhd._1 + 12)
        }
      val mdia = child(b, tFrom, tTo, "mdia")
      require(mdia != null, "MP4 trak without mdia")
      val hdlr = child(b, mdia._1, mdia._2, "hdlr")
      // hdlr payload: verflags(4) + pre_defined(4) + handler_type fourcc
      val handler = if (hdlr == null) "" else fourcc(b, hdlr._1 + 8)
      val minf = child(b, mdia._1, mdia._2, "minf")
      require(minf != null, "MP4 mdia without minf")
      val stbl = child(b, minf._1, minf._2, "stbl")
      require(stbl != null, "MP4 minf without stbl")
      TrakMeta(i + 1, trackId, handler, tFrom, tTo,
        mdia._1, mdia._2, stbl._1, stbl._2)
    }
    (moov, metas)
  }

  /** Video-first selection for the single-track operator surface: the
    * first trak whose handler is `vide`, else the first trak (covers
    * single-track files and minimal containers with no hdlr at all). A
    * sampler pointed at "the video" must not index the audio stream just
    * because it was muxed first.
    */
  private def selectTrack(traks: Vector[TrakMeta]): TrakMeta =
    traks.find(_.handler == "vide").getOrElse(traks.head)

  /** EDIT LIST (trak/edts/elst, ISO/IEC 14496-12 §8.6.6) — the
    * presentation-time shift a sampler must honor: composition times are
    * delayed by the initial ctts offset, and nearly every B-frame H.264
    * file carries an elst compensating it (presentation = pts -
    * media_time), optionally behind a leading EMPTY edit (media_time -1)
    * that inserts movie-timescale delay. Returns (shift, cap): the signed
    * media-timescale amount to SUBTRACT from pts — `media_time -
    * empty_duration * mediaTs / movieTs` (floor — sub-tick residue is a
    * player concern, not a sampler's) — and the PRESENTATION-duration cap
    * from the normal edit's segment_duration (movie-timescale, converted;
    * an END-TRIMMING edit removes tail content, and a sampler emitting
    * seek rows past the trim would drive decodes of frames the edit cut;
    * segment_duration 0 = to-the-end = no cap). (0, no-cap) when no edts.
    * The general multi-segment / rate-changing forms re-sequence
    * playback; a sampler cannot honor them without a full timeline map,
    * so they are REFUSED precisely rather than silently mis-timed.
    */
  private[graft] def parseEdit(
      b: Array[Byte], moov: (Int, Int), meta: TrakMeta): (Long, Long) = {
    val edts = child(b, meta.trakFrom, meta.trakTo, "edts")
    if (edts == null) return (0L, Long.MaxValue)
    val elst = child(b, edts._1, edts._2, "elst")
    require(elst != null, "MP4 edts without elst")
    val v = b(elst._1) & 0xff
    require(v <= 1, s"MP4 elst version $v unsupported")
    val n = be32(b, elst._1 + 4).toInt
    require(n >= 1, "MP4 elst with zero entries")
    require(n <= 2,
      s"MP4 elst with $n segments — multi-segment edit lists re-sequence " +
        "playback and are not representable as a presentation shift")
    val entrySz = if (v == 1) 20 else 12
    def entry(i: Int): (Long, Long, Long) = { // (segDur movieTs, mediaTime mediaTs, rate16.16)
      val o = elst._1 + 8 + i * entrySz
      if (v == 1) (be64(b, o), be64(b, o + 8), be32(b, o + 16))
      else (be32(b, o), be32(b, o + 4).toInt.toLong, be32(b, o + 8))
    }
    val entries = (0 until n).map(entry)
    entries.foreach { case (_, _, rate) =>
      require(rate == 0x10000L,
        f"MP4 elst media_rate 0x$rate%x != 1.0 — dwell/rate edits are not " +
          "representable as a presentation shift")
    }
    val (emptyDur, normal, segDur) = entries match {
      case Seq((d, m, _)) =>
        require(m >= 0, "MP4 elst single entry is an empty edit (media_time -1)")
        (0L, m, d)
      case Seq((d, -1L, _), (d2, m, _)) =>
        require(m >= 0, "MP4 elst second entry is an empty edit too")
        (d, m, d2)
      case _ =>
        throw new IllegalArgumentException(
          "MP4 elst two-entry form must be [empty edit, normal edit]")
    }
    if (emptyDur == 0L && segDur == 0L) (normal, Long.MaxValue)
    else {
      // empty-edit delay and segment_duration are in MOVIE timescale;
      // convert via mvhd + mdhd
      val mvhd = child(b, moov._1, moov._2, "mvhd")
      require(mvhd != null, "MP4 elst timescale conversion without moov/mvhd")
      val mv = b(mvhd._1) & 0xff
      require(mv <= 1, s"MP4 mvhd version $mv unsupported")
      val movieTs = if (mv == 1) be32(b, mvhd._1 + 20) else be32(b, mvhd._1 + 12)
      require(movieTs > 0, "MP4 mvhd timescale 0")
      val mdhd = child(b, meta.mdiaFrom, meta.mdiaTo, "mdhd")
      require(mdhd != null, "MP4 mdia without mdhd")
      val dv = b(mdhd._1) & 0xff
      require(dv <= 1, s"MP4 mdhd version $dv unsupported")
      val mediaTs = if (dv == 1) be32(b, mdhd._1 + 20) else be32(b, mdhd._1 + 12)
      (normal - emptyDur * mediaTs / movieTs,
        if (segDur == 0L) Long.MaxValue else segDur * mediaTs / movieTs)
    }
  }

  /** The shift half of [[parseEdit]]. */
  private[graft] def parseEditShift(
      b: Array[Byte], moov: (Int, Int), meta: TrakMeta): Long =
    parseEdit(b, moov, meta)._1

  /** Parse the selected (video-first) track's sample table. Supports stsz
    * (fixed or per-sample sizes), stsc runs, stco and co64, stts runs;
    * version-0 and version-1 full boxes where relevant. Fails loudly on
    * truncation or inconsistent tables (counts that do not reconcile).
    */
  def parseSampleTable(b: Array[Byte]): Seq[SampleLoc] =
    walkSampleTable(b)._1

  /** [[parseSampleTable]] plus the EXACT track duration in timescale
    * units — the sum of every sample's stts delta, i.e. the dts the next
    * sample would start at.
    */
  private[graft] def walkSampleTable(b: Array[Byte]): (Seq[SampleLoc], Long) = {
    val (moov, traks) = parseTraks(b)
    walkTrack(b, moov, selectTrack(traks), multi = traks.length > 1)
  }

  /** One track's complete sample walk: its stbl, then (when the container
    * is fragmented) every trun addressing it. `multi` gates traf/trex
    * filtering by track_ID — single-trak containers keep the lenient
    * behavior (all trafs belong to the track, tkhd optional) so minimal
    * fixtures and single-stream files parse unchanged.
    */
  private def walkTrack(
      b: Array[Byte], moov: (Int, Int), meta: TrakMeta,
      multi: Boolean): (Seq[SampleLoc], Long) = {
    val (samples, dts, nSamples, nChunks) = walkStbl(b, meta.stblFrom, meta.stblTo)
    val moofs = childrenOf(b, 0, b.length, "moof")
    if (moofs.isEmpty) (samples, dts)
    else {
      val filter = if (multi) Some(meta.trackId) else None
      val (fragSamples, endDts) =
        walkFragments(b, moov, moofs, dts, nSamples, nChunks, filter)
      (samples ++ fragSamples, endDts)
    }
  }

  /** The stbl walk: (samples, end dts, nSamples, nChunks) — the counts
    * seed the fragment walk's sample/chunk numbering.
    */
  private def walkStbl(
      b: Array[Byte], stblFrom: Int, stblTo: Int): (Vector[SampleLoc], Long, Int, Int) = {
    val stbl = (stblFrom, stblTo)

    // stsz: full box; sample_size != 0 -> fixed; else per-sample table
    val stsz = child(b, stbl._1, stbl._2, "stsz")
    require(stsz != null, "MP4 stbl without stsz")
    val fixedSize = be32(b, stsz._1 + 4)
    val nSamples = be32(b, stsz._1 + 8).toInt
    require(nSamples >= 0 && nSamples < (1 << 24), s"implausible sample count $nSamples")
    val sizes: Array[Long] =
      if (fixedSize != 0L) Array.fill(nSamples)(fixedSize)
      else Array.tabulate(nSamples)(i => be32(b, stsz._1 + 12 + i * 4))

    // stsc: runs of (first_chunk, samples_per_chunk, desc_idx)
    val stsc = child(b, stbl._1, stbl._2, "stsc")
    require(stsc != null, "MP4 stbl without stsc")
    val nRuns = be32(b, stsc._1 + 4).toInt
    val runs = Array.tabulate(nRuns)(i =>
      (be32(b, stsc._1 + 8 + i * 12).toInt,      // first_chunk (1-based)
        be32(b, stsc._1 + 12 + i * 12).toInt))   // samples_per_chunk

    // stco (32-bit) or co64 chunk offsets
    val (coPay, coWide) = {
      val stco = child(b, stbl._1, stbl._2, "stco")
      if (stco != null) (stco, false)
      else {
        val co64 = child(b, stbl._1, stbl._2, "co64")
        require(co64 != null, "MP4 stbl without stco/co64")
        (co64, true)
      }
    }
    val nChunks = be32(b, coPay._1 + 4).toInt
    val chunkOff = Array.tabulate(nChunks)(i =>
      if (coWide) be64(b, coPay._1 + 8 + i * 8) else be32(b, coPay._1 + 8 + i * 4))

    // stts: runs of (sample_count, sample_delta)
    val stts = child(b, stbl._1, stbl._2, "stts")
    require(stts != null, "MP4 stbl without stts")
    val nTt = be32(b, stts._1 + 4).toInt
    val tts = Array.tabulate(nTt)(i =>
      (be32(b, stts._1 + 8 + i * 8).toInt, be32(b, stts._1 + 12 + i * 8)))

    // stss (OPTIONAL): 1-based sync-sample numbers; absent -> ALL sync
    val stss = child(b, stbl._1, stbl._2, "stss")
    val syncSet: java.util.HashSet[Integer] =
      if (stss == null) null
      else {
        val nSync = be32(b, stss._1 + 4).toInt
        val set = new java.util.HashSet[Integer](nSync * 2)
        var i = 0
        while (i < nSync) {
          val sn = be32(b, stss._1 + 8 + i * 4)
          require(sn >= 1 && sn <= nSamples,
            s"MP4 stss references sample $sn outside 1..$nSamples")
          set.add((sn - 1).toInt)
          i += 1
        }
        set
      }

    // ctts (OPTIONAL): runs of (sample_count, composition offset);
    // version 1 offsets are SIGNED 32-bit (the dominant H.264 B-frame
    // form), version 0 unsigned
    val ctts = child(b, stbl._1, stbl._2, "ctts")
    val (nCt, cts) =
      if (ctts == null) (0, Array.empty[(Int, Long)])
      else {
        val v = b(ctts._1) & 0xff
        require(v <= 1, s"MP4 ctts version $v unsupported")
        val n = be32(b, ctts._1 + 4).toInt
        (n, Array.tabulate(n) { i =>
          val cnt = be32(b, ctts._1 + 8 + i * 8).toInt
          val raw = be32(b, ctts._1 + 12 + i * 8)
          (cnt, if (v == 1) raw.toInt.toLong else raw)
        })
      }

    // samples-per-chunk resolved from the stsc runs
    def samplesInChunk(c1: Int): Int = { // 1-based chunk index
      var spc = 0
      var i = 0
      while (i < nRuns && runs(i)._1 <= c1) { spc = runs(i)._2; i += 1 }
      require(spc > 0, s"MP4 stsc does not cover chunk $c1")
      spc
    }

    val out = Vector.newBuilder[SampleLoc]
    var sample = 0
    var dts = 0L
    var ttRun = 0
    var ttLeft = if (nTt > 0) tts(0)._1 else 0
    var ctRun = 0
    var ctLeft = if (nCt > 0) cts(0)._1 else 0
    var chunk = 0
    while (sample < nSamples) {
      require(chunk < nChunks,
        s"MP4 tables inconsistent: sample $sample of $nSamples but only $nChunks chunks")
      val spc = samplesInChunk(chunk + 1)
      var within = 0
      var off = chunkOff(chunk)
      while (within < spc && sample < nSamples) {
        // run-exhaustion walked with a loop so zero-count runs (legal,
        // pointless, seen in the wild) are skipped instead of stalling,
        // and exhaustion past the LAST run fails with the precise error
        // rather than an index overrun
        while (ttLeft == 0) {
          ttRun += 1
          require(ttRun < nTt, "MP4 stts does not cover every sample")
          ttLeft = tts(ttRun)._1
        }
        val ctOff =
          if (nCt == 0) 0L
          else {
            while (ctLeft == 0) {
              ctRun += 1
              require(ctRun < nCt, "MP4 ctts does not cover every sample")
              ctLeft = cts(ctRun)._1
            }
            cts(ctRun)._2
          }
        val isSync = syncSet == null || syncSet.contains(sample)
        out += SampleLoc(sample, chunk, off, sizes(sample),
          dts, dts + ctOff, isSync)
        dts += tts(ttRun)._2
        ttLeft -= 1
        if (nCt > 0) ctLeft -= 1
        off += sizes(sample)
        sample += 1
        within += 1
      }
      chunk += 1
    }
    (out.result(), dts, nSamples, nChunks)
  }

  /** Movie fragments (fMP4 — ISO/IEC 14496-12 §8.8): DASH/HLS streams
    * keep an EMPTY stbl and carry every sample in moof/traf/trun boxes
    * interleaved with their mdat payloads. Samples append after whatever
    * the stbl carried (usually nothing), dts continuing unless a tfdt
    * pins the fragment's base decode time. `track = Some(id)` walks only
    * the trafs (and the trex defaults) addressing that track_ID — the
    * multi-track form, where fragments of several streams interleave;
    * `None` keeps the single-track leniency (every traf belongs to the
    * one stream, whatever its declared ID).
    */
  private def walkFragments(
      b: Array[Byte], moov: (Int, Int), moofs: Vector[(Int, Int, Int)],
      startDts: Long, startSample: Int, startChunk: Int,
      track: Option[Long]): (Vector[SampleLoc], Long) = {
    val out = Vector.newBuilder[SampleLoc]
    // trex (REQUIRED with fragments, §8.8.3): per-track defaults
    val mvex = child(b, moov._1, moov._2, "mvex")
    require(mvex != null, "fragmented MP4 (moof present) without moov/mvex")
    val trex = track match {
      case None =>
        val t = child(b, mvex._1, mvex._2, "trex")
        require(t != null, "fragmented MP4 without mvex/trex defaults")
        t
      case Some(tid) =>
        val t = childrenOf(b, mvex._1, mvex._2, "trex")
          .find { case (_, pay, _) => be32(b, pay + 4) == tid }
        require(t.isDefined, s"fragmented MP4 without a trex for track $tid")
        (t.get._2, t.get._3)
    }
    val trexDur = be32(b, trex._1 + 12)
    val trexSize = be32(b, trex._1 + 16)
    val trexFlags = be32(b, trex._1 + 20)

    var fragDts = startDts // continues from the stbl walk unless tfdt overrides
    var fragChunk = startChunk
    var sampleIdx = startSample
    moofs.foreach { case (moofStart, moofPay, moofEnd) =>
        val trafs = childrenOf(b, moofPay, moofEnd, "traf")
        require(trafs.nonEmpty, s"MP4 moof at $moofStart without a traf")
        // tfhd first (track_ID + optional fields gated by flags, §8.8.7);
        // the track filter drops other streams' trafs while KEEPING the
        // positional index — the §8.8.7.1 first-traf base-offset rule is
        // about file position within the moof, not position among this
        // track's trafs
        val mine = trafs.zipWithIndex.map { case ((_, trafPay, trafEnd), trafIdx) =>
          val tfhd = child(b, trafPay, trafEnd, "tfhd")
          require(tfhd != null, "MP4 traf without tfhd")
          (trafPay, trafEnd, trafIdx, tfhd)
        }.filter { case (_, _, _, tfhd) =>
          track.forall(_ == be32(b, tfhd._1 + 4))
        }
        mine.foreach { case (trafPay, trafEnd, trafIdx, tfhd) =>
          val tfFlags = be32(b, tfhd._1) & 0xffffffL
          var fo = tfhd._1 + 8 // past version/flags + track_ID
          val baseDataOffset: Option[Long] =
            if ((tfFlags & 0x1L) != 0) { val v = be64(b, fo); fo += 8; Some(v) }
            else None
          if ((tfFlags & 0x2L) != 0) fo += 4 // sample-description-index
          val defDur =
            if ((tfFlags & 0x8L) != 0) { val v = be32(b, fo); fo += 4; v }
            else trexDur
          val defSize =
            if ((tfFlags & 0x10L) != 0) { val v = be32(b, fo); fo += 4; v }
            else trexSize
          val defFlags =
            if ((tfFlags & 0x20L) != 0) { val v = be32(b, fo); fo += 4; v }
            else trexFlags
          val defaultBaseIsMoof = (tfFlags & 0x20000L) != 0
          // base: explicit > default-base-is-moof > (first traf only) the
          // moof start, per §8.8.7.1; later trafs without either would
          // need the previous traf's data end — refuse precisely rather
          // than guess
          val base: Long = baseDataOffset.getOrElse {
            require(defaultBaseIsMoof || trafIdx == 0,
              "MP4 traf without base-data-offset or default-base-is-moof " +
                "after the first traf of its moof")
            moofStart.toLong
          }

          // tfdt (optional, §8.8.12): pins the fragment's base decode time
          val tfdt = child(b, trafPay, trafEnd, "tfdt")
          if (tfdt != null) {
            val v = b(tfdt._1) & 0xff
            require(v <= 1, s"MP4 tfdt version $v unsupported")
            fragDts = if (v == 1) be64(b, tfdt._1 + 4) else be32(b, tfdt._1 + 4)
          }

          // truns (one or more, §8.8.8); data continues after the previous
          // run's bytes when data-offset is absent
          val truns = childrenOf(b, trafPay, trafEnd, "trun")
          require(truns.nonEmpty, "MP4 traf without a trun")
          var runData = base
          truns.foreach { case (_, trPay, _) =>
            val ver = b(trPay) & 0xff
            require(ver <= 1, s"MP4 trun version $ver unsupported")
            val trFlags = be32(b, trPay) & 0xffffffL
            val n = be32(b, trPay + 4).toInt
            require(n >= 0 && n < (1 << 24), s"implausible trun sample count $n")
            var o = trPay + 8
            if ((trFlags & 0x1L) != 0) { // data-offset (SIGNED 32-bit)
              runData = base + be32(b, o).toInt
              o += 4
            }
            val firstFlags: Long =
              if ((trFlags & 0x4L) != 0) { val v = be32(b, o); o += 4; v }
              else -1L
            var off = runData
            var i = 0
            while (i < n) {
              val sdur =
                if ((trFlags & 0x100L) != 0) { val v = be32(b, o); o += 4; v }
                else defDur
              val ssize =
                if ((trFlags & 0x200L) != 0) { val v = be32(b, o); o += 4; v }
                else defSize
              val sflags =
                if ((trFlags & 0x400L) != 0) { val v = be32(b, o); o += 4; v }
                else if (i == 0 && firstFlags >= 0) firstFlags
                else defFlags
              val ctOff =
                if ((trFlags & 0x800L) != 0) {
                  val raw = be32(b, o); o += 4
                  if (ver == 1) raw.toInt.toLong else raw
                } else 0L
              // sample_is_non_sync_sample is bit 16 of sample_flags
              val isSync = (sflags & 0x10000L) == 0
              out += SampleLoc(sampleIdx, fragChunk, off, ssize,
                fragDts, fragDts + ctOff, isSync)
              off += ssize
              fragDts += sdur
              sampleIdx += 1
              i += 1
            }
            runData = off
          }
          fragChunk += 1
        }
    }
    (out.result(), fragDts)
  }

  /** Every track's complete walk — (meta, samples, track duration) in
    * file order. The multi-track surface behind [[trackSampleIndex]].
    */
  private[graft] def walkAllTracks(
      b: Array[Byte]): Vector[(TrakMeta, Seq[SampleLoc], Long)] = {
    val (moov, traks) = parseTraks(b)
    traks.map { m =>
      val (samples, dur) = walkTrack(b, moov, m, multi = traks.length > 1)
      (m, samples, dur)
    }
  }

  /** DataFrame operator: one row per sample of each container —
    * (idCol, sample_idx, chunk_idx, offset, size, dts, pts, is_sync).
    * Parse is executor-local; only the bounded index rows leave.
    */
  def sampleIndex(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("sample_idx", IntegerType, nullable = false),
      StructField("chunk_idx", IntegerType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("size", LongType, nullable = false),
      StructField("dts", LongType, nullable = false),
      StructField("pts", LongType, nullable = false),
      StructField("is_sync", BooleanType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        parseSampleTable(r.getAs[Array[Byte]](bIdx)).map(s =>
          Row(id, s.sampleIdx, s.chunkIdx, s.offset, s.size,
            s.dts, s.pts, s.isSync))
      }
    }(Encoders.row(schema))
  }

  /** MULTI-TRACK sample index: one row per sample of EVERY track —
    * (idCol, track_id, handler, sample_idx, chunk_idx, offset, size, dts,
    * pts, is_sync). Real containers interleave >= 2 streams (audio is
    * often muxed first); [[sampleIndex]] answers "index the video", this
    * answers "index everything" — the pass a pipeline runs when it wants
    * the audio samples too (speech corpora) or a per-stream inventory.
    * Same scale shape: executor-local parse, bounded rows out.
    */
  def trackSampleIndex(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("track_id", LongType, nullable = false),
      StructField("handler", StringType, nullable = false),
      StructField("sample_idx", IntegerType, nullable = false),
      StructField("chunk_idx", IntegerType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("size", LongType, nullable = false),
      StructField("dts", LongType, nullable = false),
      StructField("pts", LongType, nullable = false),
      StructField("is_sync", BooleanType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        walkAllTracks(r.getAs[Array[Byte]](bIdx)).flatMap { case (m, samples, _) =>
          samples.map(s =>
            Row(id, m.trackId, m.handler, s.sampleIdx, s.chunkIdx,
              s.offset, s.size, s.dts, s.pts, s.isSync))
        }
      }
    }(Encoders.row(schema))
  }

  /** KEYFRAME sampling index — the actual entry point for a GPU decode
    * stage: for each presentation tick t = 0, everyPts, 2*everyPts, ...
    * below the track's presentation duration, the sync sample the decoder
    * should seek to — the sync sample with the SMALLEST presentation time
    * >= t (ties: smallest sample_idx; presentation order, because that is
    * what a sampler targets and B-frame reordering makes dts order lie
    * about it). Presentation time honors the track's EDIT LIST
    * ([[parseEditShift]]): pts - shift, the composition-delay
    * compensation nearly every B-frame H.264 file carries; without edts
    * the shift is 0 and presentation = pts. Ticks with no sync sample
    * at-or-after them emit nothing. One executor-local walk per
    * container; output one bounded row per tick:
    * (idCol, tick, sample_idx, pts, offset, size) — pts stays the MEDIA
    * composition time (the seekable quantity; tick is presentation).
    */
  def keyframeIndex(
      df: DataFrame, idCol: String, bytesCol: String, everyPts: Long): DataFrame = {
    require(everyPts > 0, s"keyframeIndex: everyPts > 0, got $everyPts")
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("tick", LongType, nullable = false),
      StructField("sample_idx", IntegerType, nullable = false),
      StructField("pts", LongType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("size", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](bIdx)
        // duration = total decode time (sum of stts deltas) = the dts the
        // next sample WOULD start at, exact from the walk. Ticks live on
        // the PRESENTATION timeline: the elst shift (0 without edts) maps
        // presentation t to composition pts = t + shift, and an
        // end-trimming segment_duration caps it, so ticks cover
        // [0, min(duration - shift, cap)) and the seek target is the
        // first sync sample with pts >= tick + shift.
        val (moov, traks) = parseTraks(bytes)
        val sel = selectTrack(traks)
        val (samples, duration) = walkTrack(bytes, moov, sel, traks.length > 1)
        val (shift, cap) = parseEdit(bytes, moov, sel)
        if (samples.isEmpty) Iterator.empty
        else {
          val sync = samples.filter(_.isSync)
            .sortBy(s => (s.pts, s.sampleIdx)).toArray
          if (sync.isEmpty) Iterator.empty
          else Iterator.range(0L, (duration - shift).min(cap), everyPts).flatMap { tick =>
            // binary search: first sync sample with pts >= tick + shift
            var lo = 0
            var hi = sync.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (sync(mid).pts >= tick + shift) hi = mid else lo = mid + 1
            }
            if (lo >= sync.length) None
            else {
              val s = sync(lo)
              Some(Row(id, tick, s.sampleIdx, s.pts, s.offset, s.size))
            }
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** TRACK/CODEC metadata from the stsd sample description (ISO/IEC
    * 14496-12 §12.1.3 visual / §12.2.3 audio sample entries) — the
    * "filter by codec/resolution BEFORE the decode stage" pass of a video
    * pipeline: (codec fourcc, kind, width, height, channels, sample_rate,
    * timescale from mdhd). Codec fourccs are classified by the public
    * registered list (visual avc1/hvc1/hev1/vp08/vp09/av01/mp4v, audio
    * mp4a/opus/ac-3/ec-3/flac/alac); anything else is kind='other' with
    * zeroed fields — an unknown codec must not kill a 100 TB scan.
    */
  final case class TrackInfo(
      codec: String, kind: String, width: Int, height: Int,
      channels: Int, sampleRate: Int, timescale: Long)

  private val VisualCodecs =
    Set("avc1", "hvc1", "hev1", "vp08", "vp09", "av01", "mp4v")
  private val AudioCodecs = Set("mp4a", "opus", "ac-3", "ec-3", "flac", "alac")

  private[graft] def parseTrackInfo(b: Array[Byte]): TrackInfo = {
    val (_, traks) = parseTraks(b)
    parseTrackInfoAt(b, selectTrack(traks))
  }

  private def parseTrackInfoAt(b: Array[Byte], meta: TrakMeta): TrackInfo = {
    val mdhd = child(b, meta.mdiaFrom, meta.mdiaTo, "mdhd")
    require(mdhd != null, "MP4 mdia without mdhd")
    val mdhdV = b(mdhd._1) & 0xff
    require(mdhdV <= 1, s"MP4 mdhd version $mdhdV unsupported")
    val timescale =
      if (mdhdV == 1) be32(b, mdhd._1 + 20) else be32(b, mdhd._1 + 12)
    val stbl = (meta.stblFrom, meta.stblTo)
    val stsd = child(b, stbl._1, stbl._2, "stsd")
    require(stsd != null, "MP4 stbl without stsd")
    val nEntries = be32(b, stsd._1 + 4).toInt
    require(nEntries >= 1, "MP4 stsd with zero sample entries")
    // first sample entry box starts right after the stsd full-box header
    val e = stsd._1 + 8
    val codec = fourcc(b, e + 4)
    if (VisualCodecs(codec)) {
      // 8 box hdr + 6 reserved + 2 data_ref_idx + 16 pre_defined/reserved
      val w = be32(b, e + 32) >>> 16
      val h = be32(b, e + 32) & 0xffff
      TrackInfo(codec, "video", w.toInt, h.toInt, 0, 0, timescale)
    } else if (AudioCodecs(codec)) {
      // 8 box hdr + 8 entry fields + 8 reserved -> channelcount(2)
      // samplesize(2) pre_defined(2) reserved(2) samplerate(16.16)
      val ch = (be32(b, e + 24) >>> 16).toInt
      val sr = (be32(b, e + 32) >>> 16).toInt
      TrackInfo(codec, "audio", 0, 0, ch, sr, timescale)
    } else TrackInfo(codec, "other", 0, 0, 0, 0, timescale)
  }

  /** DataFrame operator: one row per container —
    * (idCol, codec, kind, width, height, channels, sample_rate,
    * timescale). Executor-local stsd walk; payload never shuffles.
    */
  def trackInfo(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("timescale", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val ti = parseTrackInfo(r.getAs[Array[Byte]](bIdx))
        Row(r.getLong(idIdx), ti.codec, ti.kind, ti.width, ti.height,
          ti.channels, ti.sampleRate, ti.timescale)
      }
    }(Encoders.row(schema))
  }

  /** Per-TRACK codec metadata: one row per track of every container —
    * [[trackInfo]]'s columns plus (track_id, handler). The inventory pass
    * over multi-stream files ("which containers carry opus audio next to
    * av01 video?") that a single-track summary cannot answer.
    */
  def trackInfoAll(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("track_id", LongType, nullable = false),
      StructField("handler", StringType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("timescale", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val b = r.getAs[Array[Byte]](bIdx)
        parseTraks(b)._2.map { m =>
          val ti = parseTrackInfoAt(b, m)
          Row(id, m.trackId, m.handler, ti.codec, ti.kind, ti.width,
            ti.height, ti.channels, ti.sampleRate, ti.timescale)
        }
      }
    }(Encoders.row(schema))
  }

  /** Container DUP SIGNATURE at zero decode cost: the md5 of the
    * per-sample size sequence (stsz) — re-muxing a stream (new
    * interleave, new box order, different mdat padding) preserves the
    * coded sample bytes and therefore their sizes, so re-muxed copies of
    * one stream collide on this signature while distinct streams
    * essentially never do. The standard cheap video-dedup signal when
    * frame decode is out of scope. Output (idCol, n_samples, sig).
    */
  def sizeSignature(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sig", StringType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val samples = parseSampleTable(r.getAs[Array[Byte]](bIdx))
        md.reset()
        md.update(samples.sortBy(_.sampleIdx).map(_.size)
          .mkString(",").getBytes("US-ASCII"))
        val hex = md.digest().map(b => f"${b & 0xff}%02x").mkString
        Row(r.getLong(idIdx), samples.length.toLong, hex)
      }
    }(Encoders.row(schema))
  }

  // ------------------------------------------------------------- fixture

  /** Minimal spec-complete MP4 with a REAL sample table, closed-form from
    * `id` so a SQL oracle can recompute every row:
    *  - nSamples = 6 + id%5; size(i) = 10 + (17*id + 31*i) % 90
    *  - chunks of 3 samples (the last chunk may be partial -> a second
    *    stsc run, exercising the run walk)
    *  - stts: constant delta 100 + id%50 at timescale 600
    *  - stss (r14): present unless id%3 == 0 (absent -> all-sync path);
    *    when present, sync samples are i%3 == 0 (1-based 1, 4, 7, ...)
    *  - ctts (r14): present unless id%5 == 0 (absent -> pts = dts); odd
    *    ids carry VERSION 1 with signed offsets delta*((i%3) - 1) — the
    *    B-frame-reordered H.264 shape, including negative offsets — and
    *    even ids version 0 with unsigned offsets delta*(i%3); encoded as
    *    per-sample runs (count 1), exercising the run walk
    *  - chunk offsets point into a real mdat carrying the payload bytes.
    * Layout: ftyp, mdat, moov (mdat FIRST so stco offsets are independent
    * of moov's variable table sizes — closed-form in nSamples alone).
    *
    * `remux = true` emits a RE-MUX of the SAME stream: identical sample
    * sizes/timing tables, different container layout (a free box pads the
    * front, so every chunk offset moves), different mdat payload bytes,
    * and the opposite stco/co64 choice — the fixture for the
    * [[sizeSignature]] dedup gate, which must collide re-muxes and ignore
    * layout.
    *
    * `edits = true` adds an EDIT LIST (and drops the movie timescale to
    * 300, half the 600 media timescale, so the empty-edit conversion is
    * observable): id%3 == 0 a v0 single normal edit with media_time =
    * delta (the classic composition-delay form, shift = delta) AND an
    * end-trimming segment_duration of (n-2)*delta/2 movie ticks
    * (presentation cap 2*floor((n-2)*delta/2), below the (n-1)*delta
    * presentation end — honoring the trim is observable); id%3 == 1 a v1
    * [empty edit of 7 + id%5 movie ticks, normal media_time = delta]
    * (shift = delta - 2*(7 + id%5), full-length segment_duration — no
    * trim); id%3 == 2 no edts (in-corpus control, shift = 0). Sample
    * tables and mdat offsets are UNCHANGED (mdat precedes moov), so the
    * same closed-form oracle covers both.
    */
  def synthMp4(
      id: Long, remux: Boolean = false, edits: Boolean = false): Array[Byte] = {
    val n = (6 + id % 5).toInt
    val sizes = Array.tabulate(n)(i => (10 + (17 * id + 31 * i) % 90).toInt)
    val delta = (100 + id % 50).toInt
    val nChunks = (n + 2) / 3
    val out = new ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    // ftyp (24 bytes)
    be32(24); tag("ftyp"); tag("isom"); be32(512); tag("isom"); tag("iso2")
    // remux variant: a 16-byte free box shifts every mdat offset
    if (remux) { be32(16); tag("free"); be32(0); be32(0) }
    // mdat: header + payload
    val payload = sizes.sum
    be32(8L + payload); tag("mdat")
    val mdatDataStart = (if (remux) 24 + 16 else 24) + 8
    sizes.zipWithIndex.foreach { case (sz, i) =>
      var k = 0
      while (k < sz) {
        // re-mux carries DIFFERENT bytes of the same sizes (a re-encode of
        // headers/padding, not of the coded stream, would look like this)
        out.write((if (remux) (3 * id + 13 * i + 5 * k) else (id + 7 * i + k)).toInt & 0xff)
        k += 1
      }
    }
    // chunk offsets: cumulative over whole chunks of 3
    val chunkOff = new Array[Long](nChunks)
    var acc = mdatDataStart.toLong
    var s = 0
    for (c <- 0 until nChunks) {
      chunkOff(c) = acc
      var j = 0
      while (j < 3 && s < n) { acc += sizes(s); s += 1; j += 1 }
    }
    // moov/trak/mdia/minf/stbl with stsz/stsc/stco/stts
    def box(name: String)(body: => Array[Byte]): Array[Byte] = {
      val inner = body
      val o = new ByteArrayOutputStream()
      val sz = 8 + inner.length
      o.write(((sz >> 24) & 0xff)); o.write(((sz >> 16) & 0xff))
      o.write(((sz >> 8) & 0xff)); o.write((sz & 0xff))
      o.write(name.getBytes("US-ASCII")); o.write(inner)
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
    val stsz = box("stsz")(ints((0L +: 0L +: n.toLong +: sizes.map(_.toLong).toSeq): _*))
    val stscRuns: Seq[Long] =
      if (n % 3 == 0) Seq(1L, 3L, 1L)
      else Seq(1L, 3L, 1L, nChunks.toLong, (n % 3).toLong, 1L)
    val stsc = box("stsc")(ints((0L +: (stscRuns.length / 3).toLong +: stscRuns): _*))
    // odd ids carry 64-bit chunk offsets (co64) so both offset-box paths
    // run on real data; values are identical, only the width differs.
    // The remux flips the choice — same stream, opposite offset box.
    val stco =
      if ((id % 2 == 1) != remux) box("co64") {
        val o = new ByteArrayOutputStream()
        o.write(ints(0L, nChunks.toLong))
        chunkOff.foreach { x =>
          o.write(ints(x >>> 32)); o.write(ints(x & 0xffffffffL))
        }
        o.toByteArray
      }
      else box("stco")(ints((0L +: nChunks.toLong +: chunkOff.toSeq): _*))
    val stts = box("stts")(ints(0L, 1L, n.toLong, delta.toLong))
    // stss: sync samples 1-based 1, 4, 7, ... unless id%3 == 0 (absent ->
    // the all-sync default path)
    val stssOpt: Option[Array[Byte]] =
      if (id % 3 == 0) None
      else {
        val syncs = (0 until n).filter(_ % 3 == 0).map(i => (i + 1).toLong)
        Some(box("stss")(ints((0L +: syncs.length.toLong +: syncs): _*)))
      }
    // ctts: per-sample composition offsets unless id%5 == 0 (absent ->
    // pts = dts); odd ids use VERSION 1 (signed, (i%3 - 1)*delta — real
    // negative offsets), even ids version 0 (unsigned, (i%3)*delta)
    val cttsOpt: Option[Array[Byte]] =
      if (id % 5 == 0) None
      else if (id % 2 == 1) Some(box("ctts") {
        val o = new ByteArrayOutputStream()
        o.write(ints((1L << 24), n.toLong)) // version 1, flags 0
        (0 until n).foreach { i =>
          o.write(ints(1L, (((i % 3) - 1).toLong * delta) & 0xffffffffL))
        }
        o.toByteArray
      })
      else Some(box("ctts")(ints(
        (0L +: n.toLong +:
          (0 until n).flatMap(i => Seq(1L, (i % 3).toLong * delta))): _*)))
    // stsd (r14): closed-form codec metadata — id%3 picks avc1 / hvc1 /
    // mp4a; full-width spec entries (VisualSampleEntry 86 B incl.
    // compressorname, AudioSampleEntry 36 B) though the reader only needs
    // the leading fields; codec config children (avcC etc.) deliberately
    // absent — trackInfo is a metadata pass, not a decoder
    val stsd = box("stsd")(ints(0L, 1L) ++ {
      def entry(name: String, tail: Array[Byte]): Array[Byte] = box(name)(
        Array.fill[Byte](6)(0) ++ Array[Byte](0, 1) ++ tail)
      if (id % 3 == 2) { // mp4a: reserved(8) ch(2) ss(2) pre(2) res(2) rate16.16
        val ch = (1 + id % 2).toInt
        val sr = (16000 + 1000 * (id % 8)).toInt
        entry("mp4a", ints(0L, 0L) ++
          Array[Byte]((ch >> 8).toByte, ch.toByte, 0, 16, 0, 0, 0, 0) ++
          ints(sr.toLong << 16))
      } else {
        val codec = if (id % 3 == 0) "avc1" else "hvc1"
        val w = (if (id % 3 == 0) 320 else 640) + 16 * (id % 8).toInt
        val h = (if (id % 3 == 0) 240 else 360) + 16 * (id % 5).toInt
        entry(codec, ints(0L, 0L, 0L, 0L, // pre_defined/reserved (16 B)
          ((w.toLong << 16) | h), 0x00480000L, 0x00480000L, 0L) ++
          Array[Byte](0, 1) ++ Array.fill[Byte](32)(0) ++
          Array[Byte](0, 24, -1, -1)) // depth 24, pre_defined -1
      }
    })
    val stbl = box("stbl")(stsd ++ stsz ++ stsc ++ stco ++ stts ++
      stssOpt.getOrElse(Array.empty[Byte]) ++
      cttsOpt.getOrElse(Array.empty[Byte]))
    val minf = box("minf")(stbl)
    // mdhd: version 0, timescale 600, duration n*delta
    val mdhd = box("mdhd")(ints(0L, 0L, 0L, 600L, n.toLong * delta))
    val mdia = box("mdia")(mdhd ++ minf)
    // elst (edits fixture): v0 normal-only on id%3==0, v1 empty+normal on
    // id%3==1, absent on id%3==2; movie timescale 300 (below), media 600
    val edts: Array[Byte] =
      if (!edits || id % 3 == 2) Array.empty
      else if (id % 3 == 0)
        // segment_duration END-TRIMS: (n-2)*delta of presentation in movie
        // ticks (cap_media = 2*floor((n-2)*delta/2) < the (n-1)*delta
        // presentation end, so honoring the trim is observable)
        box("edts")(box("elst")(ints(
          0L, 1L, (n - 2).toLong * delta / 2, delta.toLong, 0x10000L)))
      else {
        val emptyDur = 7 + id % 5 // movie ticks
        val o = new ByteArrayOutputStream()
        o.write(ints(1L << 24, 2L)) // version 1, two entries
        o.write(ints(0L, emptyDur)) // u64 segment_duration
        o.write(ints(0xffffffffL, 0xffffffffL)) // s64 media_time = -1
        o.write(ints(0x10000L))
        o.write(ints(0L, n.toLong * delta * 300 / 600)) // u64 seg dur
        o.write(ints(0L, delta.toLong)) // s64 media_time = delta
        o.write(ints(0x10000L))
        box("edts")(box("elst")(o.toByteArray))
      }
    val trak = box("trak")(edts ++ mdia)
    val mvhd = box("mvhd")(ints(
      0L, 0L, 0L, if (edits) 300L else 600L, n.toLong * delta))
    val moov = box("moov")(mvhd ++ trak)
    out.write(moov)
    out.toByteArray
  }

  /** Fixture frame: (idCol, bytes) of [[synthMp4]] containers. */
  def synthMp4Payload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map(r => Row(r.getLong(idIdx), synthMp4(r.getLong(idIdx))))
    }(Encoders.row(schema))
  }

  /** Fixture frame: (idCol, bytes) of [[synthMp4]] edits-variant
    * containers (elst per id%3 — see the generator doc).
    */
  def synthMp4EditedPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map(r =>
        Row(r.getLong(idIdx), synthMp4(r.getLong(idIdx), edits = true)))
    }(Encoders.row(schema))
  }

  /** CLIP DETECTION — container-level "this short video is a contiguous
    * cut of that long one": a clip re-muxed from a longer stream keeps
    * the coded sample bytes of the cut range, so its stsz size SEQUENCE
    * is a contiguous run inside the source's. Two-frame operator: for
    * every clip (its full size sequence) find every corpus container
    * containing it and the position. Scale shape: a width-`minLen`
    * shingle equi-join (clip's FIRST window hash vs every corpus window
    * hash — both via codegen'd hash/slice/sequence built-ins, no UDFs)
    * proposes candidates; a re-join against the corpus sequences verifies
    * full containment by array slice equality. Window rows carry only
    * (hash, id, pos) — sequences are re-joined, never duplicated per
    * window, so the fan-out is linear in total samples. Clips shorter
    * than `minLen` cannot anchor a shingle and are skipped (documented —
    * one short clip must not kill a 100 TB scan). Output:
    * (clip_id, container_id, pos), one row per verified containment.
    */
  def clipPairs(
      clips: DataFrame, corpus: DataFrame, idCol: String, bytesCol: String,
      minLen: Int): DataFrame = {
    require(minLen >= 2, s"clipPairs: minLen >= 2, got $minLen")
    import org.apache.spark.sql.functions._
    val seqSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("sizes", ArrayType(LongType, containsNull = false),
        nullable = false)))
    def seqs(df: DataFrame): DataFrame = {
      val idIdx = df.schema.fieldIndex(idCol)
      val bIdx = df.schema.fieldIndex(bytesCol)
      df.mapPartitions { rows =>
        rows.map { r =>
          val locs = parseSampleTable(r.getAs[Array[Byte]](bIdx))
          Row(r.getLong(idIdx), locs.sortBy(_.sampleIdx).map(_.size))
        }
      }(Encoders.row(seqSchema))
    }
    val cseq = seqs(clips)
      .filter(size(col("sizes")) >= minLen)
      .select(col(idCol).as("clip_id"), col("sizes").as("clip_sizes"),
        size(col("sizes")).as("clip_len"),
        hash(slice(col("sizes"), 1, minLen)).as("wkey"))
    // materialize once (the hammingPairs pattern): the corpus sequences
    // feed BOTH the window derivation and the verify re-join, and
    // unmaterialized the full container parse would run twice; released
    // by ContextCleaner once the returned frame is dereferenced
    val tseq = seqs(corpus)
      .select(col(idCol).as("container_id"), col("sizes"))
      .localCheckpoint(true)
    val wins = tseq
      .filter(size(col("sizes")) >= minLen)
      .select(col("container_id"),
        explode(sequence(lit(0), size(col("sizes")) - minLen)).as("pos"),
        col("sizes"))
      .select(col("container_id"), col("pos"),
        hash(slice(col("sizes"), col("pos") + 1, lit(minLen))).as("wkey"))
    wins.join(cseq, "wkey")
      .join(tseq, "container_id")
      .filter(size(col("sizes")) >= col("pos") + col("clip_len") &&
        slice(col("sizes"), col("pos") + 1, col("clip_len")) === col("clip_sizes"))
      .select(col("clip_id"), col("container_id"), col("pos"))
  }

  /** Entropy size generator for containment fixtures: the plain
    * [[synthMp4]] sizes walk an arithmetic progression mod 90 (fine for
    * tables, catastrophic for CONTAINMENT — every window collapses to ~90
    * classes and chance matches percolate, the same lesson as the audio
    * fixture's first cut). The working form is hard-won: a SEQUENCE
    * collision needs Delta(j) = v(s+d, j) - v(s, j) ≡ 0 mod 900 at every
    * window position SIMULTANEOUSLY, and for any single-modulus
    * polynomial those deltas are correlated across j — src-steps d where
    * d * (coefficient mix) collapses mod 900 uniformly in j exist at
    * constant density, so cross matches grow LINEAR in corpus size
    * (measured: d = ±90/±450/±900 resonance classes, and a plain modulus
    * is additionally periodic in src with period = the modulus). Two
    * coprime moduli put two independent residues of src into the
    * coefficients (two simultaneous resonance constraints — none
    * survive), their product 3001*2999 = 9.0M exceeds the replica id
    * range (no periodic repeats), and the WIDE [10, 910) range (real
    * stsz values span kilobytes) keeps the per-position collision rate at
    * 1/900: measured 156 accidental containments per 1M ids vs 142,858
    * planted — the birthday regime, computed identically on both sides.
    */
  private[graft] def entropySize(src: Long, j: Long): Long =
    10 + (((src % 3001) * (j + 3) * (j + 3) +
      (src % 2999) * (j + 5) * (j + 5)) % 3001) % 900

  /** Minimal container around an explicit size sequence (chunks of 3,
    * stco, constant delta 100 at timescale 600) — the clip-fixture
    * builder; the walk reads the authoritative stsz, not the formula.
    */
  private def synthMp4Sized(id: Long, sizes: Array[Long]): Array[Byte] = {
    val n = sizes.length
    val nChunks = (n + 2) / 3
    val out = new ByteArrayOutputStream()
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def be32o(o: ByteArrayOutputStream, v: Long): Unit = {
      o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
    }
    def box(name: String)(body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      be32o(o, 8L + body.length); o.write(name.getBytes("US-ASCII")); o.write(body)
      o.toByteArray
    }
    def ints(vs: Long*): Array[Byte] = {
      val o = new ByteArrayOutputStream(); vs.foreach(be32o(o, _)); o.toByteArray
    }
    be32o(out, 24); tag("ftyp"); tag("isom"); be32o(out, 512); tag("isom"); tag("iso2")
    be32o(out, 8L + sizes.sum); tag("mdat")
    sizes.zipWithIndex.foreach { case (sz, i) =>
      var k = 0
      while (k < sz) { out.write((id + 7 * i + k).toInt & 0xff); k += 1 }
    }
    val chunkOff = new Array[Long](nChunks)
    var acc = 32L
    var s = 0
    for (c <- 0 until nChunks) {
      chunkOff(c) = acc
      var j = 0
      while (j < 3 && s < n) { acc += sizes(s); s += 1; j += 1 }
    }
    val stscRuns: Seq[Long] =
      if (n % 3 == 0) Seq(1L, 3L, 1L)
      else Seq(1L, 3L, 1L, nChunks.toLong, (n % 3).toLong, 1L)
    val stbl = box("stbl")(
      box("stsz")(ints((0L +: 0L +: n.toLong +: sizes.toSeq): _*)) ++
        box("stsc")(ints((0L +: (stscRuns.length / 3).toLong +: stscRuns): _*)) ++
        box("stco")(ints((0L +: nChunks.toLong +: chunkOff.toSeq): _*)) ++
        box("stts")(ints(0L, 1L, n.toLong, 100L)))
    val mdhd = box("mdhd")(ints(0L, 0L, 0L, 600L, n.toLong * 100))
    val trak = box("trak")(box("mdia")(mdhd ++ box("minf")(stbl)))
    out.write(box("moov")(
      box("mvhd")(ints(0L, 0L, 0L, 600L, n.toLong * 100)) ++ trak))
    out.toByteArray
  }

  /** Fixture frame: entropy-sized base containers — n = 6 + id%5 samples
    * of size [[entropySize]](id, i).
    */
  def synthMp4EntropyPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val n = (6 + id % 5).toInt
        Row(id, synthMp4Sized(id, Array.tabulate(n)(i => entropySize(id, i))))
      }
    }(Encoders.row(schema))
  }

  /** Fixture frame: planted CLIPS — for every 7th id, a container carrying
    * base id's samples [1, 1 + 4 + id%2) (sizes [[entropySize]](id, 1+j)),
    * living at id + [[MediaDecode.TwinOffset]]. The corpus the
    * [[clipPairs]] gate must map back to position 1 of its source.
    */
  def synthMp4ClipPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    import org.apache.spark.sql.functions.col
    df.filter(col(idCol) % 7 === 0).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val len = (4 + id % 2).toInt
        Row(id + MediaDecode.TwinOffset,
          synthMp4Sized(id + MediaDecode.TwinOffset,
            Array.tabulate(len)(j => entropySize(id, 1 + j))))
      }
    }(Encoders.row(schema))
  }

  /** MULTI-TRACK fixture — the real-world "audio muxed FIRST" shape: one
    * mdat shared by an audio track (track_ID 1, hdlr `soun`, mdhd
    * timescale 48000) and a video track (track_ID 2, hdlr `vide`,
    * timescale 600), audio trak FIRST in moov so video-first selection is
    * observable, every table closed-form from `id`:
    *  - audio: na = 4 + id%3 samples; size(i) = 8 + (13*id + 7*i) % 40;
    *    chunks of 2 (partial last chunk -> second stsc run); stts constant
    *    delta 1024; no stss (audio frames are all sync), no ctts; stco
    *  - video: EXACTLY [[synthMp4]]'s tables (sizes/chunking/stts/stss/
    *    ctts/stco-vs-co64 rules), so its sample rows match the single-trak
    *    fixture's with every offset shifted by the audio payload; stsd is
    *    avc1 (even ids) / hvc1 (odd) with arithmetic dims
    *  - mdat carries ALL audio bytes then ALL video bytes (data from
    *    offset 32, audio chunk offsets first, video offsets + audio
    *    payload).
    */
  def synthMp4MultiTrack(id: Long): Array[Byte] = {
    val na = (4 + id % 3).toInt
    val aSizes = Array.tabulate(na)(i => (8 + (13 * id + 7 * i) % 40).toInt)
    val naChunks = (na + 1) / 2
    val nv = (6 + id % 5).toInt
    val vSizes = Array.tabulate(nv)(i => (10 + (17 * id + 31 * i) % 90).toInt)
    val vDelta = (100 + id % 50).toInt
    val nvChunks = (nv + 2) / 3
    val out = new ByteArrayOutputStream()
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def be32o(o: ByteArrayOutputStream, v: Long): Unit = {
      o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
    }
    def box(name: String)(body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      be32o(o, 8L + body.length); o.write(name.getBytes("US-ASCII")); o.write(body)
      o.toByteArray
    }
    def ints(vs: Long*): Array[Byte] = {
      val o = new ByteArrayOutputStream(); vs.foreach(be32o(o, _)); o.toByteArray
    }
    // ftyp (24) + mdat header (8) -> data at 32
    be32o(out, 24); tag("ftyp"); tag("isom"); be32o(out, 512); tag("isom"); tag("iso2")
    val aPayload = aSizes.sum
    val vPayload = vSizes.sum
    be32o(out, 8L + aPayload + vPayload); tag("mdat")
    aSizes.zipWithIndex.foreach { case (sz, i) =>
      var k = 0
      while (k < sz) { out.write((id + 5 * i + k).toInt & 0xff); k += 1 }
    }
    vSizes.zipWithIndex.foreach { case (sz, i) =>
      var k = 0
      while (k < sz) { out.write((id + 7 * i + k).toInt & 0xff); k += 1 }
    }
    // chunk offsets: audio from 32, video after the whole audio payload
    def chunkOffsets(start: Long, sizes: Array[Int], perChunk: Int): Array[Long] = {
      val nc = (sizes.length + perChunk - 1) / perChunk
      val offs = new Array[Long](nc)
      var acc = start
      var s = 0
      for (c <- 0 until nc) {
        offs(c) = acc
        var j = 0
        while (j < perChunk && s < sizes.length) { acc += sizes(s); s += 1; j += 1 }
      }
      offs
    }
    val aOffs = chunkOffsets(32L, aSizes, 2)
    val vOffs = chunkOffsets(32L + aPayload, vSizes, 3)
    // full-width tkhd (84-byte v0 payload; the reader needs track_ID) and
    // minimal hdlr (verflags + pre_defined + handler + reserved + name)
    def tkhd(trackId: Long, dur: Long): Array[Byte] = box("tkhd")(
      ints(0L, 0L, 0L, trackId, 0L, dur) ++ Array.fill[Byte](60)(0))
    def hdlr(handler: String): Array[Byte] = box("hdlr")(
      ints(0L, 0L) ++ handler.getBytes("US-ASCII") ++ Array.fill[Byte](13)(0))
    def stscBox(n: Int, perChunk: Int, nc: Int): Array[Byte] = {
      val runs: Seq[Long] =
        if (n % perChunk == 0) Seq(1L, perChunk.toLong, 1L)
        else Seq(1L, perChunk.toLong, 1L, nc.toLong, (n % perChunk).toLong, 1L)
      box("stsc")(ints((0L +: (runs.length / 3).toLong +: runs): _*))
    }
    def entry(name: String, tail: Array[Byte]): Array[Byte] = box(name)(
      Array.fill[Byte](6)(0) ++ Array[Byte](0, 1) ++ tail)

    // ---- audio trak (FIRST in moov, as real muxers often emit)
    val aStsd = box("stsd")(ints(0L, 1L) ++ {
      val ch = (1 + id % 2).toInt
      entry("mp4a", ints(0L, 0L) ++
        Array[Byte]((ch >> 8).toByte, ch.toByte, 0, 16, 0, 0, 0, 0) ++
        ints(48000L << 16))
    })
    val aStbl = box("stbl")(aStsd ++
      box("stsz")(ints((0L +: 0L +: na.toLong +: aSizes.map(_.toLong).toSeq): _*)) ++
      stscBox(na, 2, naChunks) ++
      box("stco")(ints((0L +: naChunks.toLong +: aOffs.toSeq): _*)) ++
      box("stts")(ints(0L, 1L, na.toLong, 1024L)))
    val aMdhd = box("mdhd")(ints(0L, 0L, 0L, 48000L, na.toLong * 1024))
    val trakA = box("trak")(tkhd(1L, na.toLong * 1024) ++
      box("mdia")(aMdhd ++ hdlr("soun") ++ box("minf")(aStbl)))

    // ---- video trak: synthMp4's tables over the shifted offsets
    val vStsd = box("stsd")(ints(0L, 1L) ++ {
      val codec = if (id % 2 == 0) "avc1" else "hvc1"
      val w = 320 + 16 * (id % 8).toInt
      val h = 240 + 16 * (id % 5).toInt
      entry(codec, ints(0L, 0L, 0L, 0L,
        ((w.toLong << 16) | h), 0x00480000L, 0x00480000L, 0L) ++
        Array[Byte](0, 1) ++ Array.fill[Byte](32)(0) ++
        Array[Byte](0, 24, -1, -1))
    })
    val vStco =
      if (id % 2 == 1) box("co64") {
        val o = new ByteArrayOutputStream()
        o.write(ints(0L, nvChunks.toLong))
        vOffs.foreach { x => be32o(o, x >>> 32); be32o(o, x & 0xffffffffL) }
        o.toByteArray
      }
      else box("stco")(ints((0L +: nvChunks.toLong +: vOffs.toSeq): _*))
    val vStss: Array[Byte] =
      if (id % 3 == 0) Array.empty
      else {
        val syncs = (0 until nv).filter(_ % 3 == 0).map(i => (i + 1).toLong)
        box("stss")(ints((0L +: syncs.length.toLong +: syncs): _*))
      }
    val vCtts: Array[Byte] =
      if (id % 5 == 0) Array.empty
      else if (id % 2 == 1) {
        val o = new ByteArrayOutputStream()
        be32o(o, 1L << 24)
        be32o(o, nv.toLong)
        (0 until nv).foreach { i =>
          be32o(o, 1L); be32o(o, (((i % 3) - 1).toLong * vDelta) & 0xffffffffL)
        }
        box("ctts")(o.toByteArray)
      }
      else box("ctts")(ints(
        (0L +: nv.toLong +:
          (0 until nv).flatMap(i => Seq(1L, (i % 3).toLong * vDelta))): _*))
    val vStbl = box("stbl")(vStsd ++
      box("stsz")(ints((0L +: 0L +: nv.toLong +: vSizes.map(_.toLong).toSeq): _*)) ++
      stscBox(nv, 3, nvChunks) ++ vStco ++
      box("stts")(ints(0L, 1L, nv.toLong, vDelta.toLong)) ++ vStss ++ vCtts)
    val vMdhd = box("mdhd")(ints(0L, 0L, 0L, 600L, nv.toLong * vDelta))
    val trakV = box("trak")(tkhd(2L, nv.toLong * vDelta) ++
      box("mdia")(vMdhd ++ hdlr("vide") ++ box("minf")(vStbl)))

    val mvhd = box("mvhd")(ints(0L, 0L, 0L, 600L, nv.toLong * vDelta))
    out.write(box("moov")(mvhd ++ trakA ++ trakV))
    out.toByteArray
  }

  /** Fixture frame: (idCol, bytes) of [[synthMp4MultiTrack]] containers. */
  def synthMp4MultiTrackPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map(r => Row(r.getLong(idIdx), synthMp4MultiTrack(r.getLong(idIdx))))
    }(Encoders.row(schema))
  }

  /** Minimal spec-complete FRAGMENTED MP4 (fMP4, the DASH/HLS shape):
    * empty stbl in moov, mvex/trex defaults, then F = 2 + id%3 movie
    * fragments of moof(mfhd, traf(tfhd, tfdt?, trun)) + mdat — every table
    * closed-form from `id` so a SQL oracle recomputes every sample row:
    *  - fragment f carries nf = 3 + (id+f)%4 samples;
    *    size(f,i) = 10 + (17*id + 29*f + 31*i) % 90
    *  - durations ALWAYS from the trex default delta = 100 + id%50 (the
    *    trun duration bit stays 0 — defaults are the common DASH shape)
    *  - tfhd: even ids carry an explicit absolute base-data-offset; odd
    *    ids default-base-is-moof with the trun data-offset spanning the
    *    moof — both address the SAME mdat payload byte
    *  - tfdt: present unless id%7 == 0 (absent -> dts continues across
    *    fragments); version 1 (64-bit) on odd ids, version 0 on even; the
    *    value introduces a REAL +1000-per-fragment gap, so honoring tfdt
    *    is observable, not cosmetic
    *  - trun: per-sample sizes always; per-sample flags (sync = i%3 == 0)
    *    unless id%3 == 0, which instead sets first-sample-flags = sync
    *    over non-sync trex defaults (the classic one-keyframe-per-segment
    *    stream); composition offsets absent on id%5 == 0, VERSION 1
    *    signed ((i%3)-1)*delta on odd ids, version 0 unsigned on even.
    */
  def synthMp4Fragmented(id: Long): Array[Byte] = {
    val delta = (100 + id % 50).toInt
    val nFrags = (2 + id % 3).toInt
    val nf = Array.tabulate(nFrags)(f => (3 + (id + f) % 4).toInt)
    val out = new ByteArrayOutputStream()
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def be32o(o: ByteArrayOutputStream, v: Long): Unit = {
      o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
    }
    def box(name: String)(body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      be32o(o, 8L + body.length); o.write(name.getBytes("US-ASCII")); o.write(body)
      o.toByteArray
    }
    def ints(vs: Long*): Array[Byte] = {
      val o = new ByteArrayOutputStream(); vs.foreach(be32o(o, _)); o.toByteArray
    }
    // ftyp (24) + moov (204, constant: empty stbl + trex) = data from 228
    be32o(out, 24); tag("ftyp"); tag("isom"); be32o(out, 512); tag("isom"); tag("iso2")
    // empty stbl (stsz fixed=0 count=0, zero-entry stsc/stco/stts) — the
    // spec-required shape when all samples live in fragments
    val stbl = box("stbl")(
      box("stsz")(ints(0L, 0L, 0L)) ++ box("stsc")(ints(0L, 0L)) ++
        box("stco")(ints(0L, 0L)) ++ box("stts")(ints(0L, 0L)))
    val totalSamples = nf.sum
    val mdhd = box("mdhd")(ints(0L, 0L, 0L, 600L, totalSamples.toLong * delta))
    val trak = box("trak")(box("mdia")(mdhd ++ box("minf")(stbl)))
    val mvhd = box("mvhd")(ints(0L, 0L, 0L, 600L, totalSamples.toLong * delta))
    // trex: track 1, desc 1, default duration = delta, size 0,
    // flags = non-sync (0x10000) — sync comes from trun/first-sample flags
    val mvex = box("mvex")(box("trex")(ints(0L, 1L, 1L, delta.toLong, 0L, 0x10000L)))
    out.write(box("moov")(mvhd ++ trak ++ mvex))

    var fragStart = out.size().toLong // 228
    var cumSamples = 0
    for (f <- 0 until nFrags) {
      val n = nf(f)
      val sizes = Array.tabulate(n)(i => (10 + (17 * id + 29 * f + 31 * i) % 90).toInt)
      val perS = 4 + (if (id % 3 != 0) 4 else 0) + (if (id % 5 != 0) 4 else 0)
      val trunSz = 8 + 12 + (if (id % 3 == 0) 4 else 0) + n * perS
      val tfhdSz = if (id % 2 == 0) 24 else 16
      val tfdtSz = if (id % 7 == 0) 0 else if (id % 2 == 1) 20 else 16
      val moofSz = 8 + 16 + (8 + tfhdSz + tfdtSz + trunSz)
      val dataStart = fragStart + moofSz + 8

      val tfhd =
        if (id % 2 == 0) box("tfhd") { // base-data-offset-present (u64)
          val o = new ByteArrayOutputStream()
          be32o(o, 0x1L); be32o(o, 1L)
          be32o(o, dataStart >>> 32); be32o(o, dataStart & 0xffffffffL)
          o.toByteArray
        }
        else box("tfhd")(ints(0x20000L, 1L)) // default-base-is-moof
      val tfdtVal = cumSamples.toLong * delta + f.toLong * 1000
      val tfdt: Array[Byte] =
        if (id % 7 == 0) Array.empty
        else if (id % 2 == 1) box("tfdt") { // version 1: 64-bit time
          val o = new ByteArrayOutputStream()
          be32o(o, 1L << 24)
          be32o(o, tfdtVal >>> 32); be32o(o, tfdtVal & 0xffffffffL)
          o.toByteArray
        }
        else box("tfdt")(ints(0L, tfdtVal))
      val trun = box("trun") {
        val o = new ByteArrayOutputStream()
        val ver = if (id % 2 == 1) 1L else 0L
        val flags = 0x1L | 0x200L |
          (if (id % 3 != 0) 0x400L else 0x4L) |
          (if (id % 5 != 0) 0x800L else 0L)
        be32o(o, (ver << 24) | flags)
        be32o(o, n.toLong)
        // data offset is relative to the tfhd base: absolute base (even)
        // -> 0; moof start (odd) -> past the whole moof + mdat header
        be32o(o, if (id % 2 == 0) 0L else moofSz + 8L)
        if (id % 3 == 0) be32o(o, 0L) // first-sample-flags: sync
        for (i <- 0 until n) {
          be32o(o, sizes(i).toLong)
          if (id % 3 != 0) be32o(o, if (i % 3 == 0) 0L else 0x10000L)
          if (id % 5 != 0) {
            val ct =
              if (id % 2 == 1) (((i % 3) - 1).toLong * delta) & 0xffffffffL
              else (i % 3).toLong * delta
            be32o(o, ct)
          }
        }
        o.toByteArray
      }
      val traf = box("traf")(tfhd ++ tfdt ++ trun)
      val moof = box("moof")(box("mfhd")(ints(0L, f + 1L)) ++ traf)
      require(moof.length == moofSz,
        s"fixture moof size drifted: built ${moof.length}, computed $moofSz")
      out.write(moof)
      be32o(out, 8L + sizes.sum); tag("mdat")
      sizes.zipWithIndex.foreach { case (sz, i) =>
        var k = 0
        while (k < sz) { out.write((id + 11 * f + 7 * i + k).toInt & 0xff); k += 1 }
      }
      fragStart += moofSz + 8 + sizes.sum
      cumSamples += n
    }
    out.toByteArray
  }

  /** MULTI-TRACK fragmented fixture — the muxed-DASH/smooth-streaming
    * shape: each moof carries TWO trafs (audio track 1 FIRST, then video
    * track 2) over one shared mdat, so a per-track walk must filter trafs
    * by tfhd track_ID and pick ITS trex defaults. Closed-form from `id`:
    *  - moov: audio trak (tkhd 1, hdlr soun, ts 48000) then video trak
    *    (tkhd 2, hdlr vide, ts 600), both with empty stbls; mvex carries
    *    trex(1, dur 512, flags sync) and trex(2, dur 100+id%50, flags
    *    non-sync). Header is CONSTANT: data starts at 638.
    *  - fragment f of F = 2 + id%3: na = 2 + (id+f)%3 audio samples of
    *    size 8 + (11*id + 5*f + 7*i) % 30, then nv = 3 + (id+f)%4 video
    *    samples of size 10 + (17*id + 29*f + 31*i) % 90, back to back in
    *    the mdat; both trafs default-base-is-moof with explicit trun
    *    data-offsets; audio sync from trex defaults, video per-sample
    *    flags (sync at i%3 == 0); durations from trex; no tfdt (dts
    *    continues per track across fragments — the single-track fixture
    *    covers tfdt).
    */
  def synthMp4FragMultiTrack(id: Long): Array[Byte] = {
    val vDelta = (100 + id % 50).toInt
    val nFrags = (2 + id % 3).toInt
    val out = new ByteArrayOutputStream()
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def be32o(o: ByteArrayOutputStream, v: Long): Unit = {
      o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
    }
    def box(name: String)(body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      be32o(o, 8L + body.length); o.write(name.getBytes("US-ASCII")); o.write(body)
      o.toByteArray
    }
    def ints(vs: Long*): Array[Byte] = {
      val o = new ByteArrayOutputStream(); vs.foreach(be32o(o, _)); o.toByteArray
    }
    be32o(out, 24); tag("ftyp"); tag("isom"); be32o(out, 512); tag("isom"); tag("iso2")
    val emptyStbl = box("stbl")(
      box("stsz")(ints(0L, 0L, 0L)) ++ box("stsc")(ints(0L, 0L)) ++
        box("stco")(ints(0L, 0L)) ++ box("stts")(ints(0L, 0L)))
    def trak(trackId: Long, handler: String, timescale: Long): Array[Byte] =
      box("trak")(
        box("tkhd")(ints(0L, 0L, 0L, trackId, 0L, 0L) ++ Array.fill[Byte](60)(0)) ++
          box("mdia")(
            box("mdhd")(ints(0L, 0L, 0L, timescale, 0L)) ++
              box("hdlr")(ints(0L, 0L) ++ handler.getBytes("US-ASCII") ++
                Array.fill[Byte](13)(0)) ++
              box("minf")(emptyStbl)))
    val mvex = box("mvex")(
      box("trex")(ints(0L, 1L, 1L, 512L, 0L, 0L)) ++
        box("trex")(ints(0L, 2L, 1L, vDelta.toLong, 0L, 0x10000L)))
    val mvhd = box("mvhd")(ints(0L, 0L, 0L, 600L, 0L))
    out.write(box("moov")(mvhd ++ trak(1L, "soun", 48000L) ++
      trak(2L, "vide", 600L) ++ mvex))
    require(out.size() == 638,
      s"fixture header drifted: ${out.size()} != 638 (oracle literal)")

    var fragStart = 638L
    for (f <- 0 until nFrags) {
      val na = (2 + (id + f) % 3).toInt
      val aSizes = Array.tabulate(na)(i => (8 + (11 * id + 5 * f + 7 * i) % 30).toInt)
      val nv = (3 + (id + f) % 4).toInt
      val vSizes = Array.tabulate(nv)(i => (10 + (17 * id + 29 * f + 31 * i) % 90).toInt)
      val moofSz = 112 + 4 * na + 8 * nv
      val apay = aSizes.sum
      // trafA: tfhd default-base-is-moof; trun data-offset + sizes only
      val trafA = box("traf")(
        box("tfhd")(ints(0x20000L, 1L)) ++
          box("trun") {
            val o = new ByteArrayOutputStream()
            be32o(o, 0x1L | 0x200L); be32o(o, na.toLong)
            be32o(o, moofSz + 8L)
            aSizes.foreach(sz => be32o(o, sz.toLong))
            o.toByteArray
          })
      // trafV: + per-sample flags (sync at i%3 == 0 over non-sync trex)
      val trafV = box("traf")(
        box("tfhd")(ints(0x20000L, 2L)) ++
          box("trun") {
            val o = new ByteArrayOutputStream()
            be32o(o, 0x1L | 0x200L | 0x400L); be32o(o, nv.toLong)
            be32o(o, moofSz + 8L + apay)
            vSizes.zipWithIndex.foreach { case (sz, i) =>
              be32o(o, sz.toLong)
              be32o(o, if (i % 3 == 0) 0L else 0x10000L)
            }
            o.toByteArray
          })
      val moof = box("moof")(box("mfhd")(ints(0L, f + 1L)) ++ trafA ++ trafV)
      require(moof.length == moofSz,
        s"fixture moof size drifted: built ${moof.length}, computed $moofSz")
      out.write(moof)
      be32o(out, 8L + apay + vSizes.sum); tag("mdat")
      aSizes.zipWithIndex.foreach { case (sz, i) =>
        var k = 0
        while (k < sz) { out.write((id + 5 * f + 3 * i + k).toInt & 0xff); k += 1 }
      }
      vSizes.zipWithIndex.foreach { case (sz, i) =>
        var k = 0
        while (k < sz) { out.write((id + 11 * f + 7 * i + k).toInt & 0xff); k += 1 }
      }
      fragStart += moofSz + 8 + apay + vSizes.sum
    }
    out.toByteArray
  }

  /** Fixture frame: (idCol, bytes) of [[synthMp4FragMultiTrack]]. */
  def synthMp4FragMultiTrackPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map(r => Row(r.getLong(idIdx), synthMp4FragMultiTrack(r.getLong(idIdx))))
    }(Encoders.row(schema))
  }

  /** Fixture frame: (idCol, bytes) of [[synthMp4Fragmented]] containers. */
  def synthMp4FragmentedPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map(r => Row(r.getLong(idIdx), synthMp4Fragmented(r.getLong(idIdx))))
    }(Encoders.row(schema))
  }

  /** Re-mux dup corpus: every id's container (as [[synthMp4Payload]])
    * plus, for ids divisible by 10, a RE-MUXED twin at
    * `id + MediaDecode.TwinOffset` — same stream tables, different layout
    * and payload bytes ([[synthMp4]] remux=true). The planted collision
    * population for the [[sizeSignature]] exact-dup gate; closed-form so
    * a SQL oracle recomputes every signature from `src = base id`.
    */
  def synthMp4RemuxCorpus(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    import org.apache.spark.sql.functions.col
    val twins = df.filter(col(idCol) % 10 === 0).mapPartitions { rows =>
      rows.map { r =>
        val base = r.getLong(idIdx)
        Row(base + MediaDecode.TwinOffset, synthMp4(base, remux = true))
      }
    }(Encoders.row(schema))
    synthMp4Payload(df, idCol).unionByName(twins)
  }
}
