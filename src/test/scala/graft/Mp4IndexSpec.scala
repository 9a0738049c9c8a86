package graft

import java.io.ByteArrayOutputStream

import graft.media.Mp4Index

/** ISO-BMFF sample-table indexing: the stsz/stsc/stco|co64/stts walk that
  * turns an opaque MP4 into per-sample byte ranges + timestamps.
  */
class Mp4IndexSpec extends GraftSuite {
  import spark.implicits._

  test("sample table matches the fixture's closed form (stco/co64, multi-run stsc, stss, ctts v0/v1)") {
    for (id <- 0L until 30L) { // even ids: stco; odd: co64
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
        assert(l.dts === i * delta, s"id=$id i=$i")
        // ctts: absent (pts = dts) for id%5 == 0; else v1 signed
        // (i%3 - 1)*delta on odd ids, v0 unsigned (i%3)*delta on even
        val ctOff =
          if (id % 5 == 0) 0L
          else if (id % 2 == 1) ((i % 3) - 1).toLong * delta
          else (i % 3).toLong * delta
        assert(l.pts === i * delta + ctOff, s"id=$id i=$i")
        // stss: absent (all sync) for id%3 == 0; else sync iff i%3 == 0
        assert(l.isSync === (id % 3 == 0 || i % 3 == 0), s"id=$id i=$i")
        off += sizes(i)
      }
      // the byte ranges really address the mdat payload the fixture wrote
      val bytes = Mp4Index.synthMp4(id)
      val first = locs.head
      assert((bytes(first.offset.toInt) & 0xff) === ((id + 0) & 0xff).toInt)
      // the re-mux carries the SAME tables at shifted offsets: sizes,
      // timing and sync flags identical, every chunk offset +16
      val rm = Mp4Index.parseSampleTable(Mp4Index.synthMp4(id, remux = true))
      assert(rm.map(l => (l.sampleIdx, l.size, l.dts, l.pts, l.isSync)) ===
        locs.map(l => (l.sampleIdx, l.size, l.dts, l.pts, l.isSync)), s"id=$id")
      assert(rm.map(_.offset) === locs.map(_.offset + 16), s"id=$id")
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
    // no ctts -> pts = dts; no stss -> every sample sync
    assert(locs.map(l => (l.sampleIdx, l.chunkIdx, l.offset, l.size, l.pts)) ===
      Seq((0, 0, 24L, 20L, 0L), (1, 0, 44L, 20L, 10L),
        (2, 1, 64L, 20L, 20L), (3, 1, 84L, 20L, 30L)))
    assert(locs.forall(l => l.pts == l.dts && l.isSync))
  }

  // shared minimal-container builder for the table-variant tests below
  private def handBuilt(stblExtra: Array[Byte],
      sttsRuns: Seq[Long] = Seq(4, 10)): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    be32(16); tag("ftyp"); tag("isom"); be32(0)
    be32(8 + 80); tag("mdat"); (0 until 80).foreach(out.write)
    val stbl = box("stbl")(
      box("stsz")(ints(0, 20, 4)) ++
        box("stsc")(ints(0, 1, 1, 2, 1)) ++
        box("stco")(ints(0, 2, 24, 64)) ++
        box("stts")(ints((0L +: (sttsRuns.length / 2).toLong +: sttsRuns): _*)) ++
        stblExtra)
    out.write(box("moov")(box("trak")(box("mdia")(box("minf")(stbl)))))
    out.toByteArray
  }
  private def box(name: String)(body: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    val sz = 8 + body.length
    o.write((sz >> 24) & 0xff); o.write((sz >> 16) & 0xff)
    o.write((sz >> 8) & 0xff); o.write(sz & 0xff)
    o.write(name.getBytes("US-ASCII")); o.write(body)
    o.toByteArray
  }
  private def ints(vs: Long*): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    vs.foreach { x =>
      o.write(((x >> 24) & 0xff).toInt); o.write(((x >> 16) & 0xff).toInt)
      o.write(((x >> 8) & 0xff).toInt); o.write((x & 0xff).toInt)
    }
    o.toByteArray
  }

  test("zero-count stts/ctts runs are skipped; exhaustion fails precisely, never AIOOBE") {
    // stts runs: (0, 99) zero-count, (4, 10) real — the zero run must be
    // walked over without stalling or spending a sample
    val zeroRun = handBuilt(Array.empty, sttsRuns = Seq(0, 99, 4, 10))
    assert(Mp4Index.parseSampleTable(zeroRun).map(_.dts) === Seq(0L, 10L, 20L, 30L))
    // stts covering only 3 of 4 samples: the old walk indexed past the
    // runs array (raw ArrayIndexOutOfBounds); must be the precise error
    val short = handBuilt(Array.empty, sttsRuns = Seq(3, 10))
    val e = intercept[IllegalArgumentException](Mp4Index.parseSampleTable(short))
    assert(e.getMessage.contains("stts does not cover"))
    // same for a short ctts
    val shortCt = handBuilt(box("ctts")(ints(0, 1, 2, 5)))
    val e2 = intercept[IllegalArgumentException](Mp4Index.parseSampleTable(shortCt))
    assert(e2.getMessage.contains("ctts does not cover"))
  }

  test("stss out of range and unsupported ctts version are refused") {
    val badSync = handBuilt(box("stss")(ints(0, 1, 9))) // sample 9 of 4
    val e = intercept[IllegalArgumentException](Mp4Index.parseSampleTable(badSync))
    assert(e.getMessage.contains("stss"))
    val badVer = handBuilt(box("ctts")(ints(2L << 24, 1, 4, 5)))
    val e2 = intercept[IllegalArgumentException](Mp4Index.parseSampleTable(badVer))
    assert(e2.getMessage.contains("ctts version"))
  }

  test("keyframeIndex: per tick, the sync sample with smallest pts >= tick (closed form)") {
    val ids = (0L until 40L).toDF("doc_id")
    val kf = Mp4Index.keyframeIndex(
      Mp4Index.synthMp4Payload(ids, "doc_id"), "doc_id", "bytes", everyPts = 150L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getLong(3))).toMap
    // reference: recompute from the fixture closed form per doc
    for (id <- 0L until 40L) {
      val n = (6 + id % 5).toInt
      val delta = 100 + id % 50
      def ctOff(i: Int): Long =
        if (id % 5 == 0) 0L
        else if (id % 2 == 1) ((i % 3) - 1).toLong * delta
        else (i % 3).toLong * delta
      val sync = (0 until n).filter(i => id % 3 == 0 || i % 3 == 0)
        .map(i => (i * delta + ctOff(i), i)).sorted
      for (tick <- 0L until (n * delta) by 150L) {
        val want = sync.find(_._1 >= tick)
        val got = kf.get((id, tick))
        assert(got === want.map { case (p, i) => (i, p) }, s"id=$id tick=$tick")
      }
      // no ticks beyond the duration leaked out
      assert(!kf.keys.exists { case (d, t) => d == id && t >= n * delta })
    }
    // the plan is executor-local — no Exchange
    val plan = Mp4Index.keyframeIndex(
      Mp4Index.synthMp4Payload(ids, "doc_id"), "doc_id", "bytes", 150L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"keyframe index shuffled:\n$plan")
  }

  test("sizeSignature: re-muxes collide, distinct streams don't, md5 matches the closed form") {
    val ids = (0L until 50L).toDF("doc_id")
    val sigs = Mp4Index.sizeSignature(
      Mp4Index.synthMp4RemuxCorpus(ids, "doc_id"), "doc_id", "bytes")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(sigs.size === 55) // 50 bases + 5 remux twins
    for (base <- 0L until 50L by 10L) {
      assert(sigs(base) === sigs(base + graft.media.MediaDecode.TwinOffset),
        s"remux twin of $base did not collide")
    }
    // closed-form md5 of the size CSV (the oracle's arithmetic)
    val id = 7L
    val n = (6 + id % 5).toInt
    val csv = (0 until n).map(i => 10 + (17 * id + 31 * i) % 90).mkString(",")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(csv.getBytes("US-ASCII")).map(b => f"${b & 0xff}%02x").mkString
    assert(sigs(id)._2 === hex)
    assert(sigs(0L)._2 !== sigs(1L)._2)
    // ids congruent mod 90 share the whole size sequence (17 is a unit
    // mod 90 and 90 % 5 == 0): real mass dup-groups, not just twins
    val far = Mp4Index.sizeSignature(
      Mp4Index.synthMp4Payload(Seq(3L, 93L, 183L, 4L).toDF("doc_id"), "doc_id"),
      "doc_id", "bytes").collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(far(3L) === far(93L) && far(93L) === far(183L))
    assert(far(3L) !== far(4L))
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

  test("trackInfo: stsd codec metadata matches the closed form; unknown codec is kind=other") {
    for (id <- 0L until 24L) {
      val ti = Mp4Index.parseTrackInfo(Mp4Index.synthMp4(id))
      assert(ti.timescale === 600L, s"id=$id")
      if (id % 3 == 2) {
        assert(ti.codec === "mp4a" && ti.kind === "audio", s"id=$id")
        assert(ti.channels === 1 + (id % 2).toInt, s"id=$id")
        assert(ti.sampleRate === 16000 + 1000 * (id % 8).toInt, s"id=$id")
        assert(ti.width === 0 && ti.height === 0, s"id=$id")
      } else {
        assert(ti.codec === (if (id % 3 == 0) "avc1" else "hvc1"), s"id=$id")
        assert(ti.kind === "video", s"id=$id")
        assert(ti.width === (if (id % 3 == 0) 320 else 640) + 16 * (id % 8).toInt, s"id=$id")
        assert(ti.height === (if (id % 3 == 0) 240 else 360) + 16 * (id % 5).toInt, s"id=$id")
        assert(ti.channels === 0 && ti.sampleRate === 0, s"id=$id")
      }
    }
    // an unregistered codec fourcc degrades to kind=other with zeroed
    // fields — a 100 TB metadata scan must not die on one exotic file
    val b = Mp4Index.synthMp4(0L) // avc1
    val at = (b.length - 4 to 0 by -1).find(i =>
      new String(b.slice(i, i + 4), "US-ASCII") == "avc1").get
    val patched = b.clone()
    "zzz1".getBytes("US-ASCII").copyToArray(patched, at)
    val ti = Mp4Index.parseTrackInfo(patched)
    assert(ti === Mp4Index.TrackInfo("zzz1", "other", 0, 0, 0, 0, 600L))
    // the sample walk is UNAFFECTED by the stsd patch
    assert(Mp4Index.parseSampleTable(patched).size ===
      Mp4Index.parseSampleTable(b).size)
  }

  test("fragmented MP4 (moof/traf/trun) matches the fixture's closed form") {
    // ids 0..209 cover every (id%2, id%3, id%5, id%7) class jointly:
    // tfhd base modes, tfdt presence+version, per-sample vs first-sample
    // flags, ctts v0/v1/absent
    for (id <- 0L until 210L) {
      val bytes = Mp4Index.synthMp4Fragmented(id)
      val locs = Mp4Index.parseSampleTable(bytes)
      val delta = 100 + id % 50
      val nFrags = (2 + id % 3).toInt
      val nf = Array.tabulate(nFrags)(f => (3 + (id + f) % 4).toInt)
      assert(locs.size === nf.sum, s"id=$id")
      var g = 0 // global sample index
      var fragStart = 228L
      for (f <- 0 until nFrags) {
        val n = nf(f)
        val sizes = Array.tabulate(n)(i => (10 + (17 * id + 29 * f + 31 * i) % 90).toLong)
        val perS = 4 + (if (id % 3 != 0) 4 else 0) + (if (id % 5 != 0) 4 else 0)
        val moofSz = 24 + 8 + (if (id % 2 == 0) 24 else 16) +
          (if (id % 7 == 0) 0 else if (id % 2 == 1) 20 else 16) +
          (8 + 12 + (if (id % 3 == 0) 4 else 0) + n * perS)
        var off = fragStart + moofSz + 8
        val cumBefore = nf.take(f).sum.toLong
        for (i <- 0 until n) {
          val l = locs(g)
          assert(l.sampleIdx === g, s"id=$id f=$f i=$i")
          assert(l.chunkIdx === f, s"id=$id f=$f i=$i")
          assert(l.size === sizes(i), s"id=$id f=$f i=$i")
          assert(l.offset === off, s"id=$id f=$f i=$i")
          val dts =
            if (id % 7 == 0) (cumBefore + i) * delta // no tfdt: continuous
            else cumBefore * delta + f * 1000L + i * delta // tfdt gap honored
          assert(l.dts === dts, s"id=$id f=$f i=$i")
          val ct =
            if (id % 5 == 0) 0L
            else if (id % 2 == 1) ((i % 3) - 1).toLong * delta
            else (i % 3).toLong * delta
          assert(l.pts === dts + ct, s"id=$id f=$f i=$i")
          val sync = if (id % 3 == 0) i == 0 else i % 3 == 0
          assert(l.isSync === sync, s"id=$id f=$f i=$i")
          // the range really addresses the fixture's mdat payload bytes
          assert((bytes(l.offset.toInt) & 0xff) === ((id + 11 * f + 7 * i) & 0xff).toInt,
            s"id=$id f=$f i=$i")
          off += sizes(i)
          g += 1
        }
        fragStart += moofSz + 8 + sizes.sum
      }
    }
  }

  test("fragmented MP4 without trex or with a bad later traf is refused precisely") {
    val good = Mp4Index.synthMp4Fragmented(3L)
    // strip mvex: rewrite its fourcc so trex resolution fails
    val noTrex = good.clone()
    val mvexAt = (0 until good.length - 4).find(i =>
      new String(good.slice(i, i + 4), "US-ASCII") == "mvex").get
    noTrex(mvexAt) = 'f'.toByte // "fvex" — unknown box, skipped
    val e = intercept[IllegalArgumentException](Mp4Index.parseSampleTable(noTrex))
    assert(e.getMessage.contains("mvex"))
    // a truncated final fragment fails loudly, not with a silent short read
    intercept[IllegalArgumentException](
      Mp4Index.parseSampleTable(good.take(good.length - 4)))
  }

  test("keyframeIndex rides the fragmented walk: sync-sample seek over fMP4") {
    // id=4: id%3=1 -> per-sample flags, sync every 3rd; id%7=4 -> tfdt
    // gaps present; ticks target pts, so the gap shifts which sync wins
    val df = Mp4Index.synthMp4FragmentedPayload(Seq(4L).toDF("doc_id"), "doc_id")
    val rows = Mp4Index.keyframeIndex(df, "doc_id", "bytes", everyPts = 400L)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).sortBy(_._1)
    assert(rows.nonEmpty)
    // every returned sample is sync and its pts >= its tick, minimal
    val locs = Mp4Index.parseSampleTable(Mp4Index.synthMp4Fragmented(4L))
    val sync = locs.filter(_.isSync).map(l => (l.pts, l.sampleIdx)).sorted
    rows.foreach { case (tick, sIdx, pts) =>
      val expect = sync.find(_._1 >= tick).get
      assert((pts, sIdx) === expect, s"tick=$tick")
    }
  }

  test("multi-track: video-first selection skips the audio trak muxed first") {
    for (id <- 0L until 30L) {
      val multi = Mp4Index.synthMp4MultiTrack(id)
      val single = Mp4Index.parseSampleTable(Mp4Index.synthMp4(id))
      val na = (4 + id % 3).toInt
      val aPay = (0 until na).map(i => 8 + (13 * id + 7 * i) % 40).sum
      // the selected track is the VIDEO trak: synthMp4's exact tables,
      // every offset shifted past the audio payload sharing the mdat
      val sel = Mp4Index.parseSampleTable(multi)
      assert(sel.map(l => (l.sampleIdx, l.chunkIdx, l.size, l.dts, l.pts, l.isSync)) ===
        single.map(l => (l.sampleIdx, l.chunkIdx, l.size, l.dts, l.pts, l.isSync)), s"id=$id")
      assert(sel.map(_.offset) === single.map(_.offset + aPay), s"id=$id")
      // trackInfo selects the video stream too — audio-first mux must not
      // make the codec pass report mp4a
      val ti = Mp4Index.parseTrackInfo(multi)
      assert(ti.kind === "video", s"id=$id")
      assert(ti.codec === (if (id % 2 == 0) "avc1" else "hvc1"), s"id=$id")
      assert(ti.width === 320 + 16 * (id % 8).toInt, s"id=$id")
      assert(ti.timescale === 600L, s"id=$id")
    }
  }

  test("trackSampleIndex: every track's samples with track_id/handler (closed form)") {
    val ids = (0L until 20L).toDF("doc_id")
    val df = Mp4Index.synthMp4MultiTrackPayload(ids, "doc_id")
    val rows = Mp4Index.trackSampleIndex(df, "doc_id", "bytes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getBoolean(9)))
    for (id <- 0L until 20L) {
      val na = (4 + id % 3).toInt
      val aSizes = Array.tabulate(na)(i => (8 + (13 * id + 7 * i) % 40).toLong)
      val audio = rows.filter(r => r._1 == id && r._2 == 1L).sortBy(_._4)
      assert(audio.length === na, s"id=$id")
      var off = 32L
      audio.zipWithIndex.foreach { case (r, i) =>
        assert(r._3 === "soun")
        assert(r._5 === i / 2, s"id=$id i=$i")       // chunks of 2
        assert(r._6 === off, s"id=$id i=$i")
        assert(r._7 === aSizes(i), s"id=$id i=$i")
        assert(r._8 === i * 1024L, s"id=$id i=$i")   // dts
        assert(r._9 === i * 1024L, s"id=$id i=$i")   // pts (no ctts)
        assert(r._10, s"id=$id i=$i")                // audio all sync
        off += aSizes(i)
      }
      val video = rows.filter(r => r._1 == id && r._2 == 2L).sortBy(_._4)
      val expect = Mp4Index.parseSampleTable(Mp4Index.synthMp4MultiTrack(id))
      assert(video.map(r => (r._4, r._6, r._7, r._8, r._9, r._10)).toSeq ===
        expect.map(l => (l.sampleIdx, l.offset, l.size, l.dts, l.pts, l.isSync)),
        s"id=$id")
      assert(video.forall(_._3 == "vide"), s"id=$id")
    }
  }

  test("trackInfoAll: one codec row per track") {
    val df = Mp4Index.synthMp4MultiTrackPayload(Seq(3L, 4L).toDF("doc_id"), "doc_id")
    val rows = Mp4Index.trackInfoAll(df, "doc_id", "bytes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getInt(7), r.getInt(8), r.getLong(9))).sortBy(r => (r._1, r._2))
    assert(rows.length === 4)
    // track 1 = mp4a audio at 48 kHz; track 2 = video by id parity
    assert(rows(0) === ((3L, 1L, "soun", "mp4a", "audio", 2, 48000, 48000L)))
    assert(rows(1)._4 === "hvc1"); assert(rows(1)._5 === "video")
    assert(rows(2) === ((4L, 1L, "soun", "mp4a", "audio", 1, 48000, 48000L)))
    assert(rows(3)._4 === "avc1"); assert(rows(3)._8 === 600L)
  }

  test("fragmented multi-track: per-track trex defaults and traf filtering (closed form)") {
    for (id <- 0L until 20L) {
      val b = Mp4Index.synthMp4FragMultiTrack(id)
      val tracks = Mp4Index.walkAllTracks(b)
      assert(tracks.map(_._1.trackId) === Vector(1L, 2L), s"id=$id")
      val nFrags = (2 + id % 3).toInt
      val vDelta = 100 + id % 50
      // replay the fixture's closed form fragment by fragment
      var fragStart = 638L
      var aDts = 0L
      var vDts = 0L
      var aIdx = 0
      var vIdx = 0
      val expA = Vector.newBuilder[(Int, Int, Long, Long, Long, Boolean)]
      val expV = Vector.newBuilder[(Int, Int, Long, Long, Long, Boolean)]
      for (f <- 0 until nFrags) {
        val na = (2 + (id + f) % 3).toInt
        val aSizes = Array.tabulate(na)(i => (8 + (11 * id + 5 * f + 7 * i) % 30).toLong)
        val nv = (3 + (id + f) % 4).toInt
        val vSizes = Array.tabulate(nv)(i => (10 + (17 * id + 29 * f + 31 * i) % 90).toLong)
        val moofSz = 112 + 4 * na + 8 * nv
        val dataStart = fragStart + moofSz + 8
        var off = dataStart
        for (i <- 0 until na) {
          expA += ((aIdx, f, off, aSizes(i), aDts, true))
          off += aSizes(i); aDts += 512L; aIdx += 1
        }
        for (i <- 0 until nv) {
          expV += ((vIdx, f, off, vSizes(i), vDts, i % 3 == 0))
          off += vSizes(i); vDts += vDelta; vIdx += 1
        }
        fragStart = off
      }
      def got(t: (Mp4Index.TrakMeta, Seq[Mp4Index.SampleLoc], Long)) =
        t._2.map(l => (l.sampleIdx, l.chunkIdx, l.offset, l.size, l.dts, l.isSync)).toVector
      assert(got(tracks(0)) === expA.result(), s"id=$id audio")
      assert(got(tracks(1)) === expV.result(), s"id=$id video")
      // pts = dts throughout (no trun composition offsets here)
      assert(tracks.flatMap(_._2).forall(l => l.pts == l.dts), s"id=$id")
      // the single-track surface selects the VIDEO stream
      assert(Mp4Index.parseSampleTable(b).map(_.size) ===
        expV.result().map(_._4), s"id=$id")
      // track durations: per-track dts end
      assert(tracks(0)._3 === aDts, s"id=$id")
      assert(tracks(1)._3 === vDts, s"id=$id")
    }
  }

  test("edit lists: presentation shift + end-trim honored by keyframeIndex (closed form)") {
    def shiftOf(id: Long): Long = {
      val delta = 100 + id % 50
      if (id % 3 == 0) delta
      else if (id % 3 == 1) delta - 2 * (7 + id % 5)
      else 0L
    }
    // id%3==0 carries an end-trimming segment_duration: presentation cap
    // 2*floor((n-2)*delta/2), strictly below the (n-1)*delta end. Shape
    // id%3==1 writes a FULL-LENGTH segment_duration — its cap
    // 2*floor(n*delta/2) is real but never binds (the shift alone ends
    // presentation earlier); no edts -> no cap at all.
    def capOf(id: Long): Long = {
      val delta = 100 + id % 50
      val n = 6 + id % 5
      if (id % 3 == 0) 2 * ((n - 2) * delta / 2)
      else if (id % 3 == 1) 2 * (n * delta / 2)
      else Long.MaxValue
    }
    for (id <- 0L until 30L) {
      val b = Mp4Index.synthMp4(id, edits = true)
      // the edit list changes only moov metadata — tables and offsets are
      // byte-identical to the plain fixture (mdat precedes moov)
      assert(Mp4Index.parseSampleTable(b) ===
        Mp4Index.parseSampleTable(Mp4Index.synthMp4(id)), s"id=$id")
      val (moov, traks) = Mp4Index.parseTraks(b)
      assert(Mp4Index.parseEdit(b, moov, traks.head) ===
        ((shiftOf(id), capOf(id))), s"id=$id")
    }
    val df = Mp4Index.synthMp4EditedPayload((0L until 30L).toDF("doc_id"), "doc_id")
    val rows = Mp4Index.keyframeIndex(df, "doc_id", "bytes", everyPts = 150L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    for (id <- 0L until 30L) {
      val delta = 100 + id % 50
      val n = 6 + id % 5
      val shift = shiftOf(id)
      val sync = Mp4Index.parseSampleTable(Mp4Index.synthMp4(id, edits = true))
        .filter(_.isSync).map(l => (l.pts, l.sampleIdx)).sorted
      val got = rows.filter(_._1 == id).sortBy(_._2)
      // ticks cover the PRESENTATION range [0, min(n*delta - shift, cap));
      // each seeks the first sync sample at presentation time >= tick,
      // i.e. pts >= tick + shift
      val end = (n * delta - shift).min(capOf(id))
      assert(id % 3 != 0 || end < n * delta - shift, s"id=$id trim observable")
      val expTicks = Iterator.range(0L, end, 150L)
        .filter(t => sync.exists(_._1 >= t + shift)).toSeq
      assert(got.map(_._2).toSeq === expTicks, s"id=$id")
      got.foreach { case (_, tick, sIdx, pts) =>
        val e = sync.find(_._1 >= tick + shift).get
        assert((pts, sIdx) === e, s"id=$id tick=$tick")
      }
    }
  }

  test("malformed/unrepresentable edit lists are refused precisely") {
    def box(name: String)(body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      def be32(v: Long): Unit = {
        o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
        o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
      }
      be32(8L + body.length); o.write(name.getBytes("US-ASCII")); o.write(body)
      o.toByteArray
    }
    def ints(vs: Long*): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      vs.foreach { v =>
        o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
        o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
      }
      o.toByteArray
    }
    def container(edtsBody: Array[Byte]): Array[Byte] =
      box("moov")(box("mvhd")(ints(0L, 0L, 0L, 300L, 0L)) ++
        box("trak")(box("edts")(edtsBody) ++
          box("mdia")(box("mdhd")(ints(0L, 0L, 0L, 600L, 0L)) ++
            box("minf")(box("stbl")(Array.empty[Byte])))))
    def shiftOf(edtsBody: Array[Byte]): Long = {
      val b = container(edtsBody)
      val (moov, traks) = Mp4Index.parseTraks(b)
      Mp4Index.parseEditShift(b, moov, traks.head)
    }
    def refuse(edtsBody: Array[Byte], msg: String): Unit = {
      val e = intercept[IllegalArgumentException](shiftOf(edtsBody))
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    // the representable forms parse (sanity for the helpers)
    assert(shiftOf(box("elst")(ints(0L, 1L, 0L, 40L, 0x10000L))) === 40L)
    assert(shiftOf(box("elst")(ints(0L, 2L, 9L, 0xffffffffL, 0x10000L,
      0L, 40L, 0x10000L))) === 40L - 9 * 600 / 300)
    refuse(Array.empty, "edts without elst")
    refuse(box("elst")(ints(0L, 0L)), "zero entries")
    refuse(box("elst")(ints(0L, 1L, 0L, 40L, 0x20000L)), "media_rate")
    refuse(box("elst")(ints(0L, 3L, 0L, 40L, 0x10000L, 0L, 40L, 0x10000L,
      0L, 40L, 0x10000L)), "multi-segment")
    refuse(box("elst")(ints(0L, 1L, 0L, 0xffffffffL, 0x10000L)),
      "single entry is an empty edit")
    refuse(box("elst")(ints(0L, 2L, 0L, 40L, 0x10000L, 0L, 40L, 0x10000L)),
      "must be [empty edit, normal edit]")
    refuse(box("elst")(ints(0L, 2L, 9L, 0xffffffffL, 0x10000L,
      0L, 0xffffffffL, 0x10000L)), "second entry is an empty edit too")
    refuse(box("elst")(ints(2L << 24, 1L, 0L, 40L, 0x10000L)),
      "elst version 2 unsupported")
  }

  test("clipPairs: planted cuts found at their position; brute-force parity; no all-pairs plan") {
    import org.apache.spark.sql.functions.col
    val ids = (0L until 60L).toDF("doc_id")
    val corpus = Mp4Index.synthMp4EntropyPayload(ids, "doc_id")
    val clips = Mp4Index.synthMp4ClipPayload(ids, "doc_id")
    val out = Mp4Index.clipPairs(clips, corpus, "doc_id", "bytes", minLen = 4)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force oracle over the same sequences
    def baseSizes(id: Long): Array[Long] =
      Array.tabulate((6 + id % 5).toInt)(i => Mp4Index.entropySize(id, i))
    def clipSizes(id: Long): Array[Long] =
      Array.tabulate((4 + id % 2).toInt)(j => Mp4Index.entropySize(id, 1 + j))
    val expect = (for {
      cid <- 0L until 60L if cid % 7 == 0
      c = clipSizes(cid)
      tid <- 0L until 60L
      t = baseSizes(tid)
      pos <- 0 to t.length - c.length
      if t.slice(pos, pos + c.length).sameElements(c)
    } yield (cid + graft.media.MediaDecode.TwinOffset, tid, pos)).toSet
    assert(got === expect)
    // every planted cut maps back to position 1 of its source
    (0L until 60L).filter(_ % 7 == 0).foreach { id =>
      assert(got.contains((id + graft.media.MediaDecode.TwinOffset, id, 1)), s"id=$id")
    }
    // a clip shorter than minLen cannot anchor a shingle: skipped, not fatal
    assert(Mp4Index.clipPairs(clips, corpus, "doc_id", "bytes", minLen = 6)
      .count() === 0L)
    // the candidate stage is a shingle equi-join — never all-pairs
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("fragmented multi-track without a trex for a track is refused precisely") {
    val b = Mp4Index.synthMp4FragMultiTrack(1L)
    // retarget the SECOND trex (track 2) at track 3: scan for the trex
    // fourcc and overwrite its track_ID field
    val idxs = (0 until b.length - 4).filter(o =>
      b(o) == 't' && b(o + 1) == 'r' && b(o + 2) == 'e' && b(o + 3) == 'x')
    assert(idxs.length === 2)
    val bad = b.clone()
    bad(idxs(1) + 4 + 4 + 3) = 3 // payload: verflags(4) then track_ID
    val e = intercept[IllegalArgumentException](Mp4Index.walkAllTracks(bad))
    assert(e.getMessage.contains("without a trex for track 2"))
  }
}
