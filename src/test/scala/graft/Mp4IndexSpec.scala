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
}
