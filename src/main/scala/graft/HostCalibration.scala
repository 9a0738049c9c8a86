package graft

/** Deterministic host-speed probe recorded in every bench artifact.
  *
  * The r8→r9 bench "regression" (VERDICT r9 #1) turned out to be
  * host-epoch drift — the physical host got ~2× slower between rounds —
  * and cost two rounds of adjudication plus a worktree control build of
  * byte-identical old code to settle (BENCH_B2B_r10.json). This probe is
  * the cheap replacement for that control build: a seeded, fixed-size
  * CPU + memory workload whose score rides in each bench JSON, so any
  * future cross-round comparison can normalize for epoch drift without
  * re-building old code.
  *
  * Three components, all seeded and allocation-shape-fixed:
  *   - cpu_st_mops: single-thread integer mixing throughput (xorshift64*
  *     over a fixed iteration count) — pure ALU speed.
  *   - cpu_mt_mops: the same kernel on min(32, cores) threads — exposes
  *     noisy-neighbor CPU contention that a single thread hides.
  *   - mem_mops: seeded pseudo-random walk over a 256 MiB long array —
  *     memory-latency bound, the other axis hosts degrade on.
  * Scores are millions of ops per second (higher = faster host). The
  * kernel result is folded into a checksum that is printed, so the JIT
  * cannot dead-code the loops.
  */
object HostCalibration {
  private def mix(x0: Long, iters: Long): Long = {
    var x = x0; var i = 0L
    while (i < iters) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      x *= 0x2545F4914F6CDD1DL
      i += 1
    }
    x
  }

  /** Runs the probe (~4-5 s on the r10 host) and returns a JSON object
    * string, e.g. {"cpu_st_mops":812.3,"cpu_mt_mops":9821.0,...}.
    */
  def runJson(): String = {
    var sink = 0L
    // warm the JIT on the exact kernel before timing
    sink ^= mix(42L, 20_000_000L)

    val stIters = 800_000_000L
    val t0 = System.nanoTime()
    sink ^= mix(7L, stIters)
    val stSec = (System.nanoTime() - t0) / 1e9
    val stMops = stIters / stSec / 1e6

    val threads = math.min(32, Runtime.getRuntime.availableProcessors())
    val mtIters = 400_000_000L // per thread
    val acc = new java.util.concurrent.atomic.AtomicLong()
    val t1 = System.nanoTime()
    val ts = (0 until threads).map { i =>
      val t = new Thread(() => acc.addAndGet(mix(1000L + i, mtIters)))
      t.start(); t
    }
    ts.foreach(_.join())
    val mtSec = (System.nanoTime() - t1) / 1e9
    val mtMops = threads * mtIters / mtSec / 1e6
    sink ^= acc.get()

    // 256 MiB = 32M longs; dependent-chain walk (each index derived from
    // the loaded value) so it measures latency, not prefetched bandwidth
    val n = 32 * 1024 * 1024
    val arr = new Array[Long](n)
    var x = 99L
    var i = 0
    while (i < n) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27; x *= 0x2545F4914F6CDD1DL
      arr(i) = x; i += 1
    }
    val walkIters = 8_000_000L // ~2 s at the r10 host's ~3.8 Mops latency
    val t2 = System.nanoTime()
    var v = arr(0); var j = 0L
    while (j < walkIters) {
      v = arr(java.lang.Long.remainderUnsigned(v, n.toLong).toInt)
      // perturb so cycles of the walk cannot collapse to a cached loop
      v ^= j
      j += 1
    }
    val memSec = (System.nanoTime() - t2) / 1e9
    val memMops = walkIters / memSec / 1e6
    sink ^= v

    System.err.println(
      f"[calib] cpu_st=$stMops%.0f Mops cpu_mt=$mtMops%.0f Mops ($threads thr) " +
        f"mem=$memMops%.1f Mops sink=${sink}%x")
    f"""{"cpu_st_mops":$stMops%.1f,"cpu_mt_mops":$mtMops%.1f,""" +
      f""""mem_mops":$memMops%.2f,"threads":$threads,""" +
      f""""elapsed_s":${stSec + mtSec + memSec}%.2f}"""
  }
}
