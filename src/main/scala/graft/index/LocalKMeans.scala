package graft.index

import breeze.linalg.{DenseMatrix => BDM}

/** Driver-side Lloyd's k-means for quantizer training.
  *
  * The reference trains its quantizers IN MEMORY on a clamped sample —
  * faiss `Clustering` over at most 256 points per centroid
  * (reference index/impl/gamma_index_ivfpq.cc:272-330,
  * index/retrieval_model.h:303); only list assignment / code encoding ever
  * touches the full collection. The Spark port originally used MLlib KMeans
  * here, but a distributed fit is a 15+-job cascade whose scheduling
  * dominates index-build time (the training sample is bounded, so the
  * cluster buys nothing), and at 100 TB the bounded sample STILL fits on
  * the driver — training cost is invariant to table size by design.
  *
  * Deterministic given (sample order, seed): seeded distinct random init
  * (faiss-style random point pick), gemm-based assignment chunked across
  * driver cores, empty clusters repaired by splitting the largest cluster
  * (faiss `split_clusters` policy).
  */
object LocalKMeans {

  /** Train `k` centers on `xs`; returns ≤ k centers (every point its own
    * center when the sample is smaller than k, matching the MLlib behavior
    * downstream code already tolerates — PQ LUTs pad to the max).
    */
  def fit(
      xs: Array[Array[Float]],
      k: Int,
      maxIter: Int = 15,
      seed: Long = 42L,
      tol: Double = 1e-4): Array[Array[Double]] = {
    val n = xs.length
    require(n > 0, "empty k-means sample")
    val d = xs(0).length
    if (n <= k) return xs.map(_.map(_.toDouble))

    // sample matrix n x d (double; all distance math in double like the
    // rest of the oracle-parity kernels)
    val x = BDM.tabulate(n, d)((i, j) => xs(i)(j).toDouble)
    val xNorm = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = 0.0; var j = 0
      while (j < d) { val v = x(i, j); s += v * v; j += 1 }
      xNorm(i) = s; i += 1
    }

    // seeded distinct random init (partial Fisher-Yates over indices)
    val rng = new java.util.Random(seed)
    val perm = Array.tabulate(n)(identity)
    i = 0
    while (i < k) {
      val j = i + rng.nextInt(n - i)
      val t = perm(i); perm(i) = perm(j); perm(j) = t
      i += 1
    }
    val centers = BDM.tabulate(k, d)((c, j) => x(perm(c), j))

    // FIXED chunk size: per-chunk partial sums are reduced in chunk order,
    // so a core-count-derived chunking would change the floating-point
    // accumulation grouping across machines and break the "deterministic
    // given (sample order, seed)" contract for persisted quantizers;
    // parallelism comes from the NUMBER of chunks, not their size
    val chunk = 4096
    val starts = (0 until n by chunk).toArray
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    var prevCost = Double.MaxValue
    var it = 0
    var done = false
    while (it < maxIter && !done) {
      val ct = centers.t // d x k view for the chunk gemm
      val cNorm = new Array[Double](k)
      var c = 0
      while (c < k) {
        var s = 0.0; var j = 0
        while (j < d) { val v = centers(c, j); s += v * v; j += 1 }
        cNorm(c) = s; c += 1
      }
      // per-chunk: scores = X_chunk * C^T; best c minimizes
      // ||x||^2 + ||c||^2 - 2 x·c  (strict-< tie break on centroid order)
      val parts = starts.map { s0 =>
        Future {
          val s1 = math.min(n, s0 + chunk)
          val dots = x(s0 until s1, ::) * ct // (s1-s0) x k
          val sums = BDM.zeros[Double](k, d)
          val counts = new Array[Long](k)
          var cost = 0.0
          var r = 0
          while (r < s1 - s0) {
            var best = 0; var bestD = Double.MaxValue
            var cc = 0
            while (cc < k) {
              val dist = xNorm(s0 + r) + cNorm(cc) - 2.0 * dots(r, cc)
              if (dist < bestD) { bestD = dist; best = cc }
              cc += 1
            }
            cost += math.max(0.0, bestD)
            var j = 0
            while (j < d) { sums(best, j) += x(s0 + r, j); j += 1 }
            counts(best) += 1
            r += 1
          }
          (sums, counts, cost)
        }
      }
      val results = parts.map(Await.result(_, Duration.Inf))
      val sums = BDM.zeros[Double](k, d)
      val counts = new Array[Long](k)
      var cost = 0.0
      results.foreach { case (s, cnt, co) =>
        sums += s
        var c2 = 0
        while (c2 < k) { counts(c2) += cnt(c2); c2 += 1 }
        cost += co
      }
      var b = 0
      while (b < k) {
        if (counts(b) > 0) {
          var j = 0
          while (j < d) { centers(b, j) = sums(b, j) / counts(b); j += 1 }
        }
        b += 1
      }
      // faiss-style empty-cluster repair: split the currently-largest
      // cluster with a tiny symmetric perturbation; the next iteration
      // separates the twins. Deterministic (argmax tie broken by index).
      b = 0
      while (b < k) {
        if (counts(b) == 0L) {
          var big = 0; var bigN = -1L; var c2 = 0
          while (c2 < k) { if (counts(c2) > bigN) { bigN = counts(c2); big = c2 }; c2 += 1 }
          var j = 0
          while (j < d) {
            val v = centers(big, j)
            centers(b, j) = v * (1.0 + 1e-7) + 1e-12
            centers(big, j) = v * (1.0 - 1e-7)
            j += 1
          }
          counts(b) = counts(big) / 2
          counts(big) -= counts(b)
        }
        b += 1
      }
      if (prevCost.isInfinite || prevCost == Double.MaxValue) prevCost = cost
      else {
        val rel = (prevCost - cost) / math.max(prevCost, Double.MinPositiveValue)
        if (rel < tol) done = true
        prevCost = cost
      }
      it += 1
    }
    Array.tabulate(k)(c => Array.tabulate(d)(j => centers(c, j)))
  }

  /** Collect a bounded training sample of a vector column to the driver —
    * the port's analog of faiss's sampled `train()` input. `limit` bounds
    * the read; the scan stops after `cap` rows (no full-table pass).
    */
  def sampleVecs(
      docs: org.apache.spark.sql.DataFrame, vecCol: String, cap: Int): Array[Array[Float]] =
    docs.select(org.apache.spark.sql.functions.col(vecCol)).limit(cap)
      .collect().map(_.getSeq[Float](0).toArray)
}
