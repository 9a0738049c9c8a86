package graft.index

/** Optimized Product Quantization (Ge et al., CVPR'13 — the OPQ transform
  * the reference offers in front of IVFPQ via faiss, e.g. the OPQ variants
  * of its E2E matrix, reference tests/test_files.cc): learn an orthonormal
  * rotation R that minimizes PQ reconstruction error, by alternating
  *
  *   1. PQ-encode the rotated sample (per-subspace k-means + nearest code)
  *   2. orthogonal-procrustes solve  R = U V^T  from  Yhat X^T = U S V^T
  *
  * R is orthonormal, so L2 distances are EXACTLY preserved — coarse
  * quantization and exact re-rank are unaffected; only the PQ codes get a
  * friendlier coordinate system. Training runs driver-side on a bounded
  * sample (the same clamp spirit as the reference's faiss training).
  */
object Opq {

  /** Train the d x d rotation. `sample` rows are the training vectors
    * (already residuals or raw — caller's choice), `m` subspaces, `ksub`
    * codebook entries per subspace.
    */
  def trainRotation(
      sample: Array[Array[Double]],
      m: Int,
      ksub: Int,
      iters: Int = 5,
      seed: Long = 42L): Array[Array[Double]] = {
    import breeze.linalg.{svd, DenseMatrix => BDM}
    val n = sample.length
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by $m")
    val dsub = d / m
    val k = math.min(ksub, math.max(2, n))

    // X: d x n (column-major samples)
    val x = BDM.tabulate(d, n)((i, j) => sample(j)(i))
    var r = BDM.eye[Double](d)

    var it = 0
    while (it < iters) {
      val y = r * x // rotated sample, d x n
      // PQ in rotated space: per-subspace local k-means, then reconstruct
      val yhat = BDM.zeros[Double](d, n)
      var j = 0
      while (j < m) {
        val rows = j * dsub until (j + 1) * dsub
        val sub = Array.tabulate(n)(c => Array.tabulate(dsub)(i => y(j * dsub + i, c)))
        val centers = localKmeans(sub, k, 4, seed + it * 31 + j)
        var c = 0
        while (c < n) {
          val code = nearest(centers, sub(c))
          var i = 0
          while (i < dsub) { yhat(j * dsub + i, c) = centers(code)(i); i += 1 }
          c += 1
        }
        j += 1
      }
      // procrustes: min_R ||R X - Yhat||_F -> R = U V^T of Yhat X^T
      val s = svd(yhat * x.t)
      r = s.U * s.Vt
      it += 1
    }
    Array.tabulate(d)(i => Array.tabulate(d)(j => r(i, j)))
  }

  /** Plain Lloyd k-means on a small driver-side sample. */
  private[index] def localKmeans(
      xs: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    val d = xs.head.length
    val rng = new scala.util.Random(seed)
    val centers = Array.tabulate(k)(i => xs(rng.nextInt(xs.length)).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      var c = 0
      while (c < xs.length) {
        val b = nearest(centers, xs(c))
        var i = 0
        while (i < d) { sums(b)(i) += xs(c)(i); i += 1 }
        counts(b) += 1
        c += 1
      }
      var b = 0
      while (b < k) {
        if (counts(b) > 0) {
          var i = 0
          while (i < d) { centers(b)(i) = sums(b)(i) / counts(b); i += 1 }
        } else centers(b) = xs(rng.nextInt(xs.length)).clone() // re-seed empty
        b += 1
      }
      it += 1
    }
    centers
  }

  private[index] def nearest(centers: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < centers.length) {
      var s = 0.0; var i = 0
      val cc = centers(c)
      while (i < v.length) { val t = v(i) - cc(i); s += t * t; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** Rotate a float vector: R v (R is d x d). */
  def rotate(r: Array[Array[Double]], v: Array[Float]): Array[Float] = {
    val d = r.length
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      var s = 0.0; var j = 0
      val ri = r(i)
      while (j < d) { s += ri(j) * v(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }
}
