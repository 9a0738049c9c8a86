package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic mixture-of-Gaussians embedding fixture — synthetic data
  * WITH cluster structure, the property IVF exploits (the reference's
  * published recall rows are on SIFT1M, naturally clustered; the near-
  * uniform testdata embeddings give IVF nothing to prune on, so a recall
  * gate over them is only meaningful at near-full probe).
  *
  * Scale design: rows generate executor-side from a per-row splitmix64
  * stream seeded by `(seed, vec_id)` — the SAME rows for any partitioning
  * or parallelism, no driver materialization (only the k·dim center matrix
  * broadcasts). Cluster assignment is `vec_id % k` (balanced);
  * `sigma` controls overlap: centers are unit Gaussians (pairwise distance
  * ~sqrt(2·dim)), per-dim noise sigma makes within-cluster distance
  * ~sigma·sqrt(2·dim) — sigma≈0.4 gives SIFT-like moderately-overlapping
  * clusters.
  */
object GaussianFixture {

  /** splitmix64 ([[Mix.splitmix64]]): decorrelates sequential ids into
    * independent per-row seeds.
    */
  private def mix64(z0: Long): Long = Mix.splitmix64(z0)

  /** (vec_id long, embedding array&lt;float&gt;) with `n` rows in `k`
    * Gaussian clusters of dimension `dim`.
    */
  def mixtureOfGaussians(
      spark: SparkSession,
      n: Long,
      dim: Int,
      k: Int,
      sigma: Double = 0.4,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    require(k > 0 && dim > 0 && n > 0, s"bad fixture shape n=$n dim=$dim k=$k")
    val crng = new java.util.Random(mix64(seed))
    val centers = Array.fill(k, dim)(crng.nextGaussian().toFloat)
    val bc = spark.sparkContext.broadcast(centers)
    val (d, kk, s) = (dim, k, sigma)
    spark.range(n).map { i =>
      val rng = new java.util.Random(mix64(seed ^ (i * 0x5851f42d4c957f2dL)))
      val ctr = bc.value((i % kk).toInt)
      val v = new Array[Float](d)
      var j = 0
      while (j < d) { v(j) = ctr(j) + (s * rng.nextGaussian()).toFloat; j += 1 }
      (i, v)
    }.toDF("vec_id", "embedding")
  }
}
