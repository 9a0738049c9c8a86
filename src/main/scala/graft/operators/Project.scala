package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss sign random projection — embedding compression
  * for at-rest storage and cheaper downstream ANN/LSH (Achlioptas,
  * "Database-friendly random projections": a ±1 sign matrix preserves
  * pairwise distances in expectation like a Gaussian one). Complements
  * the trained reductions already in the engine (OPQ rotation,
  * index/Opq.scala; INT8 quantization, functions/Quant.scala) with the
  * data-independent variant a pipeline can apply before any model
  * exists.
  *
  * out[j] = round( (Σ_i v[i]·s(i,j)) / sqrt(dOut), 6 )
  *
  * The sign matrix is DERIVED, not sampled: s(i,j) = +1 iff the first
  * 32 md5 bits of "i_j" are even. md5 is the one hash this repo's
  * oracle conventions already rely on both engines computing
  * identically, so projection output is exactly reproducible in DuckDB
  * (and in any later re-run — there is no RNG state to persist).
  *
  * Scale design: a pure per-row projection — no shuffle, no driver
  * state, the dIn×dOut sign matrix is a few KB of literals folded into
  * codegen. The element fold runs in fixed index order, matching the
  * oracle's sequential list_sum.
  */
object Project {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The deterministic ±1 sign for input dim `i` (0-based), output dim
    * `j` (0-based) — shared contract with the SQL oracle.
    */
  def sign(i: Int, j: Int): Double =
    if (java.lang.Long.parseLong(md5hex(s"${i}_$j").substring(0, 8), 16) % 2 == 0)
      1.0
    else -1.0

  /** Project `vecCol` (length dIn) to a dOut-dim array<double> named
    * `proj`, keeping `idCol`.
    */
  def signProject(
      df: DataFrame, idCol: String, vecCol: String,
      dIn: Int, dOut: Int): DataFrame = {
    require(dIn > 0 && dOut > 0, s"need positive dims (got $dIn -> $dOut)")
    val scale = math.sqrt(dOut.toDouble)
    val cols = (0 until dOut).map { j =>
      val sj = array((0 until dIn).map(i => lit(sign(i, j))): _*)
      round(
        aggregate(
          zip_with(col(vecCol), sj, (a, b) => a.cast("double") * b),
          lit(0.0), (acc, x) => acc + x) / lit(scale),
        6)
    }
    df.select(col(idCol), array(cols: _*).as("proj"))
  }
}
