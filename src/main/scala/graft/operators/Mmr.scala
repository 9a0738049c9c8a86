package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * diversify a top-K candidate list: greedily pick the candidate
  * maximizing lambda·rel(d) − (1−lambda)·max_{s∈selected} sim(d, s).
  * The standard "don't return 10 near-identical passages" step after
  * retrieval (RAG context assembly, eval-set diversification).
  *
  * Scale shape: the greedy loop is inherently sequential PER QUERY but
  * independent ACROSS queries, and it only ever sees the K-bounded
  * candidate list — so it runs as `flatMapGroups` over qid with O(K·k)
  * work and O(K) state per group, parallel in the number of queries.
  * Nothing corpus-sized is touched: candidates arrive k-bounded from the
  * retrieval stage (ANN index or flat top-K), embeddings join in by id
  * before the group-by (a k-bounded equi-join).
  *
  * Determinism/oracle parity: rel and sim are both unit-vector dot
  * products in DOUBLE (each vector normalized by its own norm first) —
  * the same left-to-right per-dimension sum DuckDB's list arithmetic
  * produces — and ties break by ascending id, so an unrolled-CTE SQL
  * oracle reproduces picks and scores bit-for-bit.
  */
object Mmr {

  private def unitDot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def normalize(v: Array[Float]): Array[Double] = {
    val d = v.map(_.toDouble)
    var n = 0.0
    var i = 0
    while (i < d.length) { n += d(i) * d(i); i += 1 }
    val nn = math.sqrt(n)
    if (nn == 0.0) d else d.map(_ / nn)
  }

  /** Re-rank candidates: `cands` has (qidCol, idCol); `vecs` maps id →
    * embedding (joined for both the candidates and, via `qVecs`, the
    * queries). Returns (qid, id, mmr_rank 1..k, mmr_score) — the k picks
    * per query in selection order.
    */
  def rerank(
      cands: DataFrame,
      qidCol: String, idCol: String,
      vecs: DataFrame, vecIdCol: String, vecCol: String,
      k: Int, lambda: Double): DataFrame = {
    require(k > 0, "k must be positive")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]")
    // the typed greedy below encodes (Long, Long, Array[Float],
    // Array[Float]); check the column contract up front so a string/int
    // id or double vector fails with a diagnosable message instead of an
    // analysis error deep in the encoder
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
    def requireType(df: DataFrame, c: String, ok: Boolean, want: String): Unit =
      require(ok, s"Mmr.rerank serves $c as $want only (got " +
        s"${df.schema(c).dataType.simpleString}; cast ids to bigint / " +
        "vectors to array<float> upstream)")
    requireType(cands, qidCol, cands.schema(qidCol).dataType == LongType, "bigint")
    requireType(cands, idCol, cands.schema(idCol).dataType == LongType, "bigint")
    requireType(vecs, vecIdCol, vecs.schema(vecIdCol).dataType == LongType, "bigint")
    requireType(vecs, vecCol, vecs.schema(vecCol).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }, "array<float>")
    val s = cands.sparkSession
    val docSide = vecs.select(col(vecIdCol).as("__did"), col(vecCol).as("__demb"))
    // only the QUERY rows broadcast — bounded by the query-batch size,
    // never the vector table (a full-vecs broadcast would be the
    // classic 100 TB scale-killer)
    val qSide = vecs
      .join(cands.select(col(qidCol).as("__q")).distinct(),
        col(vecIdCol) === col("__q"), "left_semi")
      .select(col(vecIdCol).as("__qid2"), col(vecCol).as("__qemb"))
    val joined = cands
      .select(col(qidCol).as("__qid"), col(idCol).as("__cid"))
      .join(docSide, col("__cid") === col("__did"))
      .join(broadcast(qSide), col("__qid") === col("__qid2"))
      .select(col("__qid"), col("__cid"), col("__demb"), col("__qemb"))
    import s.implicits._
    val typed = joined.as[(Long, Long, Array[Float], Array[Float])]
    val out = typed.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val rows = it.toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val qu = normalize(rows.head._4)
        // (id, unit emb, rel) sorted by id for deterministic iteration
        val c = rows.map { case (_, id, demb, _) =>
          val du = normalize(demb)
          (id, du, unitDot(du, qu))
        }.sortBy(_._1)
        val chosen = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
        val chosenVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        val used = scala.collection.mutable.HashSet.empty[Long]
        while (chosen.size < math.min(k, c.length)) {
          var bestId = -1L; var bestScore = Double.NegativeInfinity
          var bestVec: Array[Double] = null
          for ((id, du, rel) <- c if !used.contains(id)) {
            var maxSim = Double.NegativeInfinity
            for (sv <- chosenVecs) {
              val sim = unitDot(du, sv)
              if (sim > maxSim) maxSim = sim
            }
            val score =
              if (chosenVecs.isEmpty) lambda * rel
              else lambda * rel - (1.0 - lambda) * maxSim
            // strict >: ties keep the earliest (ascending id) candidate
            if (score > bestScore) { bestScore = score; bestId = id; bestVec = du }
          }
          used += bestId
          chosen += ((bestId, bestScore))
          chosenVecs += bestVec
        }
        chosen.iterator.zipWithIndex.map { case ((id, sc), i) =>
          (qid, id, (i + 1).toLong, sc)
        }
      }
    }
    out.toDF("qid", "id", "mmr_rank", "mmr_score")
  }
}
