package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-1 fuzzy matching via deletion neighborhoods (the FastSS
  * family, Bocek et al. 2007): two strings within Levenshtein distance 1
  * always share an element of D(s) = {s} ∪ {s minus one character}, so
  * candidate pairs fall out of an EQUI-join on neighborhood elements and
  * only candidates pay the exact distance check — never all pairs.
  * Entity-resolution / typo-normalization over names, URLs and near-ids
  * (the "Customer#0001 vs Customer#0002" shape).
  *
  * Scale shape: the neighborhood explode multiplies each string by
  * (len+1) small variants; the candidate join is a plain hash equi-join
  * on the variant string; `levenshtein` verification runs only on
  * surviving candidates. No window, no all-pairs, no driver state. For
  * long strings, cap input length upstream (neighborhood size is O(len)).
  */
object FuzzyJoin {

  /** All UNORDERED pairs (a < b) of distinct values of `strCol` within
    * Levenshtein distance 1, as (a, b, dist). Exact: the deletion
    * neighborhood is a complete cover for distance ≤ 1 (equal strings
    * share s itself; a substitution shares the deletion at the edited
    * position; an insert/delete pair shares the shorter string).
    */
  def editDistance1Pairs(df: DataFrame, strCol: String): DataFrame = {
    val vocab = df.select(col(strCol).as("s")).filter(col("s").isNotNull)
      .distinct()
    // D(s): s itself plus every one-character deletion (1-based substring
    // algebra: drop position i = prefix of length i-1 + suffix from i+1)
    val dels = transform(sequence(lit(1), length(col("s"))),
      i => concat(
        col("s").substr(lit(1), i - 1),
        col("s").substr(i + 1, length(col("s")))))
    val neigh = vocab.select(col("s"),
      explode(array_union(array(col("s")), dels)).as("v"))
    val cands = neigh.as("x").join(neigh.as("y"),
        col("x.v") === col("y.v") && col("x.s") < col("y.s"))
      .select(col("x.s").as("a"), col("y.s").as("b"))
      .distinct()
    cands
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .filter(col("dist") <= 1)
  }
}
