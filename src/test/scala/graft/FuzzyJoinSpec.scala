package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** FastSS deletion-neighborhood fuzzy matching: the candidate cover must
  * be COMPLETE for distance ≤ 1 (every true pair found) and the
  * levenshtein verification must keep it exact (no false positives).
  */
class FuzzyJoinSpec extends GraftSuite {
  import spark.implicits._

  test("editDistance1Pairs equals brute-force levenshtein on a mixed vocab") {
    // substitution, insertion, deletion, equal-at-distance-2, prefix/suffix
    val words = Seq(
      "cat", "cut", "cart", "at", "dog", "dig", "dogs", "og",
      "alpha", "alphaa", "alpa", "beta", "betas", "bet", "xyz").toDF("s")
    val got = FuzzyJoin.editDistance1Pairs(words, "s")
      .as[(String, String, Long)].collect().toSet
    val vocab = words.as[String].collect().distinct
    val brute = (for {
      a <- vocab; b <- vocab if a < b
      d = {
        // classic DP Levenshtein as the ground truth
        val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length)
      } if d <= 1
    } yield (a, b, d.toLong)).toSet
    assert(got === brute)
    assert(brute.exists(_._3 == 1L)) // the fixture actually exercises ed-1
  }

  test("editDistance1Pairs on customer names: exact vs brute on a slice") {
    val names = spark.read.parquet(s"$sf0/customer.parquet")
      .filter(col("c_custkey") < 120).select(col("c_name"))
    val got = FuzzyJoin.editDistance1Pairs(names, "c_name")
      .as[(String, String, Long)].collect().toSet
    val brute = names.as("x").crossJoin(names.as("y"))
      .filter(col("x.c_name") < col("y.c_name") &&
        levenshtein(col("x.c_name"), col("y.c_name")) <= 1)
      .select(col("x.c_name"), col("y.c_name"),
        levenshtein(col("x.c_name"), col("y.c_name")).cast("long"))
      .as[(String, String, Long)].collect().toSet
    assert(got === brute)
    assert(got.nonEmpty) // ids differing in one digit exist in any 120-run
  }

  test("editDistance1Pairs deduplicates input and is partition-invariant") {
    val words = Seq("aaa", "aab", "aaa", "aab", "abb").toDF("s")
    val got = FuzzyJoin.editDistance1Pairs(words.repartition(7), "s")
      .as[(String, String, Long)].collect().toSet
    // aaa↔abb is distance 2: correctly absent
    assert(got === Set(("aaa", "aab", 1L), ("aab", "abb", 1L)))
  }
}
