package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №113 fuzzy_pairs — the FastSS deletion-neighborhood join against a
  * brute-force all-pairs Levenshtein ground truth (the O(n²) form the
  * operator exists to avoid). */
class FuzzyPairsSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzy_pairs ≡ brute-force all-pairs distance-1 ground truth") {
    val names = graft.Tables(spark, sf).customer
      .select($"c_custkey", lower($"c_name")).as[(Long, String)].collect().toSeq
    val truthDeg = (for {
      (ka, na) <- names; (kb, nb) <- names
      if na < nb && math.abs(na.length - nb.length) <= 1 && lev(na, nb) == 1
      k <- Seq(ka, kb)
    } yield k).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = names.filter(n => truthDeg.contains(n._1))
      .map { case (k, nm) => (k, nm, truthDeg(k)) }.sortBy(_._1)
    val got = TextQueries.fuzzyPairs(spark, sf)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == expected,
      "deletion-neighborhood join must find exactly the brute-force pair set")
    assert(got.nonEmpty, "the proof corpus must exercise the operator")
  }
}
