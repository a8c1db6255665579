package graft.queries

import graft.SparkSpec

/** №165 log_quantile_sketch — the log-linear bucket wrapper that takes
  * the №158 dyadic grid from a bounded integer domain to ALL of BIGINT:
  * plain-Scala replay of the transform (the engines' shift/bin formula,
  * re-derived here from numberOfLeadingZeros) plus the driver row's
  * one-sidedness and error discipline. */
class LogQuantileSketchSpec extends SparkSpec {
  import Analytics.{LqLevels, LqSub, LqSubBits}

  private def bucket(v: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val p = 1L << e
    val sub = if (e >= LqSubBits) (v - p) >> (e - LqSubBits)
              else (v - p) << (LqSubBits - e)
    e.toLong * LqSub + sub
  }

  private def decode(b: Long): Long = {
    val e = (b / LqSub).toInt
    val sub = b % LqSub
    (1L << e) + (if (e >= LqSubBits) sub << (e - LqSubBits)
                 else sub >> (LqSubBits - e))
  }

  test("bucket transform: whole-BIGINT domain in 10 levels, monotone, lossless below 2^4, decode = lower edge") {
    // the headline: every positive 64-bit value fits a 10-level grid
    assert(bucket(Long.MaxValue) == 62L * LqSub + (LqSub - 1))
    assert(bucket(Long.MaxValue) < (1L << LqLevels) - 1)
    // octaves below S are LOSSLESS (sub-bucket stride 2^(4-e) inverts)
    for (v <- 1L until LqSub.toLong) assert(decode(bucket(v)) == v)
    // magnitude sweep: powers of two ± offsets across all octaves
    val sample = ((1L to 4096L) ++
      (0 until 400).map(i => (1L << (i % 55)) + i.toLong * 977L) ++
      Seq(Long.MaxValue, Long.MaxValue - 1)).distinct.sorted
    sample.sliding(2).foreach {
      case Seq(a, b) => assert(bucket(a) <= bucket(b), s"monotonicity broken at $a -> $b")
      case _ => ()
    }
    sample.foreach { v =>
      val dec = decode(bucket(v))
      assert(dec <= v, s"decode($v) = $dec overshoots — not a lower edge")
      // gap < sub-bucket stride 2^(e-4) ≤ v/16 (shift form: multiplying
      // by S overflows near Long.MaxValue)
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val stride = if (e >= LqSubBits) 1L << (e - LqSubBits) else 1L
      assert(v - dec < stride, s"gap at $v: dec=$dec stride=$stride")
    }
  }

  test("driver row: one-sided in the VALUE domain, decode-consistent, deviation measured and bounded") {
    val rows = Analytics.logQuantileSketch(spark, sf).collect()
    assert(rows.length == 50) // 5 event types × 10 pcts
    rows.foreach { r =>
      val (exact, bEst, lo) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo <= exact, s"est ${lo} overshoots exact $exact — one-sidedness broken")
      assert(decode(bEst) == lo, "amt_est_lo is not the est bucket's lower edge")
      assert(bEst <= bucket(exact), "est bucket overshoots the exact value's bucket")
      assert(r.getDouble(5) >= 0.0)
      // total one-sided error = the 1/S bucketing term + the grid's
      // collision term (larger at tiny SFs where per-group counts are
      // small; measured max 0.128 here vs 0.083 at sf0.01 — 3/S band)
      assert(r.getDouble(5) <= 3.0 / LqSub, s"rel_err ${r.getDouble(5)} out of band")
    }
    // the grid genuinely deviates somewhere (earns 'approx'): at least one
    // estimated bucket sits strictly below the exact value's bucket
    assert(rows.exists(r => r.getLong(3) < bucket(r.getLong(2))),
      "est ≡ exact everywhere — width too wide to exercise the sketch")
  }
}
