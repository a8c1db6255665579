package graft.queries

import graft.SparkSpec

/** №160 knn_ivf_pq behavioral pins beyond the oracle (which already
  * recomputes every code, LUT entry and rank independently): the
  * measured relationships the operator's story rests on, on the
  * deterministic proof corpus. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  test("ADC + re-rank: shapes, bounds, and the measured recovery ordering") {
    val rows = VectorQueries.knnIvfPq(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    assert(rows.size == VectorQueries.PqMs.size * VectorQueries.NQueries)
    rows.foreach { case (m, q, hAdc, hRr, hIvf, rAdc, rRr, rIvf) =>
      for ((h, r) <- Seq((hAdc, rAdc), (hRr, rRr), (hIvf, rIvf))) {
        assert(h >= 0 && h <= VectorQueries.K, s"$m q$q hits out of range: $h")
        assert(math.abs(r - h.toDouble / VectorQueries.K) < 1e-5, s"$m q$q recall/hits mismatch")
      }
    }
    val byMethod = rows.groupBy(_._1).view.mapValues { rs =>
      (rs.map(_._3).sum.toDouble, rs.map(_._4).sum.toDouble, rs.map(_._5).sum.toDouble)
    }.toMap
    byMethod.foreach { case (m, (adc, rr, ivf)) =>
      // the exact re-rank RECOVERS what lossy ADC ranking dropped — on
      // this corpus it recovers the full probe ceiling (the shortlist
      // at 4K covers the probed candidates' gold members)
      assert(rr >= adc, s"$m: re-rank lost recall vs raw ADC ($rr < $adc)")
      assert(rr == ivf, s"$m: re-rank did not reach the probe ceiling at proof SF ($rr != $ivf)")
    }
    // the compression-fidelity ordering: more subspaces → finer ADC
    assert(byMethod("ivfpq_m4")._1 >= byMethod("ivfpq_m2")._1,
      "m4 ADC recall below m2 — the fidelity ordering inverted")
  }

  test("№166 residual encoding: measured fidelity uplift over raw-subvector PQ, same grading discipline") {
    val res = VectorQueries.knnIvfPqRes(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double, Double, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    val raw = VectorQueries.pqQuantize(spark, sf)
      .select(org.apache.spark.sql.functions.col("method"),
        org.apache.spark.sql.functions.col("recon_ppm")).distinct()
      .as[(String, Long)].collect().toMap
    graft.CacheRegistry.releaseAll(spark)
    assert(res.size == VectorQueries.PqMs.size * VectorQueries.NQueries)
    res.foreach { case (m, q, hAdc, hRr, hIvf, _, _, _, ppm) =>
      assert(hAdc >= 0 && hAdc <= VectorQueries.K)
      assert(hRr >= hAdc || hRr >= 0, s"$m q$q")
      assert(hIvf <= VectorQueries.K)
      assert(ppm > 0 && ppm < 1000000)
    }
    // THE claim (Jégou et al. 2011 §IV.A): coding the residual under the
    // same 16-codeword budget reconstructs strictly better than coding
    // the raw subvector, at every M — the uplift the operator exists for
    VectorQueries.PqMs.foreach { m =>
      val rppm = res.find(_._1 == s"ivfpqres_m$m").get._9
      assert(rppm > raw(s"pq_m$m"),
        s"m$m: residual recon_ppm $rppm not above raw ${raw(s"pq_m$m")}")
    }
    // re-rank still recovers at/above ADC per method
    res.groupBy(_._1).foreach { case (m, rs) =>
      assert(rs.map(_._4).sum >= rs.map(_._3).sum, s"$m: re-rank lost recall vs ADC")
    }
  }

  test("№162 incremental serving ≡ full re-encode under the frozen model; arrivals reach the top-k") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Long)].collect().toSeq
    val inc = rows(VectorQueries.knnIvfPqUpdate(spark, sf))
    graft.CacheRegistry.releaseAll(spark)
    val full = rows(VectorQueries.knnIvfPqUpdateFullRebuild(spark, sf))
    graft.CacheRegistry.releaseAll(spark)
    // per-vector encode under a frozen model is independent ⇒ the
    // incremental union must equal the full re-encode row-for-row
    // (scores AND ranks)
    assert(inc == full, "incremental union diverged from the full rebuild under the same model")
    assert(inc.size == VectorQueries.NQueries * VectorQueries.K)
    // non-vacuous: the daily arrivals (vec_id % 20 == 0) genuinely
    // reach the served top-k — the maintenance path is doing real work
    assert(inc.exists(_._2 % 20 == 0), "no arrival in any top-k — the incremental path went untested")
  }

  test("№169 residual incremental serving ≡ full re-encode under the frozen residual model") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Long)].collect().toSeq
    val inc = rows(VectorQueries.knnIvfPqResUpdate(spark, sf))
    graft.CacheRegistry.releaseAll(spark)
    val full = rows(VectorQueries.knnIvfPqResUpdateFullRebuild(spark, sf))
    graft.CacheRegistry.releaseAll(spark)
    // residual encoding is still per-vector independent under a frozen
    // model (cell → residual → codes is a pure function of the vector)
    assert(inc == full, "residual incremental union diverged from the full rebuild")
    assert(inc.size == VectorQueries.NQueries * VectorQueries.K)
    assert(inc.exists(_._2 % 20 == 0), "no arrival in any top-k — maintenance path untested")
  }
}
