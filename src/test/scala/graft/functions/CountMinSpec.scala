package graft.functions

import graft.SparkSpec
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** №147 freq_estimate / the CountMin contracts: linear-merge invariance
  * across partitionings, the one-sided never-underestimate guarantee with
  * the overcount MEASURED, plain-Scala recomputation, serde, and
  * analysis-time typing. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def grams = TextQueries.trigramStream(spark, sf).select($"sh")

  test("merge is linear: identical counters under any partitioning; doubling the data doubles them") {
    val base = grams.persist()
    try {
      def counters(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.agg(CountMin.sketch($"sh", 4, 64).as("sk")).as[Seq[Long]].head()
      val one = counters(base.coalesce(1))
      val wide = counters(base.repartition(13))
      assert(one == wide, "counter grid forks across partitionings")
      // linearity (NOT idempotence — the documented linear-sketch property):
      // data ∪ data must give exactly 2× every counter
      val doubled = counters(base.unionAll(base))
      assert(doubled == one.map(_ * 2L), "union did not exactly double the counters")
      assert(one.sum == base.count() * 4, "each row must increment exactly depth counters")
    } finally { base.unpersist(); () }
  }

  test("freq_estimate: est ≥ true for EVERY queried item; overcount within the colliding-mass bound") {
    val rows = TextQueries.freqEstimate(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    assert(rows.size == TextQueries.CmsTopK)
    val n = grams.count()
    rows.foreach { case (sh, t, est, over) =>
      assert(est >= t, s"'$sh' UNDERestimated: est=$est true=$t — CMS guarantee broken")
      assert(over == est - t, s"'$sh' overcount arithmetic")
      // expected colliding mass per row ≈ N/width; min over 4 rows sits
      // well under a generous multiple of it on this corpus (deterministic)
      assert(over <= 4L * n / TextQueries.CmsWidth,
        s"'$sh' overcount $over implausibly large vs N/width = ${n / TextQueries.CmsWidth}")
    }
    // the sketch genuinely collides at this width (it earns the 'approx')
    assert(rows.exists(_._4 > 0L), "no overcount anywhere — width too wide to exercise the sketch")
    // descending true-count presentation with deterministic ties
    assert(rows.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("estimate ≡ plain-Scala CMS recomputation from first principles") {
    val all = grams.as[String].collect().toSeq
    val cnt = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val grid = Array.fill(4 * TextQueries.CmsWidth)(0L)
    all.foreach { s =>
      (0 until 4).foreach { d =>
        grid(d * TextQueries.CmsWidth + CountMin.slot(d, s, TextQueries.CmsWidth)) += 1L
      }
    }
    val top = cnt.toSeq.sortBy { case (s, c) => (-c, s) }.take(TextQueries.CmsTopK)
    val expected = top.map { case (s, c) =>
      val est = (0 until 4).map(d => grid(d * TextQueries.CmsWidth + CountMin.slot(d, s, TextQueries.CmsWidth))).min
      (s, c, est, est - c)
    }
    val got = TextQueries.freqEstimate(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    assert(got == expected, "engine estimates diverge from the plain-Scala grid")
  }

  test("stream ≡ batch: sharded streamed grids SUM to the batch answer; replay crossed micro-batches") {
    val streamRows = graft.streaming.StreamFreq.streamFreq(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(graft.streaming.StreamFreq.lastBatches >= 3,
      s"only ${graft.streaming.StreamFreq.lastBatches} data micro-batches — state never crossed a batch")
    graft.CacheRegistry.releaseAll(spark)
    val batchRows = TextQueries.freqEstimate(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    assert(streamRows == batchRows,
      "streamed estimates diverge from batch — the linear shard-sum should make them identical")
  }

  test("serde round-trips; non-string child rejected at analysis time") {
    val cms = CountMin(org.apache.spark.sql.catalyst.expressions.Literal("a"), 4, 64)
    val buf = cms.createAggregationBuffer()
    buf(0) = 123456789L; buf(255) = Long.MaxValue / 2
    assert(cms.deserialize(cms.serialize(buf)).toSeq == buf.toSeq)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(10).agg(CountMin.sketch(col("id"), 4, 64).as("sk")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }
}
