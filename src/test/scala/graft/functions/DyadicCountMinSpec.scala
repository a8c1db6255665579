package graft.functions

import graft.SparkSpec
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** №158 quantile_sketch / the DyadicCountMin contracts: linear-merge
  * invariance across adversarial partitionings, the one-sided
  * value-domain guarantee (est quantile ≤ exact quantile, EVERY row) with
  * the error measured and non-trivial, plain-Scala recomputation of the
  * grid, the №159 stream ≡ batch equality, serde, and analysis typing. */
class DyadicCountMinSpec extends SparkSpec {
  import spark.implicits._

  private val (lv, dp, wd, mx) =
    (TextQueries.QsLevels, TextQueries.QsDepth, TextQueries.QsWidth, TextQueries.QsMax)

  private def vals = graft.Tables(spark, sf).documents
    .select(least(size(TextQueries.words($"text")), lit(mx)).cast("long").as("v"))

  test("merge is linear: identical grids under any partitioning; clamp keeps total mass exact") {
    val base = vals.persist()
    try {
      def grid(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.agg(DyadicCountMin.sketch($"v", lv, dp, wd).as("sk")).as[Seq[Long]].head()
      val one = grid(base.coalesce(1))
      val wide = grid(base.repartition(17))
      assert(one == wide, "grid forks across partitionings")
      val doubled = grid(base.unionAll(base))
      assert(doubled == one.map(_ * 2L), "union did not exactly double the counters")
      // each row increments exactly levels·depth counters — clamped or not
      assert(one.sum == base.count() * lv * dp, "per-row increment accounting broken")
      // out-of-range values clamp into the domain, never drop: a huge value
      // lands every level-l counter of the top interval
      val clamped = spark.range(1).select(lit(Long.MaxValue).as("v"))
        .agg(DyadicCountMin.sketch($"v", lv, dp, wd).as("sk")).as[Seq[Long]].head()
      assert(clamped.sum == lv.toLong * dp, "clamped value must still count once per level per row")
    } finally { base.unpersist(); () }
  }

  test("quantile_sketch: est ≤ exact on EVERY row (one-sided), error non-trivial, deciles monotone") {
    val rows = TextQueries.quantileSketch(spark, sf)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    val nSources = graft.Tables(spark, sf).documents.select($"source").distinct().count().toInt
    assert(rows.size == TextQueries.QuantilePcts.size * nSources)
    rows.foreach { case (src, pct, exact, est, err) =>
      assert(est <= exact, s"$src p$pct OVERestimated: est=$est exact=$exact — one-sidedness broken")
      assert(err == est - exact, s"$src p$pct error arithmetic")
    }
    // the narrow gate-SF width must produce real collisions somewhere
    assert(rows.exists(_._5 < 0L), "zero error everywhere — width too wide to exercise the sketch")
    // per source, both exact and estimated deciles are monotone in pct
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val byPct = rs.sortBy(_._2)
      assert(byPct.map(_._3).sliding(2).forall(p => p.head <= p.last), s"$src exact not monotone")
      assert(byPct.map(_._4).sliding(2).forall(p => p.head <= p.last), s"$src est not monotone")
    }
  }

  test("estimate ≡ plain-Scala dyadic grid recomputation from first principles") {
    val bySrc = graft.Tables(spark, sf).documents
      .select($"source", least(size(TextQueries.words($"text")), lit(mx)).cast("long").as("v"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val expected = bySrc.toSeq.sortBy(_._1).flatMap { case (src, vs) =>
      val n = vs.size.toLong
      val grid = scala.collection.mutable.Map.empty[(Int, Int, Int), Long].withDefaultValue(0L)
      vs.foreach { x =>
        for (l <- 0 until lv; d <- 0 until dp)
          grid((l, d, CountMin.slot(d, s"$l:${x >> l}", wd))) += 1L
      }
      def estRank(v: Long): Long =
        if (v == mx) n
        else (0 until lv).map { l =>
          if ((((v + 1) >> l) & 1L) == 1L) {
            val idx = ((v + 1) >> l) - 1
            (0 until dp).map(d => grid((l, d, CountMin.slot(d, s"$l:$idx", wd)))).min
          } else 0L
        }.sum
      val present = vs.distinct.sorted
      val cum = present.map(v => v -> vs.count(_ <= v).toLong).toMap
      TextQueries.QuantilePcts.map { q =>
        val exact = present.find(v => 100L * cum(v) >= q * n).get
        val est = present.find(v => 100L * estRank(v) >= q * n).get
        (src, q, exact, est, est - exact)
      }
    }
    val got = TextQueries.quantileSketch(spark, sf)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    assert(got == expected, "engine quantile estimates diverge from the plain-Scala grid")
  }

  test("value_quantile_sketch (№163, the 2¹⁶ cents domain): one-sided, monotone, real collisions") {
    val rows = graft.queries.Analytics.valueQuantileSketch(spark, sf)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    assert(rows.size == TextQueries.QuantilePcts.size * 5) // 5 event types
    rows.foreach { case (t, pct, exact, est, err) =>
      assert(est <= exact, s"$t p$pct OVERestimated: est=$est exact=$exact — one-sidedness broken")
      assert(err == est - exact)
      assert(exact >= 0 && exact <= graft.queries.Analytics.VqMax)
    }
    assert(rows.exists(_._5 < 0L), "zero error everywhere on an 18k-distinct-value domain")
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val byPct = rs.sortBy(_._2)
      assert(byPct.map(_._3).sliding(2).forall(p => p.head <= p.last), s"$t exact not monotone")
      assert(byPct.map(_._4).sliding(2).forall(p => p.head <= p.last), s"$t est not monotone")
    }
  }

  test("stream ≡ batch: sharded streamed grids SUM to the batch answer; replay crossed micro-batches") {
    val streamRows = graft.streaming.StreamQuantile.streamQuantile(spark, sf)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(graft.streaming.StreamQuantile.lastBatches >= 3,
      s"only ${graft.streaming.StreamQuantile.lastBatches} data micro-batches — state never crossed a batch")
    graft.CacheRegistry.releaseAll(spark)
    val batchRows = TextQueries.quantileSketch(spark, sf)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    assert(streamRows == batchRows,
      "streamed estimates diverge from batch — the linear shard-sum should make them identical")
  }

  test("serde round-trips; non-integral child rejected at analysis time") {
    val sk = DyadicCountMin(org.apache.spark.sql.catalyst.expressions.Literal(1L), lv, dp, wd)
    val buf = sk.createAggregationBuffer()
    buf(0) = 42L; buf(buf.length - 1) = Long.MaxValue / 3
    assert(sk.deserialize(sk.serialize(buf)).toSeq == buf.toSeq)
    // version-tagged (the MisraGries checkpoint contract): old/corrupt
    // bytes fail loudly, and a grid serialized under different dials is
    // rejected by the length check instead of decoding shifted counters
    val bytes = sk.serialize(buf)
    assert(bytes.length == 1 + buf.length * 8 && bytes(0) == DyadicCountMin.FormatVersion)
    val stale = bytes.clone(); stale(0) = (DyadicCountMin.FormatVersion + 1).toByte
    assert(intercept[IllegalArgumentException](sk.deserialize(stale))
      .getMessage.contains("incompatible version"))
    val otherGeom = DyadicCountMin(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), lv, dp, wd * 2)
    assert(intercept[IllegalArgumentException](otherGeom.deserialize(bytes))
      .getMessage.contains("geometry"))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(10).select($"id".cast("string").as("s"))
        .agg(DyadicCountMin.sketch(col("s"), lv, dp, wd).as("sk")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("integral"))
  }
}
