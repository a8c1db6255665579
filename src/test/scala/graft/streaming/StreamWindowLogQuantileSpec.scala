package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №171 stream_window_log_quantile: №164's windowed-grid contracts,
  * re-pinned for the log-bucket domain — the streamed per-window grid
  * over №165's buckets must equal the batch grid over №153's
  * closed-form accepted rows BYTE-FOR-BYTE, lateness must be real
  * (non-zero drops), emission must respect the final watermark, and
  * the bucket transform must genuinely exercise multiple octaves
  * (else the log-linear leg is vacuous and №164 already covers it). */
class StreamWindowLogQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("streamed window log-bucket grids ≡ batch grids over the closed-form accepted set; drops real; emission watermark-bounded; multi-octave") {
    import graft.queries.Analytics.{LqDepth, LqLevels, LqSub, LqWidth}
    val grids = StreamWindowLogQuantile.emittedGrids(spark, sf).toSeq.sortBy(_._1)
    assert(StreamWindowLogQuantile.lastBatches >= 3,
      s"only ${StreamWindowLogQuantile.lastBatches} data micro-batches — state never crossed a batch")
    assert(StreamWindowLogQuantile.lastDropped > 0L,
      "no watermark drops — the late-data scenario is vacuous")
    assert(grids.nonEmpty)
    // emission bound: every emitted window closed before the final watermark
    val wmf = graft.Tables(spark, sf).events
      .agg((max($"ts_ms") - StreamLate.DelayMs).as("wm")).head().getLong(0)
    grids.foreach { case (ws, _) =>
      assert(ws + StreamLate.WindowMs <= wmf, s"window $ws emitted past the final watermark")
    }
    // byte equality: per emitted window, the streamed grid equals the
    // batch DyadicCountMin over exactly the closed-form accepted buckets
    val acc = graft.CacheRegistry.track(
      StreamWindowLogQuantile.acceptedRows(spark, sf).persist())
    val batch = acc.groupBy($"ws")
      .agg(graft.functions.DyadicCountMin.sketch($"b", LqLevels, LqDepth, LqWidth).as("g"))
      .as[(Long, Seq[Long])].collect().toMap
    grids.foreach { case (ws, g) =>
      assert(batch.contains(ws), s"emitted window $ws missing from the closed-form set")
      assert(g == batch(ws),
        s"window $ws: streamed grid diverges from the accepted-set batch grid")
    }
    // the heavy-tail stretch actually spans octaves: the accepted set
    // must hit ≥ 8 distinct octaves (b DIV LqSub), or the log leg is
    // indistinguishable from a linear grid at this SF
    val octaves = acc.select(expr(s"b DIV $LqSub")).distinct().count()
    assert(octaves >= 8L, s"only $octaves octaves in the accepted set — log-bucket leg vacuous")
    // the late-drop semantics genuinely changed at least one window's
    // grid: recompute WITHOUT the acceptance filter and find a diff
    val unfiltered = graft.Tables(spark, sf).events
      .where($"value".isNotNull)
      .select(expr(s"(ts_ms DIV ${StreamLate.WindowMs}) * ${StreamLate.WindowMs}").as("ws"),
        expr(graft.queries.Analytics.LqAmtSql).as("amt"))
      .withColumn("b", expr(graft.queries.Analytics.logBucketSql("amt")))
      .groupBy($"ws")
      .agg(graft.functions.DyadicCountMin.sketch($"b", LqLevels, LqDepth, LqWidth).as("g"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(grids.exists { case (ws, g) => unfiltered(ws) != g },
      "accepted ≡ unfiltered everywhere — the watermark dropped nothing that mattered")
  }
}
