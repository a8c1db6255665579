package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №164 stream_window_quantile: the watermark-windowed sketch state
  * contracts — the streamed per-window grid must equal the batch grid
  * over №153's closed-form accepted rows BYTE-FOR-BYTE (linear merge ×
  * proven acceptance predicate), lateness must be real (non-zero
  * drops), and emission must respect the final watermark. */
class StreamWindowQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("streamed window grids ≡ batch grids over the closed-form accepted set; drops real; emission watermark-bounded") {
    import graft.queries.Analytics.{VqDepth, VqLevels, VqWidth}
    val grids = StreamWindowQuantile.emittedGrids(spark, sf).toSeq.sortBy(_._1)
    assert(StreamWindowQuantile.lastBatches >= 3,
      s"only ${StreamWindowQuantile.lastBatches} data micro-batches — state never crossed a batch")
    assert(StreamWindowQuantile.lastDropped > 0L,
      "no watermark drops — the late-data scenario is vacuous")
    assert(grids.nonEmpty)
    // emission bound: every emitted window closed before the final watermark
    val wmf = graft.Tables(spark, sf).events
      .agg((max($"ts_ms") - StreamLate.DelayMs).as("wm")).head().getLong(0)
    grids.foreach { case (ws, _) =>
      assert(ws + StreamLate.WindowMs <= wmf, s"window $ws emitted past the final watermark")
    }
    // byte equality: per emitted window, the streamed grid equals the
    // batch DyadicCountMin over exactly the closed-form accepted rows
    val batch = StreamWindowQuantile.acceptedRows(spark, sf)
      .groupBy($"ws")
      .agg(graft.functions.DyadicCountMin.sketch($"v", VqLevels, VqDepth, VqWidth).as("g"))
      .as[(Long, Seq[Long])].collect().toMap
    grids.foreach { case (ws, g) =>
      assert(batch.contains(ws), s"emitted window $ws missing from the closed-form set")
      assert(g == batch(ws),
        s"window $ws: streamed grid diverges from the accepted-set batch grid")
    }
    // the late-drop semantics genuinely changed at least one window's
    // grid: recompute WITHOUT the acceptance filter and find a diff
    val unfiltered = graft.Tables(spark, sf).events
      .select(expr(s"(ts_ms DIV ${StreamLate.WindowMs}) * ${StreamLate.WindowMs}").as("ws"),
        least(expr("CAST(round(value * 100 + 0.000000001) AS BIGINT)"),
          lit(graft.queries.Analytics.VqMax.toLong)).as("v"))
      .groupBy($"ws")
      .agg(graft.functions.DyadicCountMin.sketch($"v", VqLevels, VqDepth, VqWidth).as("g"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(grids.exists { case (ws, g) => unfiltered(ws) != g },
      "accepted ≡ unfiltered everywhere — the watermark dropped nothing that mattered")
  }
}
