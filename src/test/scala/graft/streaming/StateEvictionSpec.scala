package graft.streaming

import graft.SparkSpec

/** The scale claim behind every streaming operator — "state is bounded
  * by the watermark horizon, not the stream's history" — MEASURED from
  * the state-store metrics instead of asserted in prose: replay two
  * batches separated by far more than the watermark delay and require
  * that the first batch's dedup state is actually REMOVED. */
class StateEvictionSpec extends SparkSpec {

  test("watermark eviction removes expired dedup state (state-store metrics)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[StreamDedup.Doc]
    val name = s"state_evict_${System.nanoTime()}"
    val q = StreamDedup.dedup(input.toDS(), "10 minutes")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      val t0 = 3600000L // 1h — comfortably above the initial watermark (0)
      input.addData((0 until 500).map(i => StreamDedup.Doc(i, s"text $i", t0)))
      q.processAllAvailable()
      // 2h later: watermark advances to ~2h58m, far past t0 + 10min —
      // the first batch's 500 hashes are now expired
      input.addData((500 until 600).map(i => StreamDedup.Doc(i, s"text $i", t0 + 2 * 3600000L)))
      q.processAllAvailable()
      // eviction runs on state maintenance after the watermark update —
      // one more micro-batch flushes it
      input.addData(Seq(StreamDedup.Doc(600, "text 600", t0 + 2 * 3600000L + 1000L)))
      q.processAllAvailable()

      val progresses = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      val removed = progresses.map(_.numRowsRemoved).sum
      val finalTotal = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(removed >= 500, s"expected the 500 expired hashes removed, metrics saw $removed")
      assert(finalTotal <= 101, s"state should hold only the live horizon, has $finalTotal rows")
      // and dedup still worked: every doc was first-seen → all emitted
      assert(spark.table(name).count() == 601)
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }
}
