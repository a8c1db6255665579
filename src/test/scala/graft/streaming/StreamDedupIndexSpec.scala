package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №191 stream_dedup_index: the streaming probe-then-append contracts —
  * three genuine data micro-batches, the store's file count grows with
  * every append (the serve reads files, not a driver buffer), night n's
  * serve sees exactly the nights < n (probe-before-append: a night never
  * sees itself), and the stream's rows equal №190's batch-calendar stages
  * for the same nights (the stream is an access path, not a fork). */
class StreamDedupIndexSpec extends SparkSpec {

  private lazy val run = StreamDedupIndex.streamDedupIndexWithCensus(spark, sf)
  private lazy val byNight = run._1.collect().map(r => r.getLong(0).toInt -> r).toMap
  private lazy val census = run._2

  test("three data micro-batches, one per night") {
    assert(census.batches === 3)
    assert(byNight.keySet === Set(1, 2, 3))
  }

  test("the store grows per append and every serve reads the files back") {
    val files = census.servedFiles.toMap
    assert(files.keySet === Set(1L, 2L, 3L))
    // serve n happens BEFORE append n: night 1 sees only the base files;
    // each later serve sees exactly one more appended file (coalesce(1))
    assert(files(2L) === files(1L) + 1)
    assert(files(3L) === files(2L) + 1)
    // the index row census grows night over night (appends are visible)
    assert(byNight(1).getLong(1) < byNight(2).getLong(1))
    assert(byNight(2).getLong(1) < byNight(3).getLong(1))
  }

  test("the stream equals the batch calendar's nightly stages (access path, not a fork)") {
    val cal = graft.queries.HashDedup.dedupIndexCalendar(spark, sf).collect()
      .map(r => r.getLong(0).toInt -> r).toMap
    // №190 stage numbering: S1, S2 are nights 1-2; S4 is night 3's
    // post-compaction serve (same keys, same store content — compaction
    // never changes an answer)
    for ((night, stage) <- Seq(1 -> 1, 2 -> 2, 3 -> 4)) {
      val s = byNight(night); val c = cal(stage)
      for (i <- 1 to 5)
        assert(s.getLong(i) === c.getLong(i),
          s"night $night col $i: stream ${s.getLong(i)} != calendar ${c.getLong(i)}")
    }
  }
}
