package graft.streaming

import graft.SparkSpec

/** №221 stream_shard: the shard store's streamed lifecycle — zero file
  * rewrites across arrivals AND forget, tombstones as the delete, the
  * supersede chain through three generations, and prefix-visible serves. */
class StreamShardSpec extends SparkSpec {

  private lazy val run = StreamShard.streamShardWithCensus(spark, sf)
  private lazy val rows = run._1.collect()
  private lazy val byBatch = rows.groupBy(_.getLong(0))
  private lazy val detail = run._2

  test("three events; not one file is ever rewritten") {
    assert(detail.batches === 3)
    // once a file exists, its (size, mtime) never changes — through the
    // second arrival AND the forget
    Seq(0L -> 1L, 1L -> 2L).foreach { case (a, b) =>
      detail.files(a).foreach { case (name, meta) =>
        assert(detail.files(b).get(name).contains(meta),
          s"file $name changed between stage $a and $b — history was rewritten")
      }
      assert(detail.files(b).size > detail.files(a).size,
        s"stage $b added no files — the generation never landed")
    }
  }

  test("the forget is a tombstone generation, not a rewrite") {
    val r2 = byBatch(2L).head
    assert(r2.getAs[Long]("n_tombstones") > 0L, "no tombstone landed")
    // tombstoned keys stop serving exactly at the forget
    val k1 = byBatch(1L).map(r => (r.getLong(3), r.getLong(4))).toSet
    val k2 = byBatch(2L).map(r => (r.getLong(3), r.getLong(4))).toSet
    assert(k2.subsetOf(k1), "the forget added keys")
    assert((k1 -- k2).size.toLong === r2.getAs[Long]("n_tombstones"),
      "dropped keys ≠ tombstones — a tombstone missed or overshot")
    // and the raw store still carries every generation's lines
    assert(detail.rawLines(2L) > detail.rawLines(1L))
  }

  test("the supersede chain is real: an A1-created key superseded by A2") {
    val stage0 = byBatch(0L).map(r => ((r.getLong(3), r.getLong(4)), r.getAs[Int]("gen"))).toMap
    val stage1 = byBatch(1L).map(r => ((r.getLong(3), r.getLong(4)), r.getAs[Int]("gen"))).toMap
    val chained = stage1.filter { case (k, g) => g == 2 && stage0.get(k).contains(1) }
    assert(chained.nonEmpty,
      "no A1-created key was superseded by A2 — the three-generation chain is vacuous")
    // and the forget reaches arrival-created content
    val k2 = byBatch(2L).map(r => (r.getLong(3), r.getLong(4))).toSet
    val arrivalDoomed = stage1.keySet.filterNot(k2)
      .filter(k => stage1(k) >= 1 && !stage0.get(k).contains(0))
    assert(arrivalDoomed.nonEmpty,
      "every tombstone hit base content — the forget never reached a post-stream key")
  }

  test("serves are prefix-visible and monotone until the forget") {
    val n = byBatch.map { case (b, rs) => b -> rs.length }
    assert(n(0L) < n(1L), "A2's sequences never served")
    assert(n(2L) < n(1L), "the forget dropped nothing")
    // positions stable across stages for surviving keys
    val pos1 = byBatch(1L).map(r => (r.getLong(3), r.getLong(4)) -> (r.getInt(1), r.getLong(2))).toMap
    byBatch(2L).foreach { r =>
      val k = (r.getLong(3), r.getLong(4))
      assert(pos1(k) === ((r.getInt(1), r.getLong(2))),
        s"key $k moved (shard, pos) across the forget — resume offsets broken")
    }
  }
}
