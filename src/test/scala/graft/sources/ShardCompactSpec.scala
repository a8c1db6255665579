package graft.sources

import graft.SparkSpec

/** №222 shard_compact: consolidation completes the tombstone forget
  * physically — forgotten bytes live on disk (billed) until the compaction
  * deletes the superseded generations; the mid-state serves identically
  * and the write-then-delete order never pauses reads. */
class ShardCompactSpec extends SparkSpec {

  private lazy val run = ShardCompact.shardCompactWithDetail(spark, sf)
  private lazy val rows = run._1.collect()
  private lazy val byStage = rows.groupBy(_.getLong(0))
  private lazy val detail = run._2

  test("the view is byte-equal through write, overlap and delete") {
    val views = byStage.map { case (s, rs) =>
      s -> rs.map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6))).toSet
    }
    assert(views(0L) === views(1L), "the in-flight overlap changed the view")
    assert(views(1L) === views(2L), "the delete changed the view")
  }

  test("the compliance exposure is billed, then physically erased") {
    def bill(s: Long, col: String) = byStage(s).head.getAs[Long](col)
    assert(bill(0L, "n_forgot_raw") > 0L,
      "no forgotten byte on disk pre-compact — the tombstone store is vacuous here")
    assert(bill(1L, "n_forgot_raw") === bill(0L, "n_forgot_raw"),
      "the consolidated write resurrected or dropped forgotten lines")
    assert(bill(2L, "n_forgot_raw") === 0L,
      "a forgotten doc's bytes survive the compaction — the forget never completed")
    // dead lines: positive through the overlap, zero after
    assert(bill(0L, "n_dead_lines") > 0L)
    // the overlap costs exactly the consolidated copy: one extra line per
    // resolved row, nothing else
    assert(bill(1L, "n_dead_lines") === bill(0L, "n_dead_lines") + byStage(0L).length.toLong,
      "the overlap bill is not exactly the consolidation's line count")
    assert(bill(2L, "n_dead_lines") === 0L, "dead bytes survived the delete")
  }

  test("the file ledger collapses to one file per non-empty shard") {
    assert(detail.files(0).nonEmpty)
    // S1 = S0 files plus the gen-3 files, S0's untouched byte-stable
    detail.files(0).foreach { case (name, meta) =>
      assert(detail.files(1).get(name).contains(meta),
        s"pre-compact file $name changed during the consolidated write")
    }
    val gen3 = detail.files(1).keySet -- detail.files(0).keySet
    assert(gen3.nonEmpty && gen3.forall(_.endsWith(".g3.txt.gz")))
    // S2 = exactly the gen-3 files, untouched by the delete
    assert(detail.files(2).keySet === gen3, "the delete missed a source or ate a gen-3 file")
    gen3.foreach { n =>
      assert(detail.files(2)(n) === detail.files(1)(n),
        s"gen-3 file $n changed during the delete")
    }
  }
}
