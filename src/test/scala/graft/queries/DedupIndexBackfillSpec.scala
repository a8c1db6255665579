package graft.queries

import graft.SparkSpec

/** №194 dedup_index_backfill: the at-least-once contracts — the retry storm
  * inflates n_rows by exactly the doubled night while n_distinct holds, the
  * serve is pair-identical through all three stages (idempotent by
  * construction, never by luck), the repair reads exactly the affected
  * generation (post-storm: 2x one night), and the repaired store swaps
  * gen=2 for gen=12 on disk. */
class DedupIndexBackfillSpec extends SparkSpec {

  private lazy val run = HashDedup.dedupIndexBackfillDetail(spark, sf)
  private lazy val byStage = run._1.collect().map(r => r.getLong(0).toInt -> r).toMap
  private lazy val detail = run._2

  test("the storm inflates n_rows by exactly the doubled night; n_distinct never moves") {
    assert(byStage.keySet === Set(0, 1, 2))
    val night2 = byStage(1).getLong(1) - byStage(0).getLong(1)
    assert(night2 > 0, "the storm must add rows")
    assert(byStage(2).getLong(1) === byStage(0).getLong(1), "repair must restore the row count")
    assert(byStage.values.map(_.getLong(2)).toSet === Set(byStage(0).getLong(1)),
      "n_distinct must equal the clean store at every stage")
    // the repair read exactly the duplicated generation: 2 x night 2
    assert(detail.repairRowsRead === 2 * night2,
      s"repair read ${detail.repairRowsRead}, expected ${2 * night2} (the affected generation only)")
  }

  test("the serve is idempotent through the storm and the repair") {
    assert(detail.candPairs(0) === detail.candPairs(1))
    assert(detail.candPairs(1) === detail.candPairs(2))
    (0 to 2).foreach { s =>
      assert(byStage(s).getLong(4) === byStage(0).getLong(4))
      assert(byStage(s).getLong(6) === byStage(0).getLong(6))
    }
  }

  test("the repair swaps the affected generation on disk") {
    assert(detail.gensAfter === Seq("gen=0", "gen=1", "gen=12"))
  }
}
