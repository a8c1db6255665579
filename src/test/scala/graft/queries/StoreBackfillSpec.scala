package graft.queries

import graft.SparkSpec

/** №199 knn_store_backfill: the at-least-once contracts on the vector
  * store — the serve is idempotent through the retry storm (top-k
  * pair-identical at every stage), the censuses tell the truth (n_rows
  * inflated by exactly the doubled night, n_distinct fixed), the repair
  * rewrites only the touched cells (untouched cells keep their exact
  * files), and the repair bill is delta-sized. */
class StoreBackfillSpec extends SparkSpec {

  private lazy val run = VectorQueries.knnStoreBackfillDetail(spark, sf)
  private lazy val byStage = run._1.collect().groupBy(_.getLong(0).toInt)
  private lazy val detail = run._2
  private def census(s: Int, i: Int): Long = byStage(s).head.getLong(i)

  test("the serve is idempotent through storm and repair") {
    assert(detail.topk(1) === detail.topk(0), "the storm must not change served results")
    assert(detail.topk(2) === detail.topk(0), "the repair must not change served results")
  }

  test("censuses tell the truth: rows inflate by exactly the doubled night, distinct fixed") {
    val night = census(1, 1) - census(0, 1)
    assert(night > 0, "the storm must inflate the row census")
    assert(census(2, 1) === census(0, 1), "the repair must restore the row census")
    assert(byStage.values.map(_.head.getLong(2)).toSet.size === 1,
      "n_distinct must never move — the duplicate is physical, not logical")
  }

  test("the repair touches only the arrival cells") {
    assert(detail.touchedCells.nonEmpty)
    assert(detail.untouchedFilesAfter === detail.untouchedFilesBefore,
      "untouched cells must keep their exact files through the repair")
    assert(detail.rewrittenRows < census(0, 1),
      "the repair bill must be the touched cells' rows, never the store")
  }
}
