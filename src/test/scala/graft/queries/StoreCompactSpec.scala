package graft.queries

import graft.SparkSpec

/** №216 knn_store_compact: the write-then-delete compaction contracts on
  * the serving vector store — the mid state inflates `n_rows` by exactly
  * the consolidation bill while the served top-k never moves, each
  * touched cell's file spray collapses to one file, and untouched cells
  * are bit-identical. */
class StoreCompactSpec extends SparkSpec {

  private lazy val run = VectorQueries.knnStoreCompactDetail(spark, sf)
  private lazy val byStage = run._1.collect().groupBy(_.getLong(0).toInt)
  private lazy val detail = run._2
  private def census(s: Int, i: Int): Long = byStage(s).head.getLong(i)

  test("serves identical through the whole compaction; censuses honest") {
    assert(detail.topk(0).nonEmpty)
    assert(detail.topk(1) === detail.topk(0) && detail.topk(2) === detail.topk(0),
      "the top-k must not move while files churn")
    assert(census(1, 1) - census(0, 1) === detail.rewrittenRows,
      "S1 carries old and consolidated files at once")
    assert(census(2, 1) === census(0, 1), "post-delete census restored")
    Seq(0, 1, 2).foreach(s => assert(census(s, 2) === census(0, 2), s"n_distinct moved at S$s"))
  }

  test("touched cells collapse to one file; untouched cells bit-identical") {
    assert(detail.touchedCells.nonEmpty)
    detail.touchedCells.foreach { c =>
      assert(detail.filesByCell(0)(c) >= 2, s"cell $c must carry the storm's small files")
      assert(detail.filesByCell(1)(c) === detail.filesByCell(0)(c) + 1,
        s"cell $c mid-state: old files plus ONE consolidated file")
      assert(detail.filesByCell(2)(c) === 1, s"cell $c must be one file after compaction")
    }
    assert(detail.touchedCells.exists(c => detail.filesByCell(0)(c) >= 3),
      "at least one cell took multiple small appends — the storm is non-trivial")
    assert(detail.untouchedBefore === detail.untouchedAfter,
      "untouched cells' files must be bit-identical")
    assert(detail.untouchedBefore.nonEmpty, "there must BE untouched cells to protect")
  }
}
