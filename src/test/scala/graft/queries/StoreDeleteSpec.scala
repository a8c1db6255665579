package graft.queries

import graft.SparkSpec

/** №192 knn_store_delete: the delete-wave contracts — the manifest rows
  * genuinely served pre-delete (the drill is not vacuous), each touched
  * cell flips atomically (even cells read 0 manifest rows at the mid-delete
  * serve while odd cells hold their full pre-delete count — never a torn
  * cell), nothing resurrects after the post-delete arrival append, the
  * rewrite bill is delta-sized, and no served result ever carries a
  * manifest id once its cell's wave has committed. */
class StoreDeleteSpec extends SparkSpec {

  private lazy val run = VectorQueries.knnStoreDeleteDetail(spark, sf)
  private lazy val rows = run._1.collect()
  private lazy val detail = run._2
  private def inManifest(id: Long): Boolean =
    id % VectorQueries.DelMod == VectorQueries.DelRes &&
      id % VectorQueries.CalMod != 1L

  test("the manifest rows genuinely serve pre-delete") {
    val s0Served = rows.filter(_.getLong(0) == 0L).map(_.getAs[Long]("vec_id"))
    assert(s0Served.exists(inManifest),
      "no manifest row in any S0 top-k — the delete drill is vacuous")
    assert(rows.filter(_.getLong(0) == 0L).head.getLong(2) > 0)
  }

  test("mid-delete: every touched cell is atomically old or new, never torn") {
    val pre = detail.delByCell(0)
    val mid = detail.delByCell(1)
    assert(detail.touchedCells.toSet === pre.keySet)
    detail.touchedCells.foreach { c =>
      if (c % 2 == 0) assert(!mid.contains(c), s"even cell $c still holds manifest rows mid-delete")
      else assert(mid.get(c).contains(pre(c)), s"odd cell $c lost rows before its wave")
    }
  }

  test("post-delete and post-append: nothing survives, nothing resurrects") {
    assert(detail.delByCell(2).isEmpty)
    assert(detail.delByCell(3).isEmpty)
    Seq(2L, 3L).foreach { s =>
      val served = rows.filter(_.getLong(0) == s).map(_.getAs[Long]("vec_id"))
      assert(!served.exists(inManifest), s"stage $s serves a deleted id")
    }
    // at S1, no EVEN-cell manifest row serves (its wave committed)
    val manifestCellsEven = detail.touchedCells.filter(_ % 2 == 0).toSet
    if (manifestCellsEven.nonEmpty) {
      val s1 = rows.filter(_.getLong(0) == 1L)
      assert(s1.head.getLong(2) === detail.delByCell(0)
        .filter { case (c, _) => c % 2 == 1 }.values.sum)
    }
  }

  test("the rewrite bill is delta-sized: only touched cells' survivors") {
    val pre = detail.delByCell(0)
    // bill = rows in touched cells minus the deleted ones; strictly less
    // than the store (delete must never rewrite the world)
    val s0Rows = rows.filter(_.getLong(0) == 0L).head.getLong(1)
    assert(detail.rewrittenRows < s0Rows,
      s"rewrite bill ${detail.rewrittenRows} not delta-sized vs store $s0Rows")
    assert(detail.rewrittenRows >= 0)
    // every emptied cell was a touched cell whose rows were all deleted
    detail.emptiedCells.foreach(c => assert(pre.contains(c)))
  }
}
