package graft.queries

/** №178 knn_ivf_calendar: the file-level contracts of the composed
  * maintenance calendar that the driver row's relational columns can't
  * see. The oracle pins the bills and the multiset store diff; this
  * pins HOW the files got there: nightly appends only ever ADD files
  * (E0's files survive both append nights byte-identical), the model
  * change rewrites exactly the touched cells (untouched cells' files
  * survive the whole calendar), and the composition is genuinely
  * non-vacuous (movers, double-written arrival rows and overlap cells
  * all present, composed bill strictly under naive). */
class MaintenanceCalendarSpec extends graft.SparkSpec {

  test("appends never rewrite; rebalance rewrites exactly the touched cells; composed bill beats naive") {
    VectorQueries.captureCalendar = true
    val row =
      try VectorQueries.knnIvfCalendar(spark, sf).collect().head
      finally VectorQueries.captureCalendar = false
    val snaps = VectorQueries.lastCalendarFiles.toMap
    val touched = VectorQueries.lastCalendarTouched
    assert(snaps.keySet == Set("E0", "E2", "E3", "E4"), s"missing snapshots: ${snaps.keySet}")
    def cellOf(path: String): Long =
      "cell=(-?\\d+)".r.findFirstMatchIn(path).get.group(1).toLong

    // append contract: every E0 file survives to E2 with identical
    // size+mtime — the nightly bill touched NOTHING that already existed
    snaps("E0").foreach { case (f, meta) =>
      assert(snaps("E2").get(f).contains(meta), s"append night rewrote or dropped $f")
    }
    assert(snaps("E2").size > snaps("E0").size, "append nights added no files")

    // rebalance contract: untouched cells' files survive E2 → E3
    // byte-identical; touched cells' pre-rebalance files are gone
    snaps("E2").foreach { case (f, meta) =>
      if (!touched.contains(cellOf(f)))
        assert(snaps("E3").get(f).contains(meta), s"rebalance disturbed untouched-cell file $f")
      else
        assert(!snaps("E3").contains(f), s"rebalance left a stale pre-rewrite file $f")
    }
    // and E4's append preserves everything E3 had
    snaps("E3").foreach { case (f, meta) =>
      assert(snaps("E4").get(f).contains(meta), s"final append night rewrote $f")
    }

    // non-vacuous composition + the headline economics
    def v(name: String): Long = row.getAs[Long](name)
    assert(v("n_moved") > 0 && touched.nonEmpty, "rebalance moved nothing")
    assert(v("rearr_rows") > 0, "no arrival row was double-written — overlap unexercised")
    assert(v("overlap_cells") > 0, "no cell hit by both delta kinds")
    assert(v("rearr_rows") <= v("n_arr1") + v("n_arr2"))
    assert(v("composed_bill") < v("naive_bill"), "composed calendar did not beat naive")
    assert(v("n_store_diff") == 0, "final store diverged from the closed form")
    // bill identity: composed = both append nights + rebalance + final night
    assert(v("composed_bill") == v("n_arr1") + v("n_arr2") + v("rows_rebal") + v("n_arr3"))
  }
}
