package graft.queries

/** №181 knn_res_rebalance: the residual-store model-repair contracts.
  * The oracle pins the served results and every bill column; this pins
  * the DESIGN claims — the delta is genuinely partial (re-encoding
  * strictly less than the store), the stale set is wider than the
  * movers alone (repair invalidates hot-cell STAYERS' codes — the
  * residual-specific cost a plain IVF rebalance never pays), the store
  * read-back equals a full re-encode exactly (incremental ≡ full,
  * proven from the files), and the repair genuinely changed codes. */
class ResRebalanceSpec extends graft.SparkSpec {

  test("delta re-encode ≡ full re-encode from the files; stale set partial but wider than movers; bills consistent") {
    val rows = VectorQueries.knnResRebalance(spark, sf).collect()
    assert(rows.length == VectorQueries.NQueries * VectorQueries.K,
      s"expected ${VectorQueries.NQueries * VectorQueries.K} served rows, got ${rows.length}")
    val r = rows.head
    def v(name: String): Long = r.getAs[Long](name)

    // incremental ≡ full, proven by the read-back multiset diff
    assert(v("n_store_diff") == 0, "delta store diverged from the full re-encode")
    // the delta is genuinely partial — the whole point of local repair
    assert(v("n_reenc") < v("n_total"),
      s"re-encoded ${v("n_reenc")} of ${v("n_total")} — the delta degenerated to a full re-encode")
    assert(v("n_repaired") == VectorQueries.RepairTop)
    // residual-specific: repair invalidates hot-cell stayers, not just
    // boundary crossers — the stale set must exceed the movers
    assert(v("n_moved") > 0, "no vector crossed a repaired boundary — drift unexercised")
    assert(v("n_reenc") > v("n_moved"),
      "stale set == movers: hot-cell stayers were not re-encoded (their centroid moved under them)")
    // bill consistency: rewritten partitions carry at least the stale
    // rows; everything written belongs to the store
    assert(v("rows_written") >= v("n_reenc") && v("rows_written") <= v("n_total"))
    assert(v("reenc_bill_ppm") == v("n_reenc") * 1000000L / v("n_total"))
    // the repair moved centroids enough to actually change codes
    assert(v("n_code_changed") > 0, "repair changed no codes — recentering was a no-op")
    assert(v("n_code_changed") <= v("n_reenc"))
    // served shape: every query returns exactly K ranked rows
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == VectorQueries.NQueries)
    byQ.values.foreach(g =>
      assert(g.map(_.getAs[Number]("rank").longValue).sorted.toSeq ==
        (1L to VectorQueries.K.toLong)))
  }
}
