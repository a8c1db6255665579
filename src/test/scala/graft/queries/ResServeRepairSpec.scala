package graft.queries

import graft.SparkSpec

/** №186 knn_res_serve_repair: the version-pairing protocol contracts —
  * the store census tracks the add-then-remove phases exactly (S1 holds
  * both copies of every stale row, n_vecs constant throughout), the torn
  * decode is a REAL hazard (wrong distances measured > 0 whenever the
  * drifted traffic probes a repaired cell), and the paired serve is
  * immune to it by construction. */
class ResServeRepairSpec extends SparkSpec {

  test("census tracks the phases; version mixing present; torn decode measured, paired serve exact") {
    val out = VectorQueries.knnResServeRepair(spark, sf).collect()
    def gl(r: org.apache.spark.sql.Row, c: String) = r.getAs[Long](c)
    val stages = out.map(gl(_, "stage")).distinct.sorted.toSeq
    assert(stages == Seq(0L, 1L, 2L))
    val nTotal = gl(out.head, "n_total"); val nStale = gl(out.head, "n_stale")
    assert(nStale > 0 && nStale < nTotal, s"stale set degenerate ($nStale of $nTotal)")
    def census(s: Long): (Long, Long) = {
      val rows = out.filter(gl(_, "stage") == s)
      (gl(rows.head, "n_rows"), gl(rows.head, "n_vecs"))
    }
    // S0: one copy each; S1: stale rows exist TWICE (old v0 + fresh v1 —
    // the overlap, mixed versions inside hot cells); S2: back to one copy
    assert(census(0L) == ((nTotal, nTotal)), s"S0 census ${census(0L)}")
    assert(census(1L) == ((nTotal + nStale, nTotal)),
      s"S1 census ${census(1L)} != (total+stale, total) — the gain phase lost or duplicated rows")
    assert(census(2L) == ((nTotal, nTotal)),
      s"S2 census ${census(2L)} — the loss phase left overlap copies or dropped a vector")
    // every stage serves full top-K per query (no query starved mid-repair)
    for (s <- stages; q <- out.map(gl(_, "q_id")).distinct) {
      val ranks = out.filter(r => gl(r, "stage") == s && gl(r, "q_id") == q)
        .map(gl(_, "rank")).sorted.toSeq
      assert(ranks == (1L to VectorQueries.K), s"stage $s query $q ranks $ranks")
    }
    // the torn decode is a real, measured hazard: wrong distances occur
    // (the drifted traffic probes repaired cells), and every wrong
    // distance is a row the version pairing protected — if this is ever
    // 0, the row's reason to exist needs re-measuring
    val tornAdc = gl(out.head, "torn_adc_diverged")
    assert(tornAdc > 0, "torn decode diverged nowhere — drifted traffic no longer probes repaired cells")
    // shortlist divergence is the stronger (corpus-dependent) symptom;
    // it can be 0 at tiny scale, but can never exceed the distance count
    val tornSl = gl(out.head, "torn_shortlist_diff")
    assert(tornSl >= 0 && tornSl <= 2 * tornAdc, s"torn shortlist diff $tornSl vs adc $tornAdc")
  }
}
