package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №189 knn_res_calendar: the residual store's full-lifecycle serving
  * contracts — the per-stage census closed form, the v0-arrivals-next-
  * to-v1-copies gain-cell interaction being genuinely exercised (the
  * corner №186's single-night repair cannot see), version pairing being
  * load-bearing at the mid-repair serve, the no-lost-candidate overlap
  * theorem, and arrivals served the batch they land. */
class ResCalendarSpec extends SparkSpec {

  test("census closed form, gain-cell v0/v1 cohabitation, pairing load-bearing, overlap theorem") {
    val (df, census) = VectorQueries.knnResCalendarWithCensus(spark, sf)
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    // corpus splits recomputed independently of the query
    val v = graft.Tables(spark, sf).embeddings
      .filter(col("vec_id") >= VectorQueries.NQueries)
    def n(pred: org.apache.spark.sql.Column) = v.filter(pred).count()
    val m = col("vec_id") % VectorQueries.CalMod
    val nBase = n(!m.isin(1L, 2L, 3L))
    val nA1 = n(m === 1L); val nA2 = n(m === 2L); val nA3 = n(m === 3L)
    assert(nA3 == census.nArr3)
    // per-stage store census: rows/vecs/v1 — the exact calendar algebra
    val cens = out.map(t => t._1 -> (t._2, t._3, t._4)).distinct.toMap
    assert(cens.keySet == (0L to 5L).toSet, s"stages served: ${cens.keySet}")
    val cur = nBase + nA1 + nA2
    assert(cens(0L) == ((nBase, nBase, 0L)), s"S0 census ${cens(0L)}")
    assert(cens(1L) == ((nBase + nA1, nBase + nA1, 0L)), s"S1 census ${cens(1L)}")
    assert(cens(2L) == ((cur, cur, 0L)), s"S2 census ${cens(2L)}")
    assert(cens(3L) == ((cur + census.nStale, cur, census.nStale)),
      s"S3 census ${cens(3L)} — the overlap window must hold old AND new copies")
    assert(cens(4L) == ((cur, cur, census.nStale)), s"S4 census ${cens(4L)}")
    assert(cens(5L) == ((cur + nA3, cur + nA3, census.nStale + nA3)), s"S5 census ${cens(5L)}")
    // the №186-invisible interaction genuinely exercised: at S3 some
    // gain cell holds same-night v0 ARRIVAL rows next to v1 copies
    assert(census.gainCells.nonEmpty && census.nStale > 0)
    assert(census.v0ArrivalRowsInGainCells > 0,
      "no gain cell held a v0 arrival row at S3 — the composition corner was not exercised")
    // version pairing is LOAD-BEARING mid-repair: forcing every row
    // through the v0 decode changes the S3 shortlist
    assert(census.midRepairShortlist.nonEmpty)
    assert(census.midRepairShortlist.toSet != census.midRepairShortlistV0Forced.toSet,
      "v0-forced decode produced the same mid-repair shortlist — version pairing vacuous here")
    // no-lost-candidate overlap theorem: S3's membership ⊇ S4's under
    // the same router, so the exact-rescored top-1 can only fall S3→S4
    val top1 = out.filter(_._6 == 1L).map(t => (t._1, t._5) -> t._8).toMap
    val qs = out.map(_._5).distinct
    qs.foreach { q =>
      assert(top1((3L, q)) >= top1((4L, q)),
        s"query $q: top-1 improved S3→S4 (${top1((3L, q))} -> ${top1((4L, q))}) — a candidate was lost mid-repair")
    }
    // arrivals are served the batch they land: some served row changes
    // S0→S1 (night 1 reached the top-k) and S4→S5 (night 3 did)
    def slice(s: Long) = out.filter(_._1 == s).map(t => (t._5, t._6) -> t._7).toMap
    assert(slice(0L) != slice(1L), "night-1 arrivals never changed a served row")
    assert(slice(4L) != slice(5L), "night-3 arrivals never changed a served row")
  }
}
