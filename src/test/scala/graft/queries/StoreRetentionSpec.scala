package graft.queries

import graft.SparkSpec

/** №197 knn_store_retention: the freshness-window contracts on the vector
  * store — the probe bill never depends on the window, the store shrinks
  * as generations age out (and the directories really leave the disk),
  * kept full-quality results are monotone in the window, and every lost
  * full-store top-k member's generation is exactly the aged-out one. */
class StoreRetentionSpec extends SparkSpec {

  private lazy val run = VectorQueries.knnStoreRetentionDetail(spark, sf)
  private lazy val rows = run._1.collect()
  private lazy val byWin = rows.map(r => r.getLong(0).toInt -> r).toMap
  private lazy val detail = run._2
  private def gen(id: Long): Long = id % VectorQueries.CalMod match {
    case 1L => 1L; case 2L => 2L; case _ => 0L
  }

  test("probe bill honest; store shrinks; gens leave the disk") {
    // r14 advice: the old assertion re-counted the one pre-serve probe
    // frame and could never fail. probeMatched is derived from each
    // window's OWN serve join: retention saves scan work (matched keys
    // never grow as generations age), never probes (matched ≤ issued,
    // and the full window matches every issued lookup on this corpus —
    // routing sends each probe to a cell that holds at least one row).
    assert(detail.probeMatched(3) === detail.probeIssued,
      "at the full window every issued lookup must find its cell populated")
    assert(detail.probeMatched(2) <= detail.probeMatched(3))
    assert(detail.probeMatched(1) <= detail.probeMatched(2))
    assert(detail.probeMatched.values.forall(_ <= detail.probeIssued))
    assert(byWin(1).getLong(1) < byWin(2).getLong(1) && byWin(2).getLong(1) < byWin(3).getLong(1))
    assert(detail.gensAfter(3).toSet === Set("gen=0", "gen=1", "gen=2"))
    assert(detail.gensAfter(2).toSet === Set("gen=1", "gen=2"))
    assert(detail.gensAfter(1).toSet === Set("gen=2"))
  }

  test("kept full-quality results: full at win=3, monotone below") {
    assert(byWin(3).getLong(2) === detail.topk(3).size.toLong,
      "at the full window every served row is a full-store top-k row")
    val kept2 = detail.topk(2).intersect(detail.topk(3))
    val kept1 = detail.topk(1).intersect(detail.topk(3))
    assert(byWin(2).getLong(2) === kept2.size.toLong)
    assert(byWin(1).getLong(2) === kept1.size.toLong)
    assert(kept1.subsetOf(kept2), "a member serving at win=1 must serve at win=2")
    assert(kept2.size < detail.topk(3).size,
      "aging the base generation must cost full-top-k members — the dial is not vacuous")
  }

  test("every lost full-top-k member's generation is exactly the aged-out one") {
    val lost2 = detail.topk(3) -- detail.topk(2)
    assert(lost2.forall { case (_, v) => gen(v) == 0L },
      s"win=2 losses must be base-generation members: $lost2")
    val kept2 = detail.topk(2).intersect(detail.topk(3))
    val lost1 = kept2 -- detail.topk(1)
    assert(lost1.forall { case (_, v) => gen(v) == 1L },
      s"win=1 losses must be night-1 members: $lost1")
    // and a visible full-top-k member ALWAYS re-ranks within k
    detail.topk(3).foreach { case (q, v) =>
      if (gen(v) == 2L) assert(detail.topk(1).contains((q, v)),
        s"($q,$v) is night-2 yet missing from the win=1 serve")
    }
  }
}
