package graft.queries

import graft.SparkSpec

/** №193 dedup_index_retention: the TTL contracts — the lookup bill is
  * window-independent (retention saves storage and candidate work, never
  * probe keys), hits shrink monotonically with the window, every miss
  * introduced by an age-out has its partner in exactly the aged-out
  * generation, and the generation directories really leave the disk. */
class DedupIndexRetentionSpec extends SparkSpec {

  private lazy val run = HashDedup.dedupIndexRetentionDetail(spark, sf)
  private lazy val byWin = run._1.collect().map(r => r.getLong(0).toInt -> r).toMap
  private lazy val detail = run._2
  private def cls(id: Long): Long = id % HashDedup.IncCalMod

  test("bills and censuses: same lookups every window, shrinking index") {
    assert(byWin.keySet === Set(1, 2, 3))
    assert(byWin.values.map(_.getLong(2)).toSet.size === 1, "lookup bill must not depend on the window")
    assert(byWin(1).getLong(1) < byWin(2).getLong(1) && byWin(2).getLong(1) < byWin(3).getLong(1))
    // hits and candidates monotone in the window
    assert(byWin(1).getLong(6) <= byWin(2).getLong(6) && byWin(2).getLong(6) <= byWin(3).getLong(6))
    assert(byWin(1).getLong(3) <= byWin(2).getLong(3) && byWin(2).getLong(3) <= byWin(3).getLong(3))
  }

  test("every age-out miss has its partner in exactly the aged-out generation") {
    assert(detail.hitPairs(2).subsetOf(detail.hitPairs(3)))
    assert(detail.hitPairs(1).subsetOf(detail.hitPairs(2)))
    def partnerOf(p: (Long, Long)): Long = if (cls(p._1) == 3L) p._2 else p._1
    val agedBase = detail.hitPairs(3) -- detail.hitPairs(2)
    assert(agedBase.nonEmpty, "dropping the base generation must cost pairs — the dial is not vacuous")
    assert(agedBase.forall(p => !Set(1L, 2L, 3L).contains(cls(partnerOf(p)))),
      s"window-2 misses must have BASE partners: $agedBase")
    val agedB1 = detail.hitPairs(2) -- detail.hitPairs(1)
    assert(agedB1.forall(p => cls(partnerOf(p)) == 1L),
      s"window-1 misses must have night-1 partners: $agedB1")
  }

  test("the aged generations leave the disk") {
    assert(detail.gensAfter(3) === Seq("gen=0", "gen=1", "gen=2"))
    assert(detail.gensAfter(2) === Seq("gen=1", "gen=2"))
    assert(detail.gensAfter(1) === Seq("gen=2"))
  }
}
