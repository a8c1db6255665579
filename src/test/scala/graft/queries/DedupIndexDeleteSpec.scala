package graft.queries

import graft.SparkSpec

/** №196 dedup_index_delete: the right-to-be-forgotten contracts on the
  * banded index — the pre-delete serve genuinely pairs with manifest docs
  * (not vacuous), the mid-delete state is per-generation atomic (purged
  * generations read back zero manifest rows, the untouched one its full
  * count), the post-delete losses are EXACTLY the forgotten-partner pairs,
  * the night-3 append cannot resurrect, the lookup bill never moves, and
  * the rewrite bill is delta-sized. */
class DedupIndexDeleteSpec extends SparkSpec {

  private lazy val run = HashDedup.dedupIndexDeleteDetail(spark, sf)
  private lazy val byStage = run._1.collect().map(r => r.getLong(0).toInt -> r).toMap
  private lazy val detail = run._2
  private def cls(id: Long): Long = id % HashDedup.IncCalMod
  private def del(id: Long): Boolean =
    id % HashDedup.TxtDelMod == HashDedup.TxtDelRes && cls(id) != 3L
  private def partnerOf(p: (Long, Long)): Long = if (cls(p._1) == 3L) p._2 else p._1

  test("pre-delete serve pairs with manifest docs — the drill is not vacuous") {
    assert(byStage(0).getLong(2) > 0, "manifest rows must be visible at S0")
    assert(detail.hitPairs(0).exists(p => del(partnerOf(p))),
      "some S0 hit must have a forgotten partner")
  }

  test("mid-delete: generations atomically old or new, never torn") {
    val s0 = detail.delByGen(0); val s1 = detail.delByGen(1)
    assert(s0.keySet === Set(0, 1, 2), s"manifest docs must span all generations: $s0")
    assert(!s1.contains(0) && !s1.contains(2), s"purged gens must read back 0 manifest rows: $s1")
    assert(s1.get(1) === s0.get(1), "the untouched generation must read back its full count")
  }

  test("post-delete losses are exactly the forgotten-partner pairs; no resurrection") {
    assert(byStage(2).getLong(2) === 0L && byStage(3).getLong(2) === 0L)
    val lost = detail.hitPairs(0) -- detail.hitPairs(2)
    assert(lost.nonEmpty && lost.forall(p => del(partnerOf(p))),
      s"S0→S2 losses must all have forgotten partners: $lost")
    assert(detail.hitPairs(2).forall(p => !del(partnerOf(p))))
    assert(detail.hitPairs(3).forall(p => !del(p._1) && !del(p._2)),
      "the append must not resurrect a forgotten doc")
    // S3 ⊇ S2: appending night 3 only ADDS same-night visibility
    assert(detail.hitPairs(2).subsetOf(detail.hitPairs(3)))
  }

  test("bills: lookups stage-independent, rewrite delta-sized, gens intact") {
    assert(byStage.values.map(_.getLong(3)).toSet.size === 1,
      "the lookup bill must not depend on the stage")
    assert(detail.rewrittenRows < byStage(0).getLong(1),
      "the rewrite bill must be the surviving rows, never more than the store")
    assert(detail.gensAfter === Seq("gen=0", "gen=1", "gen=2", "gen=3"))
  }
}
