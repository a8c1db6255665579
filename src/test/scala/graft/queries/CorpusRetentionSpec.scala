package graft.queries

import graft.SparkSpec

/** №201 corpus_retention: the cross-store freshness contracts — the
  * incoherent middle state (text aged, vector not) is measured: dedup
  * loses every base-partner pair while base docs still serve from
  * retrieval; the coherent window restores the invariant (no served doc
  * outside the window); every text miss and vector loss classifies to
  * exactly the aged-out generation; the stores' generation directories
  * really leave the disk in the drill's order. */
class CorpusRetentionSpec extends SparkSpec {

  private lazy val run = CorpusRetention.corpusRetentionDetail(spark, sf)
  private lazy val byStage = run._1.collect().groupBy(_.getLong(0).toInt)
  private lazy val detail = run._2
  private def census(s: Int, i: Int): Long = byStage(s).head.getLong(i)
  private def cls(id: Long): Long = id % HashDedup.IncCalMod
  private def isBase(id: Long): Boolean = !Set(1L, 2L, 3L).contains(cls(id))
  private def partnerOf(p: (Long, Long)): Long = if (cls(p._1) == 3L) p._2 else p._1

  test("the incoherent state: dedup blind to base partners, base docs still serving") {
    assert(detail.hitPairs(0).exists(p => isBase(partnerOf(p))),
      "stage 0 must find base-partner pairs — the drill is not vacuous")
    assert(census(0, 6) > 0, "base docs must serve at stage 0")
    assert(detail.hitPairs(1).forall(p => !isBase(partnerOf(p))),
      "after the text age-out no base-partner pair is findable")
    assert(census(1, 6) === census(0, 6) && census(1, 2) === census(0, 2),
      "the vector store must be untouched at the incoherent stage — the staleness leak")
  }

  test("the coherent window restores the invariant") {
    assert(census(2, 6) === 0L && census(3, 6) === 0L)
    detail.topk(2).foreach { case (_, d) => assert(Set(1L, 2L).contains(cls(d))) }
    detail.topk(3).foreach { case (_, d) => assert(cls(d) == 2L) }
  }

  test("losses classify to exactly the aged generation on both sides") {
    assert(detail.hitPairs(1) === detail.hitPairs(2),
      "stages 1 and 2 share the text window — text hits identical")
    val textLost = detail.hitPairs(0) -- detail.hitPairs(1)
    assert(textLost.nonEmpty && textLost.forall(p => isBase(partnerOf(p))))
    val vecLost2 = detail.topk(0) -- detail.topk(2)
    assert(vecLost2.nonEmpty && vecLost2.forall { case (_, d) => isBase(d) })
    val kept2 = detail.topk(2).intersect(detail.topk(0))
    assert((kept2 -- detail.topk(3)).forall { case (_, d) => cls(d) == 1L })
  }

  test("generation directories leave both stores in the drill's order") {
    assert(detail.ixGens(0) === Seq("gen=0", "gen=1", "gen=2") &&
      detail.vecGens(0) === Seq("gen=0", "gen=1", "gen=2"))
    assert(detail.ixGens(1) === Seq("gen=1", "gen=2") &&
      detail.vecGens(1) === Seq("gen=0", "gen=1", "gen=2"), "stage 1 is text-aged only")
    assert(detail.ixGens(2) === Seq("gen=1", "gen=2") &&
      detail.vecGens(2) === Seq("gen=1", "gen=2"))
    assert(detail.ixGens(3) === Seq("gen=2") && detail.vecGens(3) === Seq("gen=2"))
  }
}
