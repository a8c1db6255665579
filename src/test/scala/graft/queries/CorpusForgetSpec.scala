package graft.queries

import graft.SparkSpec

/** №198 corpus_forget: the cross-store right-to-be-forgotten contracts —
  * the manifest genuinely lives in both stores pre-forget, the
  * single-store state LEAKS (index clean, vector store still serving
  * forgotten docs — the measured stage, not a narrated hazard), the
  * completed forget holds through the nightly append in BOTH stores, and
  * the forget changes the dedup decision itself (the post-forget dup set
  * is contained in the pre-forget control). */
class CorpusForgetSpec extends SparkSpec {

  private lazy val run = CorpusForget.corpusForgetDetail(spark, sf)
  private lazy val byStage = run._1.collect().groupBy(_.getLong(0).toInt)
  private lazy val detail = run._2
  private def census(s: Int, i: Int): Long = byStage(s).head.getLong(i)

  test("pre-forget: the manifest lives in both stores and serves") {
    assert(detail.manifest.nonEmpty)
    assert(census(0, 3) > 0 && census(0, 4) > 0, "manifest docs must be visible in both stores at S0")
    assert(detail.manifest.subsetOf(detail.ixDocs(0)))
    assert(detail.manifest.subsetOf(detail.vecDocs(0)))
    assert(census(0, 5) > 0, "a forgotten doc must sit in the served top-k — the leak meter is armed")
  }

  test("the single-store forget LEAKS: index clean, vector store still serving") {
    assert(census(1, 3) === 0L, "the index must be clean at S1")
    assert(census(1, 4) > 0, "the vector store must still hold the forgotten docs at S1")
    assert(census(1, 5) > 0, "forgotten docs must still be SERVED at S1 — the measured leak")
    assert(detail.manifest.forall(d => !detail.ixDocs(1).contains(d)))
    assert(detail.manifest.subsetOf(detail.vecDocs(1)))
  }

  test("the completed forget holds through the nightly append in both stores") {
    Seq(2, 3).foreach { s =>
      assert(census(s, 3) === 0L && census(s, 4) === 0L && census(s, 5) === 0L, s"stage $s not clean")
      assert(detail.manifest.forall(d =>
        !detail.ixDocs(s).contains(d) && !detail.vecDocs(s).contains(d)),
        s"a forgotten doc resurfaced at stage $s")
    }
    // the night really landed: survivors appear in both stores
    assert(detail.vecDocs(3).size > detail.vecDocs(2).size)
    assert(census(3, 6) === detail.postDups.size.toLong)
  }

  test("the forget changes the dedup decision: post-forget dups ⊆ pre-forget control") {
    assert(detail.postDups.subsetOf(detail.preDups),
      "removing index rows can only shrink the dup set")
    val freed = detail.preDups -- detail.postDups
    // billed, whichever way the corpus lands: freed docs (batch docs whose
    // every near-dup partner was forgotten) must now SERVE from the store
    freed.foreach(d => assert(detail.vecDocs(3).contains(d),
      s"doc $d survived dedup post-forget but is missing from the vector store"))
    detail.postDups.foreach(d => assert(!detail.vecDocs(3).contains(d)))
  }
}
