package graft.queries

import graft.SparkSpec

/** №202 corpus_backfill: the cross-store at-least-once contracts — both
  * serves idempotent through every storm phase, the partial storm makes
  * the cross-store reconciliation DISAGREE (text night 2×, vector 1×),
  * the symmetric storm makes it agree-and-be-wrong (both 2× — only the
  * distinct censuses, flat throughout, catch that), and the repairs are
  * bounded (text reads exactly 2× one night; untouched vector buckets
  * keep their files). */
class CorpusBackfillSpec extends SparkSpec {

  private lazy val run = CorpusBackfill.corpusBackfillDetail(spark, sf)
  private lazy val byStage = run._1.collect().groupBy(_.getLong(0).toInt)
  private lazy val detail = run._2
  private def census(s: Int, i: Int): Long = byStage(s).head.getLong(i)

  test("both serves are idempotent through every storm phase") {
    Seq(1, 2, 3).foreach { s =>
      assert(detail.candPairs(s) === detail.candPairs(0), s"text candidates differ at stage $s")
      assert(detail.topk(s) === detail.topk(0), s"vector top-k differs at stage $s")
    }
    assert(byStage.values.map(_.head.getLong(4)).toSet.size === 1, "n_cand must never move")
  }

  test("partial storm: reconciliation disagrees; symmetric storm: agrees and is wrong") {
    val ixNight = census(0, 2); val vecNight = census(0, 6)
    assert(census(1, 2) === 2 * ixNight && census(1, 6) === vecNight,
      "the partial storm doubles only the text night — the cross-store alarm fires")
    assert(census(2, 2) === 2 * ixNight && census(2, 6) === 2 * vecNight,
      "the symmetric storm doubles both — the cross-store diff is silent")
    // the meter that catches BOTH: distinct censuses never move
    assert(byStage.values.map(_.head.getLong(3)).toSet.size === 1)
    assert(byStage.values.map(_.head.getLong(7)).toSet.size === 1)
    assert(census(3, 2) === ixNight && census(3, 6) === vecNight, "repairs restore the truth")
  }

  test("repairs are bounded to the night") {
    assert(detail.ixRepairRead === 2 * census(0, 2),
      "the text repair must read exactly the stormed generation — 2x one night of band rows")
    assert(detail.untouchedFilesAfter === detail.untouchedFilesBefore,
      "vector buckets without night rows must keep their exact files")
  }
}
