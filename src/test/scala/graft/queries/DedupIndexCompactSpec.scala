package graft.queries

import graft.SparkSpec

/** №215 dedup_index_compact: the write-then-drop compaction contracts on
  * the banded index — the mid state is double-visible in `n_rows` only
  * (distinct membership, candidates and hits never move), the source
  * generations' file spray collapses into the consolidated generation,
  * gen 0 is bit-untouched, and the post-compaction append path works. */
class DedupIndexCompactSpec extends SparkSpec {

  private lazy val run = HashDedup.dedupIndexCompactDetail(spark, sf)
  private lazy val byStage = run._1.collect().map(r => r.getLong(0).toInt -> r).toMap
  private lazy val detail = run._2

  test("mid state inflates n_rows by exactly the consolidated bill; nothing else moves") {
    assert(byStage(1).getLong(1) - byStage(0).getLong(1) === detail.rewrittenRows,
      "S1 carries the source gens AND the consolidated copy")
    assert(byStage(2).getLong(1) === byStage(0).getLong(1), "post-drop census restored")
    Seq(0, 1, 2).foreach { s =>
      assert(byStage(s).getLong(2) === byStage(0).getLong(2), s"n_distinct moved at S$s")
      assert(byStage(s).getLong(4) === byStage(0).getLong(4), s"candidates moved at S$s")
      assert(byStage(s).getLong(6) === byStage(0).getLong(6), s"hits moved at S$s")
    }
    assert(detail.hitPairs(0).nonEmpty)
    assert(detail.hitPairs(1) === detail.hitPairs(0) && detail.hitPairs(2) === detail.hitPairs(0),
      "the served pairs are identical through the whole compaction")
  }

  test("the file spray collapses; gen 0 is bit-untouched; lookups never move") {
    assert(detail.filesByGen(0)("gen=1") === 6 && detail.filesByGen(0)("gen=2") === 6,
      "the small-files storm is real: 3 appends x 2 files per generation")
    assert(detail.filesByGen(1).contains("gen=10"), "consolidated gen lands BEFORE the drop")
    assert(detail.filesByGen(1).contains("gen=1"), "sources still serving mid-compaction")
    assert(!detail.filesByGen(2).contains("gen=1") && !detail.filesByGen(2).contains("gen=2"))
    assert(detail.filesByGen(2)("gen=10") === 2, "12 source files became 2")
    assert(detail.gen0Before === detail.gen0After, "gen 0 files must be bit-identical")
    Seq(0, 1, 2, 3).foreach(s => assert(byStage(s).getLong(3) === byStage(0).getLong(3),
      "the lookup bill is stage-independent"))
  }

  test("the next night appends next to the compacted layout") {
    assert(byStage(3).getLong(1) > byStage(2).getLong(1), "gen 3 landed")
    // NB: night-3↔night-3 τ-true pairs cannot exist on this corpus (the
    // dupCorpus offsets shift cls by +1/+2: a cls-3 doc's copies are cls
    // 4/5), so S3's contract is the append path itself — the index grew,
    // and NOT ONE pre-compaction hit moved
    assert(detail.hitPairs(3) === detail.hitPairs(0),
      "hits through the append are exactly the pre-compaction hits")
  }
}
