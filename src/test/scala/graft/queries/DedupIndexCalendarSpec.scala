package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №190 dedup_index_calendar: the persisted banded index's maintenance
  * calendar contracts — the mid-compaction serve is lossless (pair-identical
  * to post-compaction at exactly 2× the rows), the remove wave leaves only
  * the compacted + night-3 generations on disk, the nightly APPEND is
  * load-bearing (a static base-only index misses exactly the night-1-partner
  * pairs at S2), and the coverage theorem: the audit serve finds the union
  * of the nightly hits plus exactly the same-night pairs no probe-then-append
  * calendar can see at arrival time. */
class DedupIndexCalendarSpec extends SparkSpec {

  private lazy val run = HashDedup.dedupIndexCalendarDetail(spark, sf)
  private lazy val byStage = run._1.collect().map(r => r.getLong(0).toInt -> r).toMap
  private lazy val detail = run._2

  test("calendar emits the five serves with sane censuses") {
    assert(byStage.keySet == Set(1, 2, 3, 4, 5))
    (1 to 5).foreach { s =>
      val r = byStage(s)
      assert(r.getLong(5) <= r.getLong(4), s"stage $s: hits beyond truth")
      assert(r.getLong(5) <= r.getLong(3), s"stage $s: hits beyond candidates")
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1.0 + 1e-6)
      assert(r.getDouble(7) >= 0 && r.getDouble(7) <= 1.0 + 1e-6)
    }
    // the index grows night over night; the audit serve sees everything
    assert(byStage(1).getLong(1) < byStage(2).getLong(1))
    assert(byStage(4).getLong(1) < byStage(5).getLong(1))
  }

  test("the mid-compaction serve is lossless: pair-identical at exactly 2x the rows") {
    assert(byStage(3).getLong(1) === 2L * byStage(4).getLong(1),
      "add wave must double every index row")
    assert(detail.candPairs(3) === detail.candPairs(4),
      "candidates must dedup exactly through the doubled store")
    assert(byStage(3).getLong(5) === byStage(4).getLong(5))
    assert(detail.hitPairs(3) === detail.hitPairs(4))
  }

  test("the remove wave leaves only the compacted and night-3 generations") {
    assert(detail.finalGens === Seq("gen=3", "gen=9"))
  }

  test("the nightly append is load-bearing: a static index misses the night-1 partners at S2") {
    val tok = graft.CacheRegistry.track(TextQueries.dupCorpusTok(spark, sf).persist())
    val sh5 = TextQueries.shingleFrameOf(tok)
    val rows = graft.CacheRegistry.track(HashDedup.mpBaseRows(HashDedup.mpSigFrom(tok))
      .withColumn("cls", pmod(col("doc_id"), lit(HashDedup.IncCalMod.toLong))).persist())
    val baseRows = rows.filter(!col("cls").isin(1L, 2L, 3L))
      .select(col("doc_id"), col("band"), col("band_key"))
    val b2Keys = rows.filter(col("cls") === 2L)
      .select(col("doc_id"), col("band"), col("band_key"))
    val cand = b2Keys.as("a").join(baseRows.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b")).distinct()
    val staticHits = TextQueries.verifyPairsOf(sh5, cand)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val servedS2 = detail.hitPairs(2)
    def cls(id: Long): Long = id % HashDedup.IncCalMod
    // the static index can only see base partners
    assert(staticHits.subsetOf(servedS2))
    val missed = servedS2 -- staticHits
    assert(missed.nonEmpty, "no B1-partner pairs at S2 — the append proof is vacuous")
    assert(missed.forall { case (a, b) => cls(a) == 1L || cls(b) == 1L },
      s"static-index misses must all have a night-1 partner: $missed")
  }

  test("coverage theorem: audit = nightly union + exactly the same-night pairs") {
    val nightly = detail.hitPairs(1) ++ detail.hitPairs(2) ++ detail.hitPairs(4)
    val audit = detail.hitPairs(5)
    assert(nightly.subsetOf(audit),
      "the audit probes every batch key against the full index — it cannot lose a nightly hit")
    def cls(id: Long): Long = id % HashDedup.IncCalMod
    val leftover = audit -- nightly
    assert(leftover.forall { case (a, b) => cls(a) == cls(b) },
      s"audit-only hits must be same-night pairs (probe-then-append blindness): $leftover")
  }
}
