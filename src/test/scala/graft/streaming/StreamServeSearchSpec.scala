package graft.streaming

import graft.SparkSpec

/** №176 stream_serve_search: the interleaved serving contracts the
  * oracle's closed form rides on — the replay genuinely crossed
  * micro-batches, every batch carried arrivals, the interleaving is not
  * vacuous (late arrivals change a served result), and the superset
  * invariant holds (a completed batch can only improve the top-1). */
class StreamServeSearchSpec extends SparkSpec {

  test("search-per-batch: ≥3 real batches, arrivals reach the top-k, top-1 never regresses") {
    val (df, census) = StreamServeSearch.streamServeSearchWithCensus(spark, sf)
    val out = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(census.batches >= 3,
      s"only ${census.batches} data micro-batches — the serving never interleaved")
    val sizes = census.batchSizes.toMap
    assert(sizes.keySet == Set(0L, 1L, 2L) && sizes.values.forall(_ > 0L),
      s"batch arrival sizes $sizes — a band landed empty")
    val bands = out.map(_._1).distinct.sorted.toSeq
    assert(bands == Seq(0L, 1L, 2L))
    // non-vacuous: a later batch's arrival changed some served row
    def slice(b: Long) = out.filter(_._1 == b).map(t => (t._2, t._3) -> t._4).toMap
    val (s0, s2) = (slice(0L), slice(2L))
    assert(s0.keySet == s2.keySet)
    assert(s0.exists { case (k, v) => s2(k) != v },
      "no served row changed across batches — arrivals never reached the top-k")
    // superset invariant: per query, the served top-1 cosine is monotone
    // non-decreasing in the batch prefix (candidates only accumulate)
    val top1 = out.filter(_._3 == 1L).groupBy(_._2)
    top1.foreach { case (q, rows) =>
      val byBand = rows.sortBy(_._1).map(_._5).toSeq
      byBand.sliding(2).foreach { w =>
        assert(w(1) >= w(0), s"query $q: top-1 cosine regressed across a batch (${w(0)} -> ${w(1)})")
      }
    }
  }

  test("№184 file-backed serving path: row-identical to the buffered path, store grows per batch") {
    val buffered = StreamServeSearch.streamServeSearch(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    val (fileDf, census) = StreamServeSearch.streamServeSearchFilesWithCensus(spark, sf)
    val fileBacked = fileDf.collect()
      .map(_.toString).sorted.toSeq
    // the access path changes, the answer must not: prefix visibility is
    // access-path-independent (the two rows share one oracle)
    assert(fileBacked == buffered,
      s"file-backed serving diverged from the driver-buffer path " +
        s"(${fileBacked.size} vs ${buffered.size} rows)")
    // the store is REAL: every batch appended files, counts monotone, and
    // the serve read them back (inputFiles counted at serve time)
    val fc = census.servedFiles
    assert(fc.map(_._1) == Seq(0L, 1L, 2L), s"served file counts $fc — batches missing")
    assert(fc.forall(_._2 > 0), s"a serve saw an empty store: $fc")
    fc.map(_._2).sliding(2).foreach { w =>
      assert(w(1) > w(0), s"store file count did not grow across a batch: $fc")
    }
  }
}
