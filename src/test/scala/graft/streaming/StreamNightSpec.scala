package graft.streaming

import graft.SparkSpec

/** №203 stream_night: the streamed cross-store night's contracts — three
  * data micro-batches chain the dedup decision (batch-0 dups all have
  * base partners; later batches drop docs with NO base partner at all —
  * the sequential corner: only a mid-stream survivor append explains
  * those drops), survivors reach the vector store and dups never do, and
  * the serves see exactly the completed prefix. */
class StreamNightSpec extends SparkSpec {

  private lazy val run = StreamNight.streamNightWithCensus(spark, sf)
  private lazy val byBatch = run._1.collect().groupBy(_.getLong(0))
  private lazy val detail = run._2

  test("three data micro-batches; the decision chains") {
    assert(detail.batches === 3)
    assert(detail.dups(0L).forall(detail.baseTruthDocs.contains),
      "batch 0 can only near-dup against base — nothing else is indexed yet")
    val seqDrops = (detail.dups(1L) ++ detail.dups(2L)).filterNot(detail.baseTruthDocs.contains)
    assert(seqDrops.nonEmpty,
      "some later-batch dup must have NO base partner — dropped only because " +
        "an earlier micro-batch's survivor was appended mid-stream")
  }

  test("survivors serve, dups never, prefix visibility holds") {
    val allDups = detail.dups.values.flatten.toSet
    // Distributed census (r14 verdict 1): the operator bills these as
    // executor-side counts, never an O(store) id collect — the
    // cumulative dup set never reaches the store, and no doc from the
    // previous serve's file snapshot un-lands.
    Seq(0L, 1L, 2L).foreach { b =>
      assert(detail.dupsVisible(b) === 0L, s"a dup reached the vector store at batch $b")
      assert(detail.unlanded(b) === 0L,
        s"the store grows monotonically — a completed batch un-landed at batch $b")
    }
    // the dropped census is cumulative and matches the manifests
    val dropped = byBatch.map { case (b, rows) => b -> rows.head.getLong(3) }
    assert(dropped(0L) === detail.dups(0L).size.toLong)
    assert(dropped(2L) === allDups.size.toLong)
  }

  test("censuses grow with the surviving prefix") {
    val ix = byBatch.map { case (b, rows) => b -> rows.head.getLong(1) }
    val vec = byBatch.map { case (b, rows) => b -> rows.head.getLong(2) }
    assert(ix(0L) < ix(1L) && ix(1L) < ix(2L))
    assert(vec(0L) < vec(1L) && vec(1L) < vec(2L))
  }
}
