package graft.queries

import graft.SparkSpec

/** №223 epoch_resume: exactly-once resume from the per-shard checkpoint
  * vector (no repeats, no skips, positions contiguous past the
  * checkpoint) and the epoch-seeded reshuffle (same multiset, measured
  * decorrelation). */
class EpochResumeSpec extends SparkSpec {

  private lazy val rows = PipelineQueries.epochResume(spark, sf).collect()
  private lazy val e0 = rows.filter(_.getLong(0) == 0L)
  private lazy val e1 = rows.filter(_.getLong(0) == 1L)
  private def key(r: org.apache.spark.sql.Row) = (r.getLong(3), r.getLong(4))

  test("resume is exactly-once: remainder ⊎ consumed = the epoch, disjoint") {
    val r = rows.head
    assert(e0.length.toLong === r.getAs[Long]("n_remaining"))
    assert(e1.length.toLong === r.getAs[Long]("n_consumed") + r.getAs[Long]("n_remaining"),
      "epoch 1 is the full multiset — consumed + remaining must cover it")
    assert(r.getAs[Long]("n_consumed") > 0L, "no shard had consumed anything — the resume is vacuous")
    // remainder keys are a strict subset of the epoch's keys, no duplicates
    val remKeys = e0.map(key)
    assert(remKeys.distinct.length === remKeys.length)
    assert(remKeys.toSet.subsetOf(e1.map(key).toSet))
  }

  test("per shard, the remainder is the contiguous tail past the checkpoint") {
    val byShard = e0.groupBy(_.getInt(1))
    // mixed progress: some shard fully unconsumed, some part-read
    assert(byShard.values.exists(_.nonEmpty))
    byShard.foreach { case (s, rs) =>
      val ps = rs.map(_.getLong(2)).sorted
      assert(ps.zip(ps.tail).forall { case (a, b) => b == a + 1 },
        s"shard $s's remainder has a position gap — a sequence was skipped")
    }
    // shard % 4 == 0 shards consumed nothing: their remainder starts at pos 1
    val untouched = byShard.filter { case (s, _) => s % 4 == 0 }
    assert(untouched.nonEmpty && untouched.values.forall(_.map(_.getLong(2)).min == 1L),
      "a 0%-progress shard lost its head — resume must re-read it in full")
  }

  test("the next epoch is the same multiset, decorrelated and measured") {
    val r = rows.head
    val moved = r.getAs[Long]("n_moved_shards")
    assert(moved * 8 > e1.length.toLong * 7,
      s"only $moved of ${e1.length} sequences changed shard — the reshuffle barely decorrelates")
    // within a shard, epoch-1 order differs from epoch-0 order for the
    // keys they share (the hash actually has the epoch in it)
    val p0 = e1.map(k => key(k)).toSet // all keys
    assert(p0.size === e1.length, "epoch 1 duplicated a sequence")
  }
}
