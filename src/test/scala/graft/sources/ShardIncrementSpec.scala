package graft.sources

import graft.SparkSpec

/** №220 shard_increment: the append-only shard generation — zero history
  * rewrites (every gen-0 file (size, mtime)-identical), supersede lines
  * resolved last-writer-wins, new positions past each shard's gen-0
  * maximum, and the read-amplification bill exact. */
class ShardIncrementSpec extends SparkSpec {

  private lazy val run = ShardIncrement.shardIncrementWithDetail(spark, sf)
  private lazy val rows = run._1.collect()
  private lazy val detail = run._2

  test("history is never rewritten: every gen-0 file survives bit-stable") {
    assert(detail.g0Before.nonEmpty)
    assert(detail.g0After.keySet === detail.g0Before.keySet,
      "a gen-0 file appeared or vanished during the increment")
    detail.g0Before.foreach { case (name, meta) =>
      assert(detail.g0After(name) === meta,
        s"gen-0 file $name changed (size, mtime) — history was rewritten")
    }
  }

  test("supersede lines resolve last-writer-wins; the raw bill is exact") {
    val r = rows.head
    val nSup = r.getAs[Long]("n_superseded")
    val nNew = r.getAs[Long]("n_new_lines")
    assert(nSup > 0L, "no boundary sequence superseded — the drill corner is vacuous")
    assert(nNew > 0L)
    // raw read-back = resolved + the superseded gen-0 stale lines
    assert(detail.rawLines === rows.length.toLong + nSup,
      "stale-line accounting drifted: raw lines ≠ resolved + superseded")
    // every key is unique after resolution, and a superseded key serves gen 1
    val byKey = rows.groupBy(r => (r.getAs[Long]("bin"), r.getAs[Long]("seq_id")))
    assert(byKey.values.forall(_.length == 1), "resolution left a duplicate key")
    assert(rows.count(_.getAs[Int]("gen") == 1).toLong === nSup + nNew)
  }

  test("new lines take positions strictly past their shard's gen-0 maximum") {
    // gen-0 resume offsets stay valid iff gen-1 NEW lines never collide
    // below the old maximum; supersedes deliberately reuse their old pos
    val g0MaxByShard = rows.filter(_.getAs[Int]("gen") == 0)
      .groupBy(_.getAs[Int]("shard"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("pos")).max }
    val gen1 = rows.filter(_.getAs[Int]("gen") == 1)
    val (sup, fresh) = gen1.partition { r =>
      g0MaxByShard.get(r.getAs[Int]("shard")).exists(_ >= r.getAs[Long]("pos"))
    }
    assert(fresh.nonEmpty)
    assert(sup.length.toLong <= rows.head.getAs[Long]("n_superseded"),
      "more low-position gen-1 lines than supersedes — a new line collided " +
        "below the gen-0 maximum")
  }

  test("the resolved view is the tail-append pack, docs included") {
    // every arrival doc serves exactly once; no doc vanished
    val served = rows.flatMap(_.getAs[String]("docs").split(",").map(_.toLong))
    assert(served.length === served.distinct.length, "a doc serves twice")
    val all = graft.Tables(spark, sf).documents
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(served.toSet === all, "the resolved view lost or invented docs")
  }
}
