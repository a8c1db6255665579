package graft.queries

import graft.SparkSpec

/** №112 cdc_merge — closed-form MERGE recomputation + the MERGE-semantics
  * invariants (delete removes, keep is untouched base, insert is
  * delta-only, update adds counts). */
class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  test("cdc_merge ≡ closed-form MERGE (keep/insert/update/delete)") {
    val ev = graft.Tables(spark, sf).events
      .select($"event_id", $"user_id", $"event_type", $"ts_ms")
      .as[(Long, Long, String, Long)].collect().toSeq
    def state(rows: Seq[(Long, Long, String, Long)]): Map[Long, (Long, Long, String)] =
      rows.groupBy(_._2).view.mapValues { es =>
        val last = es.maxBy(e => (e._4, e._1))
        (es.size.toLong, es.map(_._4).max, last._3)
      }.toMap
    val base = state(ev.filter(_._4 < ExportQueries.T1))
    val delta = state(ev.filter(e => e._4 >= ExportQueries.T1 && e._4 < ExportQueries.T2))
    val users = (base.keySet ++ delta.keySet).toSeq.sorted
    val expected = users.flatMap { u =>
      (base.get(u), delta.get(u)) match {
        case (_, Some((_, _, "error")))       => None // DELETE marker
        case (Some((n, ms, t)), None)         => Some((u, "keep", n, ms, t))
        case (None, Some((n, ms, t)))         => Some((u, "insert", n, ms, t))
        case (Some((bn, _, _)), Some((dn, dms, dt))) => Some((u, "update", bn + dn, dms, dt))
        case (None, None)                     => None
      }
    }
    val got = Analytics.cdcMerge(spark, sf)
      .as[(Long, String, Long, Long, String)].collect().toSeq
    assert(got == expected, "merge output must equal the closed-form MERGE")

    // invariants: tombstoned users absent; keep rows bit-identical to base
    val deleted = delta.collect { case (u, (_, _, "error")) => u }.toSet
    assert(got.forall(r => !deleted.contains(r._1)), "deleted user survived the merge")
    got.filter(_._2 == "keep").foreach { case (u, _, n, ms, t) =>
      assert(base(u) == ((n, ms, t)), s"keep row for $u drifted from base")
      assert(!delta.contains(u))
    }
    got.filter(_._2 == "insert").foreach { case (u, _, _, _, _) => assert(!base.contains(u)) }
    got.filter(_._2 == "update").foreach { case (u, _, n, _, _) =>
      assert(n == base(u)._1 + delta(u)._1, "update must add event counts")
    }
  }

  test("snapshot_diff ≡ closed-form version diff (every status class populated)") {
    val docs = graft.Tables(spark, sf).documents
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val v1 = docs.map { case (id, t) => id -> t }.toMap
    val v2 = docs.filter(_._1 % 13 != 0)
      .map { case (id, t) => id -> (if (id % 10 == 0) t + " v2" else t) }
      .++(docs.filter(_._1 % 17 == 0).map { case (id, t) => (id + 3000000L) -> (t + " new") })
      .toMap
    val statuses = (v1.keySet ++ v2.keySet).toSeq.map { id =>
      val st = (v1.get(id), v2.get(id)) match {
        case (Some(_), None) => "removed"
        case (None, Some(_)) => "added"
        case (Some(a), Some(b)) if a != b => "changed"
        case _ => "unchanged"
      }
      id -> st
    }
    val want = statuses.groupBy(_._2).view.mapValues { g =>
      (g.size.toLong, g.map(_._1).min, g.map(_._1).max)
    }.toMap
    assert(want.keySet == Set("removed", "added", "changed", "unchanged"),
      s"corpus must populate every status class: ${want.keySet}")
    val got = Analytics.snapshotDiff(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == want, s"diff mismatch: got $got want $want")
  }
}
