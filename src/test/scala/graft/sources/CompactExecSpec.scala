package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №117 compact_exec — execution must land exactly the planned layout and
  * lose/duplicate nothing. */
class CompactExecSpec extends SparkSpec {
  import spark.implicits._

  test("compact_exec: measured file counts equal the plan's, corpus content preserved") {
    val rows = CompactExec.compactExec(spark, sf).collect()
    assert(rows.nonEmpty)
    val plan = graft.queries.Analytics.compactPlan(spark, sf)
      .select($"source", $"bin").as[(String, Long)].collect()
    val nSources = plan.map(_._1).distinct.length.toLong
    val nBins = plan.map(_._2).distinct.length.toLong
    assert(nBins < nSources, s"plan does not compact: $nBins bins for $nSources sources")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_files_before") == nSources,
        "small layout must land one file per source")
      assert(r.getAs[Long]("n_files_after") == nBins,
        "compacted layout must land one file per planned bin")
    }
    // nothing lost or duplicated: per-bin totals re-derive from the corpus
    val want = graft.Tables(spark, sf).documents
      .groupBy($"source").agg(count(lit(1)).as("n"), sum($"n_chars").as("b"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val binTotals = plan.groupBy(_._2).map { case (bin, ss) =>
      val per = ss.map(s => want(s._1))
      bin -> (ss.length.toLong, per.map(_._1).sum, per.map(_._2).sum)
    }
    rows.foreach { r =>
      val (ns, nd, nb) = binTotals(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n_sources") == ns && r.getAs[Long]("n_docs") == nd &&
        r.getAs[Long]("n_bytes") == nb,
        s"bin ${r.getAs[Long]("bin")}: compacted content diverges from the corpus")
    }
  }
}
