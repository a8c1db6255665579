package graft

import org.apache.spark.sql.functions._

/** Hive-style partition layout + pruning: at 100 TB the events table would
  * be laid out by ingest date/type; a filter on the partition column must
  * prune directories at planning time (PartitionFilters), not scan+filter.
  */
class PartitionPruningSpec extends SparkSpec {

  test("filters on partition columns prune the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_parts").toString
    Tables(spark, sf).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$tmp/events_by_type")

    val df = spark.read.parquet(s"$tmp/events_by_type").filter(col("event_type") === "purchase")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter not pushed:\n$plan")

    // pruned read returns exactly the purchase slice
    val expected = Tables(spark, sf).events.filter(col("event_type") === "purchase").count()
    assert(df.count() == expected)
  }

  test("retention_sweep: survivors match the raw cutoff, boundary rewritten, younger partitions untouched") {
    import spark.implicits._
    val got = graft.sources.RetentionSweep.retentionSweep(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    // survivors recomputed from the raw events with the same cutoff
    val raw = Tables(spark, sf).events
      .select(date_format($"ts_utc", "yyyy-MM-dd").as("date"), $"ts_ms", $"event_type")
      .as[(String, Long, String)].collect().toSeq
    val kept = raw.filter(_._2 >= graft.sources.RetentionSweep.CutoffMs)
    val days = raw.map(_._1).distinct
    val b = graft.sources.RetentionSweep.BoundaryDate
    val expected = kept.groupBy(_._1).toSeq.map { case (d, rows) =>
      (d, rows.size.toLong, rows.count(_._3 == "click").toLong,
        days.count(_ < b).toLong, days.count(_ == b).toLong, days.count(_ > b).toLong, true)
    }.sortBy(_._1)
    assert(got == expected, "swept layout diverged from the raw-cutoff recomputation")
    // the boundary rewrite did real work: day 10 survives PARTIALLY
    val boundaryKept = got.find(_._1 == b).map(_._2).getOrElse(0L)
    val boundaryRaw = raw.count(_._1 == b).toLong
    assert(boundaryKept > 0 && boundaryKept < boundaryRaw,
      s"boundary day not bisected: kept=$boundaryKept of raw=$boundaryRaw")
    // expired days are GONE, younger partitions untouched (mtime evidence)
    assert(got.forall(_._1 >= b))
    assert(got.forall(_._7), "untouched_intact=false — the sweep rewrote a live partition")
  }
}
