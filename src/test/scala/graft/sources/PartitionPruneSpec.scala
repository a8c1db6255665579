package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №115 partition_prune — the partitionBy(date) layout lever, with pruning
  * MEASURED from the executed scan's own metrics (the №60/№93 discipline:
  * a layout claim is a measured plan property, not an assertion). */
class PartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  /** One action, then every wanted metric from the EXECUTED scan copies —
    * a second collect() on the same Dataset resets metrics (withAction)
    * and the lazy driver metrics (numFiles/numPartitions, sent once at
    * partition listing) never re-send, reading back as 0. */
  private def scanMetrics(df: org.apache.spark.sql.DataFrame, names: String*): Map[String, Long] = {
    df.collect()
    // recurse through AQE query-stage leaves to the EXECUTED scan copies
    val scans = PartitionedLayout.fileScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, s"no file scan in plan:\n${df.queryExecution.executedPlan}")
    names.map(n => n -> scans.map(_.metrics(n).value).sum).toMap
  }

  test("partition_prune: date slice lists/reads ONLY the matching partition directories") {
    val root = PartitionedLayout.layoutDir(spark, sf)
    def part = spark.read.parquet(root.toString)
    val slice = part.filter($"date".isin(PartitionedLayout.SliceDates: _*))
    val full = part

    // file-listing level: the sliced scan's partition count is exactly the
    // slice's day count; the unsliced scan lists every day directory
    val sliceDays = PartitionedLayout.SliceDates.size.toLong
    val totalDays = part.select($"date").distinct().count()
    assert(totalDays > sliceDays, s"corpus has only $totalDays days — slice not selective")
    val sm = scanMetrics(slice, "numPartitions", "numFiles")
    assert(sm("numPartitions") == sliceDays,
      s"sliced scan listed ${sm("numPartitions")} partitions, want $sliceDays — pruning not engaged")
    assert(scanMetrics(full, "numPartitions")("numPartitions") == totalDays)
    // and the data IO follows the listing: one file per day directory
    assert(sm("numFiles") == sliceDays,
      "sliced scan opened files outside the matching directories")
  }

  test("partition_prune: layout never changes answers (vs the unpartitioned corpus)") {
    val got = PartitionedLayout.partitionPrune(spark, sf)
      .select($"date", $"n_events", $"n_users", $"n_clicks")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    val want = graft.Tables(spark, sf).events
      .withColumn("date", date_format($"ts_utc", "yyyy-MM-dd"))
      .filter($"date".isin(PartitionedLayout.SliceDates: _*))
      .groupBy($"date")
      .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("u"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("c"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty && got.sameElements(want),
      s"partitioned ${got.mkString(",")} != unpartitioned ${want.mkString(",")}")
  }

  test("partition_prune: pruning evidence columns carry the measured values") {
    val rows = PartitionedLayout.partitionPrune(spark, sf).collect()
    assert(rows.length == PartitionedLayout.SliceDates.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_partitions_read") == PartitionedLayout.SliceDates.size.toLong)
      assert(r.getAs[Long]("n_partitions_total") > r.getAs[Long]("n_partitions_read"))
      assert(r.getAs[Boolean]("pruned"))
    }
  }
}
