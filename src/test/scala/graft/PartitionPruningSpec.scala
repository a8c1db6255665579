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
}
