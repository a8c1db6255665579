package graft

import org.apache.spark.sql.functions._

/** Source-format agnosticism: the same export pipeline over a JSON-lines
  * corpus produces byte-identical records to the parquet run. */
class SourceFormatSpec extends SparkSpec {

  test("export pipeline over a JSON-lines events corpus equals the parquet run") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonsrc").toString
    Tables(spark, sf).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(2)
      .write.mode("overwrite").json(s"$tmp/events.json")

    val fromParquet = queries.ExportQueries.exportRecords(spark, sf)
      .select("eid", "record", "manifest_line").collect().map(_.toSeq).toSet
    val fromJson = queries.ExportQueries.exportRecords(spark, tmp)
      .select("eid", "record", "manifest_line").collect().map(_.toSeq).toSet
    assert(fromJson == fromParquet)
  }

  test("export pipeline over an ORC events corpus equals the parquet run") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orcsrc").toString
    Tables(spark, sf).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(2)
      .write.mode("overwrite").orc(s"$tmp/events.orc")

    val fromParquet = queries.ExportQueries.exportRecords(spark, sf)
      .select("eid", "record", "manifest_line").collect().map(_.toSeq).toSet
    val fromOrc = queries.ExportQueries.exportRecords(spark, tmp)
      .select("eid", "record", "manifest_line").collect().map(_.toSeq).toSet
    assert(fromOrc == fromParquet)
    // pushdown carries over: the ORC scan advertises the ts predicate
    val plan = queries.ExportQueries.timeRangeScan(spark, tmp)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"ts predicate not pushed to ORC:\n$plan")
  }
}
