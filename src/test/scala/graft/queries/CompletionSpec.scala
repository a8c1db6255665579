package graft.queries

import graft.SparkSpec
import graft.kv.KvModel
import org.apache.spark.sql.functions._

/** Every verdict branch of the export-completion lifecycle (reference
  * precedence: DynamoDBExportStatusService.kt:162-165 — successful set
  * first, then Exporting → IN_PROGRESS, then Export_Failed →
  * COMPLETED_UNSUCCESSFULLY, else NOT_COMPLETED). The driver oracle covers
  * COMPLETED_SUCCESSFULLY (export_completion, incl. Table_Unavailable and
  * Blocked_Topic counting as successful) and COMPLETED_UNSUCCESSFULLY
  * (export_completion_failed); this spec pins the remaining branches and
  * the precedence ordering between them.
  */
class CompletionSpec extends SparkSpec {

  private def verdict(statusFor: org.apache.spark.sql.Column): String =
    ExportQueries.completionWith(spark, sf, statusFor)
      .select(col("job_completion")).head.getString(0)

  private def statuses(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select(col("topic"), col("status")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("default lifecycle: Table_Unavailable + Blocked_Topic count as successful") {
    val df = ExportQueries.exportCompletion(spark, sf)
    val st = statuses(df)
    // configured-but-absent tables surface, with zero files/records
    assert(st("database0.collection4") == "Table_Unavailable")
    assert(KvModel.BlockedTopics.forall(st(_) == "Blocked_Topic"))
    assert(st("data.equality") == "Exported")
    val unavailable = df.filter(col("status") === "Table_Unavailable")
      .select(col("files_exported"), col("records_exported")).collect()
    assert(unavailable.nonEmpty && unavailable.forall(r => r.getLong(0) == 0 && r.getLong(1) == 0))
    assert(verdict(ExportQueries.defaultTopicStatus) == "COMPLETED_SUCCESSFULLY")
  }

  test("any Export_Failed and no Exporting → COMPLETED_UNSUCCESSFULLY") {
    val df = ExportQueries.exportCompletionFailed(spark, sf)
    assert(statuses(df)(ExportQueries.FailedTopic) == "Export_Failed")
    assert(df.select(col("job_completion")).head.getString(0) == "COMPLETED_UNSUCCESSFULLY")
  }

  test("Exporting takes precedence over Export_Failed → IN_PROGRESS") {
    val st = when(col("topic") === "database1.collection0", "Exporting")
      .when(col("topic") === ExportQueries.FailedTopic, "Export_Failed")
      .otherwise(ExportQueries.defaultTopicStatus)
    assert(verdict(st) == "IN_PROGRESS")
  }

  test("a status outside every known set → NOT_COMPLETED fallback") {
    val st = when(col("topic") === "database1.collection0", "Cancelled")
      .otherwise(ExportQueries.defaultTopicStatus)
    assert(verdict(st) == "NOT_COMPLETED")
  }
}
