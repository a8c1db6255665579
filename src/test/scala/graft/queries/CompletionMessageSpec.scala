package graft.queries

import graft.SparkSpec
import graft.kv.KvModel
import org.apache.spark.sql.functions._

/** №212 completion_message + №213 product_status: the export side-channel
  * behaviors as bounded frames (r14 verdict item 6) — the message decision
  * table of JobCompletionNotificationListener.kt and the product-status
  * state machine of DynamoDBProductStatusService.kt, pinned branch by
  * branch against the data-level model. */
class CompletionMessageSpec extends SparkSpec {

  private lazy val msgs = ExportQueries.completionMessage(spark, sf).collect()
  private def ofKind(k: String) = msgs.filter(_.getString(0) == k)

  test("one FIFO snapshot-sender message per exported object, group id topic-derived") {
    val perFile = ofKind("snapshot_sender")
    val nFiles = ExportQueries.exportCompletion(spark, sf)
      .agg(sum(col("files_exported"))).head.getLong(0)
    assert(perFile.length.toLong === nFiles,
      "S3StreamingWriter sends exactly one message per written object")
    assert(perFile.forall(_.getBoolean(2)), "snapshot-sender queue is FIFO")
    assert(perFile.forall(r => r.getString(3) == r.getString(4).replace(".", "_")),
      "messageGroupId = topic with '.' → '_'")
    assert(perFile.map(_.getString(5)).distinct.length === perFile.length,
      "object keys are unique — no double-send in the model")
  }

  test("no-files leg provably empty here; RIS message per completed topic with files") {
    assert(ofKind("no_files_exported").isEmpty,
      "every completed topic on this corpus exports ≥1 file")
    val ris = ofKind("data_egress_ris")
    val completed = ExportQueries.exportCompletion(spark, sf)
      .filter(col("status") === "Exported").collect()
    assert(ris.length === completed.length)
    assert(ris.forall(r => r.getString(5) == s"exports/${r.getString(4)}-"),
      "RIS key prefix is exportPrefix/topicName-")
    assert(ris.forall(!_.getBoolean(2)), "data-egress queue is NOT fifo")
  }

  test("failed-topic monitoring for every aborted run; job-level monitoring + ADG") {
    val failed = ofKind("topic_failed_monitoring").map(_.getString(4)).toSet
    assert(failed === (KvModel.BlockedTopics.toSet + "database0.collection4" +
      "database1.collection4" + "database2.collection4"),
      "blocked and table-unavailable topics abort → failed monitoring fires")
    // the clean corpus's verdict is COMPLETED_SUCCESSFULLY → both job rows
    assert(ofKind("completion_monitoring").map(_.getString(7)).toSeq === Seq("success"))
    assert(ofKind("adg_trigger").length === 1, "ADG triggers only on full success")
  }

  test("metrics push: the final registry is the per-topic outcome table") {
    val rows = ExportQueries.metricsPush(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)), r.getLong(3)))
    def of(metric: String) = rows.filter(_._2 == metric)
    // split-labeled series exist ONLY for written (topic, split) pairs —
    // a labeled Prometheus counter has no series until first inc
    assert(of("htme_records_written").forall(r => r._3.isDefined && r._4 > 0))
    assert(of("htme_records_written").nonEmpty)
    // bytes and records agree with the export status rollup
    val nRec = of("htme_records_written").map(_._4).sum
    val statusTotal = ExportQueries.exportStatus(spark, sf)
      .filter(!col("topic").isin(graft.kv.KvModel.BlockedTopics: _*))
      .agg(sum(col("n_records"))).head.getLong(0)
    assert(nRec === statusTotal,
      "records_written must equal the export-status record total over non-blocked topics")
    // every declared topic starts and completes exactly once; the gauge
    // is back to 0 at the final push
    val nTopics = graft.kv.KvModel.DeclaredTopics.size
    assert(of("htme_topics_started").length === nTopics)
    assert(of("htme_topics_started").forall(_._4 == 1L))
    assert(of("htme_running_applications").forall(_._4 == 0L))
    // collection-outcome counters follow the status machine: Exported →
    // successful + non_empty here; blocked/unavailable → none
    val completed = ExportQueries.exportCompletion(spark, sf)
      .filter(col("status") === "Exported").count()
    assert(of("htme_successful_collections").map(_._4).sum === completed)
    assert(of("htme_successful_non_empty_collections").map(_._4).sum === completed)
    assert(of("htme_successful_empty_collections").map(_._4).sum === 0L)
    assert(of("htme_failed_collections").map(_._4).sum === 0L)
  }

  test("product status: COMPLETED/FAILED updates, no update otherwise") {
    val ps = ExportQueries.productStatus(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getString(2), Option(r.getString(3)), r.getString(4))).toMap
    assert(ps("clean") === (("COMPLETED_SUCCESSFULLY", Some("COMPLETED"), "COMPLETED")))
    assert(ps("one_failed") === (("COMPLETED_UNSUCCESSFULLY", Some("FAILED"), "FAILED")))
    // IN_PROGRESS and NOT_COMPLETED leave the product row untouched — the
    // reference's `when` has no else branch
    assert(ps("one_exporting") === (("IN_PROGRESS", None, "IN_PROGRESS")))
    assert(ps("one_cancelled") === (("NOT_COMPLETED", None, "IN_PROGRESS")))
  }
}
