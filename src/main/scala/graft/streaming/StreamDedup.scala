package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming exact-dedup for a document stream: md5(text) as the dedup key,
  * state bounded by a watermark (the streaming twin of the batch
  * `dedup_exact` operator — at pipeline scale the state store holds one
  * hash per document seen within the watermark horizon, not the corpus).
  */
object StreamDedup {

  final case class Doc(doc_id: Long, text: String, event_ms: Long)

  def dedup(docs: Dataset[Doc], watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("ts", timestamp_millis(col("event_ms")))
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")
      .select(col("doc_id"), col("text_hash"))
}
