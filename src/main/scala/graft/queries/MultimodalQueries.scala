package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY §2 №32): media as opaque binary
  * columns + typed metadata, with decode/feature-extraction as a
  * partition-mapped stage.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic stand-in — but the Spark-side PLUMBING is
  * real: binary column construction, typed metadata, a mapPartitions
  * feature-extraction stage with a per-partition "decoder" lifecycle (the
  * exact shape a JNI/codec-backed decoder needs: init once per partition,
  * stream rows through it).
  */
object MultimodalQueries {

  final case class MediaRow(doc_id: Long, fmt: String, width: Int, height: Int, blob: Array[Byte])
  final case class MediaFeatures(doc_id: Long, fmt: String, width: Int, height: Int,
                                 byte_len: Int, first_byte: Int, checksum: Long)

  /** REAL DECODER GOES HERE — deterministic fake: a codec would parse
    * `blob` per `fmt`; we derive features from the bytes directly. */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < r.blob.length) { sum += (r.blob(i) & 0xff); i += 1 }
    MediaFeatures(r.doc_id, r.fmt, r.width, r.height, r.blob.length, r.blob(0) & 0xff, sum)
  }

  def multimodalIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables(spark, dir).documents.select(
      col("doc_id"),
      // synthetic 32-byte media payload: md5(text) ++ md5(text||'2')
      unhex(concat(md5(col("text")), md5(concat(col("text"), lit("2"))))).as("blob"),
      element_at(array(lit("png"), lit("jpg"), lit("wav")), (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
      (lit(8) + col("doc_id") % 32).cast("int").as("width"),
      (lit(8) + col("doc_id") % 24).cast("int").as("height"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      // per-partition decoder lifecycle: init heavyweight codec state here
      rows.map(decodeStub)
    }.toDF()
      .orderBy(col("doc_id"))
  }

  /** Oracle recomputes features from the md5 hex strings (no blob type
    * gymnastics needed: nibble arithmetic over the 64 hex chars). */
  val multimodalIngestSql: String = {
    val hex = "md5(text) || md5(text || '2')"
    s"""WITH m AS (SELECT doc_id, $hex AS h FROM documents)
       |SELECT doc_id,
       |  ['png','jpg','wav'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       |  CAST(8 + doc_id % 32 AS INT) AS width,
       |  CAST(8 + doc_id % 24 AS INT) AS height,
       |  32 AS byte_len,
       |  CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
       |    + strpos('0123456789abcdef', substr(h, 2, 1)) - 1 AS INT) AS first_byte,
       |  CAST(list_sum(list_transform(range(0, 32), j ->
       |    (strpos('0123456789abcdef', substr(h, 2*j + 1, 1)) - 1) * 16
       |      + strpos('0123456789abcdef', substr(h, 2*j + 2, 1)) - 1)) AS BIGINT) AS checksum
       |FROM m ORDER BY doc_id""".stripMargin
  }
}
