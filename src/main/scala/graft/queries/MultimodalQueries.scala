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
    mediaFrame(spark, dir).mapPartitions { rows =>
      // per-partition decoder lifecycle: init heavyweight codec state here
      rows.map(decodeStub)
    }.toDF()
      .orderBy(col("doc_id"))
  }

  final case class MediaTransformed(doc_id: Long, fmt: String, out_width: Int, out_height: Int,
                                    n_frames: Int, sampled_checksum: Long)

  /** Resize + frame-sample stage (SURVEY §2 №32's transform side): the
    * codec work is STUBBED deterministically (halved dimensions; "frames" =
    * 4-byte windows, sampling every second frame), but the Spark plumbing
    * is the real thing — a second mapPartitions stage over the binary
    * column with its own decoder lifecycle, exactly where a real
    * resize/ffmpeg call sits.
    */
  private def transformStub(r: MediaRow): MediaTransformed = {
    val frames = r.blob.length / 4
    var sum = 0L
    var f = 0
    while (f < frames) {
      if (f % 2 == 0) { // sample every second frame
        var j = 0
        while (j < 4) { sum += (r.blob(f * 4 + j) & 0xff); j += 1 }
      }
      f += 1
    }
    MediaTransformed(r.doc_id, r.fmt, math.max(1, r.width / 2), math.max(1, r.height / 2), frames, sum)
  }

  def multimodalTransform(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaFrame(spark, dir).mapPartitions { rows =>
      // per-partition decoder/scaler lifecycle
      rows.map(transformStub)
    }.toDF()
      .orderBy(col("doc_id"))
  }

  private def mediaFrame(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables(spark, dir).documents.select(
      col("doc_id"),
      unhex(concat(md5(col("text")), md5(concat(col("text"), lit("2"))))).as("blob"),
      element_at(array(lit("png"), lit("jpg"), lit("wav")), (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
      (lit(8) + col("doc_id") % 32).cast("int").as("width"),
      (lit(8) + col("doc_id") % 24).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Sampled frames = byte offsets 0-3, 8-11, 16-19, 24-27 of the 32-byte
    * blob → hex chars 1-8, 17-24, 33-40, 49-56 (1-indexed pairs). */
  val multimodalTransformSql: String = {
    val hex = "md5(text) || md5(text || '2')"
    s"""WITH m AS (SELECT doc_id, $hex AS h FROM documents)
       |SELECT doc_id,
       |  ['png','jpg','wav'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       |  CAST(greatest(1, (8 + doc_id % 32) // 2) AS INT) AS out_width,
       |  CAST(greatest(1, (8 + doc_id % 24) // 2) AS INT) AS out_height,
       |  8 AS n_frames,
       |  CAST(list_sum(list_transform(
       |    [0,1,2,3,8,9,10,11,16,17,18,19,24,25,26,27], j ->
       |    (strpos('0123456789abcdef', substr(h, 2*j + 1, 1)) - 1) * 16
       |      + strpos('0123456789abcdef', substr(h, 2*j + 2, 1)) - 1)) AS BIGINT) AS sampled_checksum
       |FROM m ORDER BY doc_id""".stripMargin
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
