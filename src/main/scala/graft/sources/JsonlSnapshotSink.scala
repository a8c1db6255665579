package graft.sources

import graft.functions.AesCtrCrypt
import graft.kv.KvModel
import graft.operators.ExportOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.ByteArrayInputStream
import java.security.MessageDigest
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import javax.crypto.{Cipher, CipherOutputStream}
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Mongo-backup-format snapshot sink (SURVEY §2 №18; reference:
  * app/batch/S3StreamingWriter.kt:77-175): one AES-CTR-encrypted gzip
  * object per byte-bounded chunk, named
  * `prefix/<topic>-<pstart>-<pstop>-NNNNNN.txt.gz.enc` (objectKey at
  * S3StreamingWriter.kt:99-100), with a plain pipe-CSV manifest object per
  * chunk alongside (`...-NNNNNN.csv`, StreamingManifestWriter.kt:23-27).
  * Byte order inside an object matches the reference's stream nesting:
  * JSONL → gzip → AES/CTR (EncryptingOutputStream wraps the compressor
  * around the cipher stream).
  *
  * Spark-first shape: chunk ids come from the SAME window cumsum as the
  * verified `chunk_batch` operator ([[ExportOps.withChunkIds]] — one
  * definition for query and sink); the write itself is one
  * `repartition(object_key) → sortWithinPartitions → mapPartitions` pass —
  * each task streams its chunk groups through cipher+gzip without
  * buffering an object in memory, and emits per-object stats as the
  * summary frame. IO goes through the Hadoop FileSystem API, so the same
  * code writes file://, hdfs:// or s3a:// at cluster scale.
  *
  * Key material is deterministic per object key (SURVEY §6: the DKS
  * round-trip is environment plumbing, modeled as derivable key material) —
  * which also makes the sink's output verifiable end-to-end: [[readBack]]
  * re-derives the key, decrypts, gunzips and yields (object_key, record)
  * rows that the driver's DuckDB oracle reproduces independently.
  */
object JsonlSnapshotSink {

  val Prefix = "exports"

  /** Deterministic per-object (dataKey, IV) — 16 md5 bytes each. */
  def keyMaterial(objectKey: String): (Array[Byte], Array[Byte]) = {
    val md = MessageDigest.getInstance("MD5")
    val dk = md.digest(s"dk|$objectKey".getBytes("UTF-8"))
    md.reset()
    val iv = md.digest(s"iv|$objectKey".getBytes("UTF-8"))
    (dk, iv)
  }

  /** Manifest object key for a data object key: `.txt.gz.enc` → `.csv`
    * (reference names both off the same filePrefix-NNNNNN stem). */
  def manifestKey(objectKey: String): String =
    objectKey.stripSuffix(".txt.gz.enc") + ".csv"

  /** Write chunked, encrypted snapshot objects + per-chunk manifests.
    *
    * @param records pipeline output with (topic, record, manifest_line,
    *                key_byte, key_hash, eid) — ExportQueries.pipelineRecords
    * @return per-object summary (object_key, n_records, jsonl_bytes)
    */
  def write(records: DataFrame, root: String, prefix: String = Prefix,
            maxBytes: Long = KvModel.ChunkMaxBytes): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._

    // overwrite semantics: clear previous output (driver-side, once)
    val hc = spark.sparkContext.hadoopConfiguration
    val rootPath = new Path(root)
    val fs0 = rootPath.getFileSystem(hc)
    if (fs0.exists(rootPath)) fs0.delete(rootPath, true)

    // executors rebuild a Configuration from the driver's entries (the
    // public-API equivalent of broadcasting SerializableConfiguration)
    val confEntries: Array[(String, String)] = {
      val it = hc.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
      buf.toArray
    }

    val chunked = ExportOps.withChunkIds(
        records.select(col("topic"), col("record"), col("manifest_line"),
          col("key_byte"), col("key_hash"), col("eid")), maxBytes)
      .withColumn("object_key",
        ExportOps.snapshotName(prefix, col("topic"), col("pstart"), col("pstop"), col("batch")))
      .select(col("object_key"), col("key_hash"), col("eid"), col("record"), col("manifest_line"))

    // One shuffle on the object key (high-cardinality, even); groups are
    // contiguous after the within-partition sort, so the writer is a
    // single streaming pass per task with at most one open object.
    chunked
      .repartition(col("object_key"))
      .sortWithinPartitions(col("object_key"), col("key_hash"), col("eid"))
      .select(col("object_key"), col("record"), col("manifest_line"))
      .as[(String, String, String)]
      .mapPartitions { rows =>
        if (rows.isEmpty) Iterator.empty
        else {
          val conf = new org.apache.hadoop.conf.Configuration(false)
          confEntries.foreach { case (k, v) => conf.set(k, v) }
          val fs = new Path(root).getFileSystem(conf)
          // LocalFileSystem otherwise writes a .crc sidecar per object —
          // for many small chunks that doubles the file creates. The
          // AES-CTR envelope already detects corruption (garbage gunzip);
          // no-op on filesystems without client-side checksums.
          fs.setWriteChecksum(false)
          fs.setVerifyChecksum(false)
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]

          var curKey: String = null
          var gz: GZIPOutputStream = null
          var manifest: java.io.OutputStream = null
          var nRecords = 0L
          var nBytes = 0L

          def closeCurrent(): Unit = if (curKey != null) {
            gz.close() // closes cipher + data streams
            manifest.close()
            out += ((curKey, nRecords, nBytes))
            curKey = null
          }

          def openObject(key: String): Unit = {
            val (dk, iv) = keyMaterial(key)
            val cipher = Cipher.getInstance("AES/CTR/NoPadding")
            cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(dk, "AES"), new IvParameterSpec(iv))
            val dataOut = fs.create(new Path(s"$root/data/$key"), true)
            gz = new GZIPOutputStream(new CipherOutputStream(dataOut, cipher))
            manifest = new java.io.BufferedOutputStream(
              fs.create(new Path(s"$root/manifests/${manifestKey(key)}"), true))
            curKey = key
            nRecords = 0L
            nBytes = 0L
          }

          rows.foreach { case (key, record, manifestLine) =>
            if (key != curKey) { closeCurrent(); openObject(key) }
            val line = (record + "\n").getBytes("UTF-8")
            gz.write(line)
            manifest.write((manifestLine + "\n").getBytes("UTF-8"))
            nRecords += 1
            nBytes += line.length
          }
          closeCurrent()
          out.iterator
        }
      }
      .toDF("object_key", "n_records", "jsonl_bytes")
      .orderBy(col("object_key"))
  }

  /** Decrypt + decompress every data object back to (object_key, record)
    * rows — the round-trip proof the driver's oracle checks. Distributed:
    * binaryFile source (one whole object per row), per-row decrypt. */
  def readBack(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.enc")
      .load(s"$root/data")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val key = path.substring(path.indexOf("/data/") + "/data/".length)
        val (dk, iv) = keyMaterial(key)
        val plain = AesCtrCrypt.crypt(bytes, dk, iv)
        val text = new String(new GZIPInputStream(new ByteArrayInputStream(plain)).readAllBytes(), "UTF-8")
        text.split("\n", -1).iterator.filter(_.nonEmpty).map(r => (key, r))
      }
      .toDF("object_key", "record")
  }

  /** Verify-runnable form (№18 `jsonl_snapshot`): write the sf's export to
    * a scratch root, then prove the round trip by decrypting every object —
    * the driver's DuckDB oracle reconstructs the same (object_key, record)
    * pairs from the kv model + the window chunk formulation. */
  def snapshotQuery(spark: SparkSession, dir: String): DataFrame = {
    val records = graft.queries.ExportQueries.pipelineRecords(spark, dir)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_snapshot_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    write(records, root).queryExecution.toRdd.count() // force the write
    readBack(spark, root).orderBy(col("object_key"), col("record"))
  }
}
