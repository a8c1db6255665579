package graft.sources

import graft.SparkSpec
import java.util.concurrent.atomic.AtomicInteger

/** Exactly-once under TASK RETRY for the physical sinks (reference:
  * Spring Batch's retry template around the S3 writer,
  * app/configuration/JobConfiguration.kt): the test session runs
  * `local[4, 2]` (maxFailures = 2), so an attempt the spec kills
  * mid-object via the sink fault point is re-attempted by Spark's REAL
  * task-retry machinery — the dead attempt's partial dot-temp litters
  * the directory, the retried attempt re-runs the whole partition
  * (including re-committing objects the dead attempt already committed),
  * and the committed output must be byte-identical to an uninterrupted
  * run with no duplicate and no partial visible to any reader. Both FS
  * branches: raw-local (java.io fast path, POSIX rename replaces) and
  * `mockfs://` (the Hadoop-API path hdfs/s3a take). */
class SinkRetrySpec extends SparkSpec {

  // this suite's entire point is injected attempt failures
  override protected def expectsTaskFailures: Boolean = true

  private def noJsonlFault(): Unit = JsonlSnapshotSink.faultInjector = (_, _, _) => ()
  private def noShardFault(): Unit = TrainShardSink.faultInjector = (_, _, _) => ()

  private def tmps(root: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".tmp")).toSeq
  }

  private def records = graft.queries.ExportQueries.pipelineRecords(spark, sf)

  private def jsonlRoundTrip(root: String): (Set[(String, Long, Long)], Seq[(String, String)], Long) = {
    val summary = JsonlSnapshotSink.write(records, root)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val back = JsonlSnapshotSink.readBack(spark, root)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val manifests = spark.read.option("recursiveFileLookup", "true")
      .text(s"$root/manifests").count()
    (summary, back, manifests)
  }

  private def installJsonlFault(fired: AtomicInteger): Unit =
    JsonlSnapshotSink.faultInjector = (_, nRec, committed) => {
      val tc = org.apache.spark.TaskContext.get()
      // die on the FIRST attempt, one record into the task's SECOND
      // object: the first object is already committed (the retry must
      // re-commit it — the duplicate-attempt rename path), the second is
      // a partial dot-temp (the litter a reader must never see)
      if (tc != null && tc.attemptNumber() == 0 && committed >= 1 && nRec == 1) {
        fired.incrementAndGet()
        throw new java.io.IOException("SinkRetrySpec: attempt killed mid-object")
      }
    }

  test("jsonl snapshot, local branch: killed attempts leave hidden litter; retried run is byte-identical") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_retry_jsonl"
    val (cleanSummary, cleanBack, cleanManifests) = jsonlRoundTrip(s"${base}_clean")
    val fired = new AtomicInteger
    installJsonlFault(fired)
    val (summary, back, manifests) =
      try jsonlRoundTrip(s"${base}_faulty") finally noJsonlFault()
    assert(fired.get >= 1, "fault never fired — the retry path went untested")
    // the dead attempts' partial temps ARE on disk (nothing cleaned them)…
    assert(tmps(s"${base}_faulty").nonEmpty, "expected dead-attempt dot-temp litter")
    // …and invisible: committed output ≡ the uninterrupted run
    assert(summary == cleanSummary, "summary diverged under task retry")
    assert(back == cleanBack, "round-tripped records diverged under task retry")
    assert(manifests == cleanManifests, "manifest lines duplicated or lost under task retry")
  }

  test("jsonl snapshot, mockfs:// branch: same exactly-once through the Hadoop API path") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockRemoteFs].getName)
    val local = s"${System.getProperty("java.io.tmpdir")}/graft_retry_jsonl_mockfs"
    val (cleanSummary, cleanBack, cleanManifests) =
      jsonlRoundTrip(s"mockfs:${local}_clean")
    val fired = new AtomicInteger
    installJsonlFault(fired)
    val (summary, back, manifests) =
      try jsonlRoundTrip(s"mockfs:${local}_faulty") finally noJsonlFault()
    assert(fired.get >= 1, "fault never fired through the Hadoop branch")
    assert(tmps(s"${local}_faulty").nonEmpty, "expected dead-attempt dot-temp litter")
    assert(summary == cleanSummary && back == cleanBack && manifests == cleanManifests,
      "Hadoop-branch output diverged under task retry")
  }

  test("train shard sink: killed attempts mid-shard; retried run parses back identical") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_retry_shards"
    def lines = {
      val shuffled = graft.queries.PipelineQueries.sequenceShuffle(spark, sf)
      val manifest = graft.queries.PipelineQueries.sequenceManifest(spark, sf)
        .select(org.apache.spark.sql.functions.col("bin"),
          org.apache.spark.sql.functions.col("seq_id"),
          org.apache.spark.sql.functions.col("docs"))
      import org.apache.spark.sql.functions._
      shuffled.join(manifest, Seq("bin", "seq_id"))
        .select(col("shard"), col("pos"),
          concat_ws("|", col("shard"), col("pos"), col("bin"), col("seq_id"),
            col("n_tokens"), col("docs")).as("line"))
    }
    def roundTrip(root: String): (Set[(String, Long, Long)], Seq[String]) = {
      val s = TrainShardSink.write(lines, root)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val b = TrainShardSink.readBack(spark, root)
        .selectExpr("concat_ws('|', shard, pos, bin, seq_id, n_tokens, docs)")
        .collect().map(_.getString(0)).toSeq.sorted
      (s, b)
    }
    val (cleanSummary, cleanBack) = roundTrip(s"${base}_clean")
    val fired = new AtomicInteger
    TrainShardSink.faultInjector = (_, n, committed) => {
      val tc = org.apache.spark.TaskContext.get()
      // die two lines into the task's first shard: a partial compressed
      // temp is on disk, nothing committed by this attempt yet
      if (tc != null && tc.attemptNumber() == 0 && committed == 0 && n == 2) {
        fired.incrementAndGet()
        throw new java.io.IOException("SinkRetrySpec: attempt killed mid-shard")
      }
    }
    val (summary, back) = try roundTrip(s"${base}_faulty") finally noShardFault()
    assert(fired.get >= 1, "fault never fired — the retry path went untested")
    assert(tmps(s"${base}_faulty").nonEmpty, "expected dead-attempt dot-temp litter")
    assert(summary == cleanSummary, "shard summary diverged under task retry")
    assert(back == cleanBack, "shard lines diverged under task retry")
    graft.CacheRegistry.releaseAll(spark)
  }
}
