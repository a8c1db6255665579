package graft.sources

import graft.SparkSpec
import graft.kv.KvModel

import java.util.concurrent.{CyclicBarrier, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** A Hadoop FileSystem with the HDFS rename contract: rename REFUSES an
  * existing destination (RawLocalFileSystem inherits POSIX replace
  * semantics, which never exercises the sinks' loser-drop branch). This
  * is the semantic hdfs:// gives a speculation loser: its rename fails,
  * it must detect the winner and drop its own temp. */
class NoReplaceRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "norepl"
  override def getUri: java.net.URI = java.net.URI.create("norepl:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean =
    if (exists(dst)) false else super.rename(src, dst)
}

/** Rendezvous shared between the two racing attempt bodies (same JVM in
  * local mode). The barrier holds each attempt at the FIRST record of
  * every object, so both attempts are provably LIVE simultaneously and
  * their per-object commits interleave tightly — if either attempt died
  * or never started, the other would time out and fail the spec. */
object SpeculationRendezvous {
  @volatile var barrier: CyclicBarrier = _
  val meets = new AtomicInteger(0)
  def await(): Unit = {
    barrier.await(60, TimeUnit.SECONDS)
    meets.incrementAndGet()
    ()
  }
  def reset(parties: Int): Unit = { barrier = new CyclicBarrier(parties); meets.set(0) }
}

/** SPECULATIVE-execution commit race for the physical sinks — the case
  * SinkRetrySpec's kill-then-retry cannot reach: there, the first attempt
  * is DEAD before the retry runs; under `spark.speculation` (routine on
  * large clusters with stragglers) two attempts of the same task are
  * ALIVE at once and race the dot-temp → final rename. The spec drives
  * two live attempt contexts through the sinks' real per-task writer
  * bodies ([[JsonlSnapshotSink.writePartitionBody]] /
  * [[TrainShardSink.writePartitionBody]]) against ONE root, in lockstep
  * via a barrier at every object boundary, and asserts the single-winner
  * contract: exactly one visible object per key, bytes identical to an
  * unraced run, no temp visible to any reader, both attempts complete.
  *
  * Rename semantics, both branches:
  *  - POSIX / RawLocal (`file://` and the sink's java.io fast path):
  *    rename(2) atomically REPLACES an existing target — the last
  *    committer wins, and because duplicate attempts produce
  *    byte-identical objects (sorted input, deterministic gzip + CTR),
  *    the replace is invisible.
  *  - HDFS contract ([[NoReplaceRenameFs]]): rename REFUSES an existing
  *    destination — the loser detects the winner's object and drops its
  *    own temp (the sinks' rename-first loser-drop branch, exercised
  *    here deterministically for every object).
  *
  * The streaming sink (№116) commits through Spark's file-sink metadata
  * log, where speculation safety is VISIBILITY: only files recorded in
  * `_spark_metadata` exist to readers. The last test plants a loser's
  * orphan parquet file in a committed partition and proves readers
  * through the root never see it (while a direct partition-dir read —
  * bypassing the log — does, pinning that the log is what filters). */
class SinkSpeculationSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  private def noJsonlFault(): Unit = JsonlSnapshotSink.faultInjector = (_, _, _) => ()
  private def noShardFault(): Unit = TrainShardSink.faultInjector = (_, _, _) => ()

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_spec_race_$tag"
    graft.Fs.rmTree(java.nio.file.Paths.get(d))
    d
  }

  private def confEntries: Array[(String, String)] = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.norepl.impl", classOf[NoReplaceRenameFs].getName)
    val it = hc.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
    buf.toArray
  }

  private def tmpsUnder(root: String): Seq[String] = {
    val p = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(p)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(p)
      try s.iterator().asScala.map(_.getFileName.toString).filter(_.endsWith(".tmp")).toList
      finally s.close()
    }
  }

  // ---------------------------------------------------------------- jsonl

  /** Race two live attempts over the full sorted row set; returns the two
    * per-attempt summaries. */
  private def raceJsonl(root: String): Seq[Set[(String, Long, Long)]] = {
    import spark.implicits._
    val records = graft.queries.ExportQueries.pipelineRecords(spark, sf)
    val rows = JsonlSnapshotSink
      .chunkedFrame(records, JsonlSnapshotSink.Prefix, KvModel.ChunkMaxBytes, GzipSnapshotCodec)
      .orderBy(col("object_key"), col("key_hash"), col("eid"))
      .select(col("object_key"), col("record"), col("manifest_line"))
      .as[(String, String, String)].collect()
    val bc = spark.sparkContext.broadcast(rows)
    val ce = confEntries
    SpeculationRendezvous.reset(2)
    JsonlSnapshotSink.faultInjector =
      (_, nRec, _) => if (nRec == 1) SpeculationRendezvous.await()
    try {
      spark.sparkContext.parallelize(0 until 2, 2).mapPartitions { _ =>
        Iterator.single(JsonlSnapshotSink.writePartitionBody(
          bc.value.iterator, root, GzipSnapshotCodec,
          JsonlSnapshotSink.StubDerivedKeyProvider, ce).toSet)
      }.collect().toSeq
    } finally noJsonlFault()
  }

  private def jsonlState(root: String): (Set[(String, Long, Long)], Seq[(String, String)], Seq[String]) = {
    val back = JsonlSnapshotSink.readBack(spark, root)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val manifests = spark.read.option("recursiveFileLookup", "true")
      .text(s"$root/manifests").collect().map(_.getString(0)).toSeq.sorted
    (Set.empty, back, manifests)
  }

  test("jsonl snapshot: two live attempts race the rename (POSIX-replace branch) — one winner, bytes ≡ unraced") {
    // unraced ground truth through the public API
    val cleanRoot = freshDir("jsonl_clean")
    val cleanSummary = JsonlSnapshotSink
      .write(graft.queries.ExportQueries.pipelineRecords(spark, sf), cleanRoot)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val (_, cleanBack, cleanManifests) = jsonlState(cleanRoot)

    val raceRoot = freshDir("jsonl_race")
    val summaries = raceJsonl(raceRoot)
    // both attempts LIVED to completion and each processed every object
    assert(summaries.size == 2)
    summaries.foreach(s => assert(s == cleanSummary,
      "an attempt's object accounting diverged from the unraced run"))
    assert(SpeculationRendezvous.meets.get() == 2 * cleanSummary.size,
      "attempts did not meet at every object boundary — the race never overlapped")
    // single winner per object: visible state ≡ the unraced run…
    val (_, back, manifests) = jsonlState(raceRoot)
    assert(back == cleanBack, "data objects diverged under a live duplicate-attempt race")
    assert(manifests == cleanManifests, "manifests diverged under the race")
    // …and nothing half-committed remains (every loser temp was consumed
    // by its own rename — POSIX replace — or deleted)
    assert(tmpsUnder(raceRoot).isEmpty, "temp litter left by the racing attempts")
  }

  test("jsonl snapshot: same race under the HDFS rename contract — loser-drop branch fires per object") {
    val local = freshDir("jsonl_norepl")
    val root = s"norepl:$local"
    val cleanRoot = freshDir("jsonl_norepl_clean")
    val cleanSummary = JsonlSnapshotSink
      .write(graft.queries.ExportQueries.pipelineRecords(spark, sf), s"norepl:$cleanRoot")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val (_, cleanBack, cleanManifests) = jsonlState(s"norepl:$cleanRoot")

    val summaries = raceJsonl(root)
    assert(summaries.size == 2)
    summaries.foreach(s => assert(s == cleanSummary))
    // norepl rename refuses existing targets: for every object one attempt
    // MUST have hit the loser branch (detect winner, drop own temp) — if
    // that branch mis-detected, the body would have thrown and the
    // summaries above could not both be complete. No temp survives it:
    assert(tmpsUnder(local).isEmpty, "loser temps not dropped under refuse-rename semantics")
    val (_, back, manifests) = jsonlState(root)
    assert(back == cleanBack, "data objects diverged under refuse-rename race")
    assert(manifests == cleanManifests, "manifests diverged under refuse-rename race")
  }

  // ---------------------------------------------------------------- shards

  private def shardLines(): Array[(Int, String)] = {
    import spark.implicits._
    val shuffled = graft.queries.PipelineQueries.sequenceShuffle(spark, sf)
    val manifest = graft.queries.PipelineQueries.sequenceManifest(spark, sf)
      .select(col("bin"), col("seq_id"), col("docs"))
    shuffled.join(manifest, Seq("bin", "seq_id"))
      .select(col("shard"), col("pos"),
        org.apache.spark.sql.functions.concat_ws("|",
          col("shard"), col("pos"), col("bin"), col("seq_id"),
          col("n_tokens"), col("docs")).as("line"))
      .orderBy(col("shard"), col("pos"))
      .select(col("shard"), col("line"))
      .as[(Int, String)].collect()
  }

  private def raceShards(root: String, lines: Array[(Int, String)]): Seq[Set[(String, Long, Long)]] = {
    val bc = spark.sparkContext.broadcast(lines)
    val ce = confEntries
    SpeculationRendezvous.reset(2)
    TrainShardSink.faultInjector =
      (_, n, _) => if (n == 1) SpeculationRendezvous.await()
    try {
      spark.sparkContext.parallelize(0 until 2, 2).mapPartitions { _ =>
        Iterator.single(TrainShardSink.writePartitionBody(
          bc.value.iterator, root, graft.queries.PipelineQueries.NShards,
          GzipSnapshotCodec, ce).toSet)
      }.collect().toSeq
    } finally noShardFault()
  }

  test("train shard sink: two live attempts race on file:// and under the HDFS rename contract") {
    val lines = shardLines()
    val nShards = lines.map(_._1).distinct.length
    // unraced ground truth
    val cleanRoot = freshDir("shards_clean")
    import spark.implicits._
    val cleanSummary = TrainShardSink
      .write(lines.toSeq.toDF("shard", "line")
        .withColumn("pos", org.apache.spark.sql.functions.monotonically_increasing_id()),
        cleanRoot)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val cleanBack = TrainShardSink.readBack(spark, cleanRoot)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)

    for (scheme <- Seq("", "norepl:")) {
      val local = freshDir(s"shards_race_${if (scheme.isEmpty) "file" else "norepl"}")
      val root = s"$scheme$local"
      val summaries = raceShards(root, lines)
      assert(summaries.size == 2)
      summaries.foreach(s => assert(s == cleanSummary,
        s"[$root] an attempt's shard accounting diverged"))
      assert(SpeculationRendezvous.meets.get() == 2 * nShards,
        s"[$root] attempts did not meet at every shard boundary")
      assert(tmpsUnder(local).isEmpty, s"[$root] temp litter after the race")
      val back = TrainShardSink.readBack(spark, root)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(back == cleanBack, s"[$root] shard content diverged under the race")
    }
  }

  // ---------------------------------------------------------------- streaming file sink

  test("stream partition sink: a speculation loser's orphan file is invisible through _spark_metadata") {
    val scratch = graft.streaming.StreamPartitionSink.landPartitioned(spark, sf)
    try {
      val out = scratch.resolve("out")
      val before = spark.read.parquet(out.toString).count()
      // find one committed parquet file and plant a same-schema orphan next
      // to it under a name the sink never committed — exactly what a
      // speculation loser's task-attempt output would look like if the
      // outputCommitter ever leaked it into the directory
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(out)
      val committed = try s.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet") &&
          !p.toString.contains("_spark_metadata"))
        .toList.head
      finally s.close()
      val orphan = committed.resolveSibling("part-99999-orphan-attempt.c000.snappy.parquet")
      java.nio.file.Files.copy(committed, orphan)
      val orphanRows = spark.read.parquet(committed.toString).count()
      assert(orphanRows > 0)
      // reader through the sink root: the metadata log filters the orphan
      val after = spark.read.parquet(out.toString).count()
      assert(after == before,
        s"orphan attempt file became visible through the sink root ($before -> $after)")
      // control: bypassing the log (reading the partition dir directly)
      // DOES see the orphan — the log, not luck, is what filters
      val direct = spark.read.parquet(committed.getParent.toString).count()
      val directBefore = spark.read.parquet(out.toString)
        .filter(col("date") === committed.getParent.getFileName.toString.stripPrefix("date=")).count()
      assert(direct == directBefore + orphanRows,
        "control failed: direct partition read should see the planted orphan")
    } finally {
      graft.Fs.rmTree(scratch)
    }
  }
}
