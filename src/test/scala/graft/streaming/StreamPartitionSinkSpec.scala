package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №116 stream_partition_sink — the streaming-landed date-partitioned
  * layout: stream ≡ batch, restart adds nothing (exactly-once via the
  * sink commit log), and the landed layout prunes like the batch one. */
class StreamPartitionSinkSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(out: java.nio.file.Path): Set[String] = {
    val b = Set.newBuilder[String]
    java.nio.file.Files.walk(out).forEach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("part-") && n.endsWith(".parquet")) b += out.relativize(p).toString
    }
    b.result()
  }

  test("streamed partitioned sink ≡ batch per-day aggregation; third restart adds no files") {
    val scratch = java.nio.file.Files.createTempDirectory("graft_psink_spec_")
    try {
      val out = scratch.resolve("out"); val ckpt = scratch.resolve("ckpt")
      StreamPartitionSink.runStream(spark, sf, out, ckpt)
      val afterFirst = dataFiles(out)
      assert(afterFirst.nonEmpty, "stream landed no files")
      // every data file lives under a date= partition directory
      assert(afterFirst.forall(_.startsWith("date=")),
        s"files outside partition dirs: ${afterFirst.filterNot(_.startsWith("date=")).take(3)}")
      // restart twice more from the same checkpoint: no new input → the
      // committed file set must not change (the sink-log idempotence)
      StreamPartitionSink.runStream(spark, sf, out, ckpt)
      StreamPartitionSink.runStream(spark, sf, out, ckpt)
      assert(dataFiles(out) == afterFirst, "a restart with no new input added/removed sink files")

      // stream ≡ batch on the FULL per-day aggregate (not just the slice)
      val got = spark.read.parquet(out.toString)
        .groupBy($"date".cast("string").as("date"))
        .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("u"))
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      val want = graft.Tables(spark, sf).events
        .groupBy(date_format($"ts_utc", "yyyy-MM-dd").as("date"))
        .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("u"))
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == want, "streamed landing must equal the batch aggregation")

      // and the landed layout PRUNES: a slice lists only matching dirs
      val slice = spark.read.parquet(out.toString)
        .filter($"date".isin(graft.sources.PartitionedLayout.SliceDates: _*))
      slice.collect()
      val scans = graft.sources.PartitionedLayout.fileScans(slice.queryExecution.executedPlan)
      assert(scans.nonEmpty)
      assert(scans.map(_.metrics("numPartitions").value).sum ==
        graft.sources.PartitionedLayout.SliceDates.size.toLong,
        "date slice over the streamed layout did not prune to the slice's partitions")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(scratch).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("uncommitted (orphan) files are invisible: reads go through the sink commit log") {
    // the task-retry story for the STREAMING sink: a died/zombie task's
    // data file that never reached _spark_metadata must not be readable —
    // the file-sink's exactly-once is the commit LOG, not the directory
    // listing. Plant an orphan part-file (garbage bytes, valid name) in a
    // partition dir and prove the per-day aggregate is unchanged — the
    // reader never even opens it (garbage parquet would throw).
    val scratch = java.nio.file.Files.createTempDirectory("graft_psink_orphan_")
    try {
      val out = scratch.resolve("out"); val ckpt = scratch.resolve("ckpt")
      StreamPartitionSink.runStream(spark, sf, out, ckpt)
      def agg() = spark.read.parquet(out.toString)
        .groupBy($"date".cast("string").as("date"))
        .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("u"))
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      val clean = agg()
      val partDir = {
        val s = java.nio.file.Files.list(out)
        val d = try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.find(_.getFileName.toString.startsWith("date=")).get
        } finally s.close()
        d
      }
      val orphan = partDir.resolve("part-00099-deadbeef-dead-beef-dead-beefdeadbeef.c000.snappy.parquet")
      java.nio.file.Files.write(orphan, "not parquet at all".getBytes("UTF-8"))
      assert(agg() == clean,
        "an uncommitted file changed the read — the reader is listing the directory, not the sink log")
      // the orphan IS on disk (the assertion above wasn't vacuous)
      assert(java.nio.file.Files.exists(orphan))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(scratch).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
