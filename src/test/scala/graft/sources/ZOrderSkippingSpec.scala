package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY §2 №93's layout claim, EXECUTED against real parquet: the
  * zorder_layout operator MODELS file skipping from min/max envelopes;
  * this spec writes the same grid through two physical layouts and reads
  * it back with the probe rectangle, measuring the rows that actually
  * survive parquet row-group statistics pruning (the scan node's output
  * BEFORE the residual filter). The z-ordered layout keeps both axes
  * tight per file, so the pushed rectangle prunes most row groups; the
  * x-sorted layout is tight on x only and must surface every y for the
  * matching x range. The model's prediction becomes a measured plan
  * property — the AqeSkewJoinSpec/StateEvictionSpec discipline. */
class ZOrderSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no file scan in plan:\n$plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered parquet prunes more row groups than x-sorted for a two-axis probe") {
    val (x0, x1, y0, y1) = graft.queries.Analytics.ZRect
    val zbits = graft.queries.Analytics.ZBits
    val base = graft.Tables(spark, sf).events
      .select(expr("user_id % 256").as("x"), expr("(ts_ms DIV 60000) % 256").as("y"),
        $"event_id")
      .withColumn("z", expr((0 until zbits).flatMap { j =>
        Seq(s"shiftleft(shiftright(x, $j) & 1, ${2 * j})",
          s"shiftleft(shiftright(y, $j) & 1, ${2 * j + 1})")
      }.mkString(" + ")))
    val tmp = java.nio.file.Files.createTempDirectory("zorder-skip").toFile
    tmp.deleteOnExit()
    val zdir = s"${tmp.getAbsolutePath}/by_z"
    val xdir = s"${tmp.getAbsolutePath}/by_x"
    // 16 files per layout; tiny row groups so file ≈ row group and the
    // footer stats describe tight ranges
    base.repartitionByRange(16, $"z").sortWithinPartitions($"z")
      .write.option("parquet.block.size", "65536").parquet(zdir)
    base.repartitionByRange(16, $"x", $"y").sortWithinPartitions($"x", $"y")
      .write.option("parquet.block.size", "65536").parquet(xdir)

    def probe(dir: String): DataFrame =
      spark.read.parquet(dir)
        .filter($"x" >= x0 && $"x" <= x1 && $"y" >= y0 && $"y" <= y1)

    val matches = probe(zdir).count()
    assert(matches > 0 && probe(xdir).count() == matches,
      "layout must never change answers")
    val zRead = scanRows(probe(zdir))
    val xRead = scanRows(probe(xdir))
    info(s"matches=$matches rows; scan read: z-ordered=$zRead, x-sorted=$xRead")
    // both layouts must at least surface every match; z-order must let
    // the pushed rectangle prune strictly more row groups
    assert(zRead >= matches && xRead >= matches)
    assert(zRead < xRead,
      s"z-order layout read $zRead rows vs x-sorted $xRead — no measured skipping gain")
  }
}
