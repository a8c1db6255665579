package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session — Spark
  * startup is ~2s, per-suite sessions would dominate test time). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2]: maxFailures = 2, so a task that fails ONCE is retried
      // (Spark's real task-retry path) — SinkRetrySpec kills sink attempts
      // mid-object and proves the commit protocols exactly-once under the
      // retry; every other suite is unaffected (their tasks don't fail)
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf: String = "/root/testdata/sf0.001"
}
