package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test corpus (TESTDATA.md). One parquet
  * file per table under a scale-factor directory. All queries take the
  * directory as a parameter so the same code runs at any SF (and, on a real
  * cluster, against a multi-file partitioned layout — `spark.read.parquet`
  * takes directories/globs transparently).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** `events.ts` is nanosecond-precision parquet, which Spark only reads as
    * a long (spark.sql.legacy.parquet.nanosAsLong=true — set by
    * GraftSession/Verify/Bench). Normalized here: `ts` stays raw nanos,
    * `ts_ms` is epoch millis, `ts_utc` a microsecond TimestampType.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions._
    // runtime-settable; makes events readable from ANY session (e.g. the
    // driver's), not just ones built by GraftSession/Verify/Bench
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events")
      .withColumn("ts_ms", expr("ts DIV 1000000"))
      .withColumn("ts_utc", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
