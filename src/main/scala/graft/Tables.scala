package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test corpus (TESTDATA.md). One parquet
  * file per table under a scale-factor directory. All queries take the
  * directory as a parameter so the same code runs at any SF (and, on a real
  * cluster, against a multi-file partitioned layout — `spark.read.parquet`
  * takes directories/globs transparently).
  */
final case class Tables(spark: SparkSession, dir: String) {
  /** Source-format resolution: parquet preferred, ORC / JSON-lines / CSV
    * accepted (`<dir>/<name>.{parquet,orc,json,csv}`). Local-filesystem
    * probe — a production deployment would state the format explicitly; the
    * point is that every graft operator is source-format agnostic (the
    * returned frame is identical, so the whole pipeline + oracles carry
    * over; ORC keeps predicate pushdown + column pruning like parquet).
    */
  private def t(name: String): DataFrame = {
    val base = s"$dir/$name"
    if (new java.io.File(s"$base.parquet").exists) spark.read.parquet(s"$base.parquet")
    else if (new java.io.File(s"$base.orc").exists) spark.read.orc(s"$base.orc")
    else if (new java.io.File(s"$base.json").exists)
      spark.read.schema(Tables.knownSchema(name).orNull).json(s"$base.json")
    else if (new java.io.File(s"$base.csv").exists)
      spark.read.option("header", "true").schema(Tables.knownSchema(name).orNull).csv(s"$base.csv")
    else spark.read.parquet(s"$base.parquet") // fail with the parquet error
  }

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

object Tables {
  import org.apache.spark.sql.types._

  /** Explicit schemas for schemaless formats (JSON/CSV) — events carries
    * raw nanosecond longs, matching the parquet read under nanosAsLong. */
  def knownSchema(name: String): Option[StructType] = name match {
    case "events" => Some(StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType))))
    case "documents" => Some(StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))))
    case _ => None
  }
}
