package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout (SURVEY §2 №60, §4): the co-location lever for
  * repeated big-big joins at 100 TB. Writing both sides `bucketBy(N, key)`
  * + `sortBy(key)` fixes the partitioning ON DISK, so every subsequent
  * join/aggregation on the key plans WITHOUT a shuffle exchange (and
  * without even a sort, when sortBy matches) — the one-time write cost
  * amortizes across every downstream consumer, which is exactly the
  * economics of a curated-corpus warehouse a training pipeline re-joins
  * per experiment (docs ⋈ features ⋈ scores, all on doc_id).
  *
  * The driver query materializes a doc table and a per-doc feature table
  * bucketed identically, joins them, and returns a plain relational
  * result the DuckDB oracle reproduces from the raw parquet — bucketing
  * changes the PLAN (pinned exchange-free in PlanRegressionSpec), never
  * the answer.
  */
object Bucketing {

  /** Bucket count — proof-sized; production uses O(cluster parallelism)
    * (buckets are the unit of join parallelism for bucketed reads). */
  val NumBuckets = 8

  /** Idempotent bucketed materialization as an EXTERNAL table under the
    * JVM tmpdir; re-runs overwrite (bench runs a query 3×), and a stale
    * location from a previous JVM is removed first — `overwrite` alone
    * refuses to claim an existing unregistered path. Shared by the
    * doc-warehouse layout here and the persisted IVF index
    * ([[graft.queries.VectorQueries.knnGraphIndexed]]). */
  private[graft] def writeBucketedBy(df: DataFrame, table: String, key: String): DataFrame = {
    val spark = df.sparkSession
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_bucketed", table)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    if (java.nio.file.Files.exists(path)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    df.write.mode("overwrite")
      .bucketBy(NumBuckets, key).sortBy(key)
      .option("path", path.toString)
      .saveAsTable(table)
    spark.table(table)
  }

  /** BUILD-IF-ABSENT variant of [[writeBucketedBy]]: when the table is
    * already registered in this session AND its external path exists, the
    * persisted layout is reused and `build` is never evaluated — the
    * access pattern of a maintained index (build once per corpus version,
    * then every batch/query touches only its own work). Callers key the
    * table name by corpus dir so a layout can never serve another SF. */
  private[graft] def bucketedCached(spark: SparkSession, table: String, key: String)(
      build: => DataFrame): DataFrame = {
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_bucketed", table)
    if (spark.catalog.tableExists(table) && java.nio.file.Files.exists(path))
      spark.table(table)
    else writeBucketedBy(build, table, key)
  }

  private def writeBucketed(df: DataFrame, table: String): DataFrame =
    writeBucketedBy(df, table, "doc_id")

  private def materialize(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = writeBucketed(Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
      "graft_docs_bucketed")
    val feats = writeBucketed(Tables(spark, dir).documents
      .select(col("doc_id"),
        size(graft.queries.TextQueries.words(col("text"))).as("ws_tokens")),
      "graft_feats_bucketed")
    (docs, feats)
  }

  /** The exchange-free co-located join over the bucketed tables. The
    * MERGE hint pins the sort-merge path: at proof scale AQE would
    * broadcast these tiny tables and never exercise the layout being
    * exhibited — at 100 TB neither side is broadcastable and this IS the
    * plan the layout buys (SMJ over bucketed scans: no exchange, no sort). */
  def bucketedJoinFrames(spark: SparkSession, dir: String): DataFrame = {
    val (docs, feats) = materialize(spark, dir)
    docs.hint("MERGE").join(feats, "doc_id")
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("source"), col("n_chars"), col("ws_tokens"))
      .orderBy(col("doc_id"))
  }

  def bucketedJoin(spark: SparkSession, dir: String): DataFrame =
    bucketedJoinFrames(spark, dir)

  /** Oracle over the RAW parquet — bucketing must not change the answer. */
  val bucketedJoinSql: String =
    s"""SELECT doc_id, source, n_chars,
       |  len(${graft.queries.TextQueries.wordsSql("text")}) AS ws_tokens
       |FROM documents WHERE lang = 'en' ORDER BY doc_id""".stripMargin
}
