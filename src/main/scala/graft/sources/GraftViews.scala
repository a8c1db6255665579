package graft.sources

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Registers the corpus tables as temp views so the FULL surface is
  * reachable through `spark.sql(...)` — the SQL half of the library's API
  * (every `SparkEntry.queries` entry is the DataFrame half). The views
  * read through [[Tables]], so `events` arrives normalized
  * (layout-blind ts contract) and schemaless formats get their explicit
  * schemas — SQL users and DataFrame users can never see different
  * tables.
  */
object GraftViews {

  /** Name → loader for every corpus table — the ONE list [[register]]
    * derives from (a second literal list could silently drift). */
  private def loaders(t: Tables): Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
    "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
    "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
    "lineitem" -> t.lineitem, "events" -> t.events,
    "documents" -> t.documents, "embeddings" -> t.embeddings)

  def tableNames(spark: SparkSession, dir: String): Seq[String] =
    loaders(Tables(spark, dir)).map(_._1)

  /** Create (or replace) one temp view per corpus table over `dir`. */
  def register(spark: SparkSession, dir: String): Unit =
    loaders(Tables(spark, dir)).foreach { case (n, df) => df.createOrReplaceTempView(n) }
}
