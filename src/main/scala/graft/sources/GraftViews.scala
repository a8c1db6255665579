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

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Create (or replace) one temp view per corpus table over `dir`. */
  def register(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    Seq(
      "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings
    ).foreach { case (n, df) => df.createOrReplaceTempView(n) }
  }
}
