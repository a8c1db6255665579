package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL API surface: the corpus registers as temp views, SQL results
  * match the DataFrame path exactly (including the normalized events ts
  * contract), and SQL plans get the same Catalyst treatment (broadcast
  * under the tuned threshold). */
class GraftViewsSpec extends SparkSpec {

  test("spark.sql over registered views ≡ the DataFrame path") {
    GraftViews.register(spark, sf)
    val viaSql = spark.sql(
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1")
      .collect().map(_.toSeq).toSeq
    val viaDf = graft.Tables(spark, sf).lineitem
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag")).collect().map(_.toSeq).toSeq
    assert(viaSql == viaDf)
    // events view carries the normalized contract — ts_ms usable from SQL
    val n = spark.sql(
      s"SELECT count(*) FROM events WHERE ts_ms >= ${graft.queries.ExportQueries.T1}")
      .head().getLong(0)
    val nDf = graft.Tables(spark, sf).events
      .filter(col("ts_ms") >= graft.queries.ExportQueries.T1).count()
    assert(n == nDf && n > 0)
  }

  test("SQL joins over views hit the tuned planner (broadcast under threshold)") {
    GraftViews.register(spark, sf)
    val df = spark.sql(
      """SELECT n_name, count(*) AS n FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "small dimension not broadcast through the SQL path")
  }
}
