package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytics / bench-head queries (SURVEY §2 №33-35).
  *
  * Cross-engine determinism rules (see SURVEY §5): every monetary aggregate is
  * rounded to its exact decimal grid per-row and summed as DECIMAL (exact,
  * associative — safe under any partial-aggregation order), then cast to
  * DOUBLE for output. Averages divide exact sums by counts in double and are
  * rounded. Output never contains raw timestamps — only formatted strings.
  */
object Analytics {

  /** TPC-H Q1-style pricing summary. Single hash aggregation, partial
    * (map-side) combine, grouping cardinality 6 — at 100 TB this is a scan
    * bound job: filter + projection push to parquet, one narrow shuffle of
    * 6xN_partitions pre-aggregated rows.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast("decimal(20,2)")).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast("decimal(20,2)")).cast("double").as("sum_base_price"),
        sum(round($"l_extendedprice" * (lit(1) - $"l_discount"), 4).cast("decimal(24,4)")).cast("double").as("sum_disc_price"),
        sum(round($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"), 6).cast("decimal(28,6)")).cast("double").as("sum_charge"),
        round(sum($"l_quantity".cast("decimal(20,2)")).cast("double") / count(lit(1)) + 1e-9, 6).as("avg_qty"),
        round(sum($"l_extendedprice".cast("decimal(20,2)")).cast("double") / count(lit(1)) + 1e-9, 6).as("avg_price"),
        round(sum($"l_discount".cast("decimal(20,2)")).cast("double") / count(lit(1)) + 1e-9, 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount),4) AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax),6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE)/count(*) + 0.000000001, 6) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE)/count(*) + 0.000000001, 6) AS avg_price,
      |  round(CAST(sum(CAST(l_discount AS DECIMAL(20,2))) AS DOUBLE)/count(*) + 0.000000001, 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style shipping priority. The dimension (filtered customer) is
    * tiny relative to the facts — explicitly broadcast so the big sides never
    * shuffle for it; orders⋈lineitem shuffles on orderkey once. Top-N via
    * exact-decimal revenue with orderkey tiebreak (fully deterministic).
    */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val cust = t.customer.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val ord = t.orders.filter($"o_orderdate" < lit("1999-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = t.lineitem.filter($"l_shipdate" > lit("1999-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val custOrders = ord.join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"o_orderdate")
    li.join(custOrders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(sum(round($"l_extendedprice" * (lit(1) - $"l_discount"), 4).cast("decimal(24,4)")).as("rev"))
      .select($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"),
        $"rev".cast("double").as("revenue"))
      .orderBy($"rev".desc, $"l_orderkey")
      .limit(10)
  }

  /** Event sessionization (SURVEY §2 №35, batch form): 30-min-gap sessions
    * via lag + running sum, ONE window pass partitioned by user (shuffle on
    * user_id only; per-user ordering by (ts, event_id) is fully
    * deterministic under timestamp ties).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gapMs = 1800000L
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
    Tables(spark, dir).events
      .withColumn("prev_ms", lag($"ts_ms", 1).over(wOrd))
      .withColumn("new_sess", when($"prev_ms".isNull || $"ts_ms" - $"prev_ms" > gapMs, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_sess").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"), min($"ts_ms").as("start_ms"), max($"ts_ms").as("end_ms"))
      .withColumn("duration_ms", $"end_ms" - $"start_ms")
      .orderBy($"user_id", $"session_id")
  }

  val sessionizeSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, ts_ms,
      |    CASE WHEN lag(ts_ms) OVER w IS NULL OR ts_ms - lag(ts_ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
      |sess AS (
      |  SELECT user_id, ts_ms,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
      |  max(ts_ms) - min(ts_ms) AS duration_ms
      |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** №51 grouped_topk — the GroupedTopK whole-operator extension driven
    * directly (logical node → pruning rule → strategy → two-phase exec,
    * graft.plans.GroupedTopK): top-10 orders by price within each order
    * priority. The custom plan's scale shape vs the window-function
    * formulation the oracle uses: per-partition bounded heaps emit ≤k rows
    * per (group, partition) into ONE hash exchange on the group — a
    * row_number window would shuffle and sort EVERY order row. Plan-pinned
    * (PlanRegressionSpec asserts GroupedTopKPartial/Final nodes). */
  def groupedTopK(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir).orders
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
    graft.plans.GroupedTopK.rankedTopK(ord, "o_orderpriority", "o_totalprice", "o_orderkey", 10)
      .orderBy(col("o_orderpriority"), col("rank"))
  }

  /** row_number QUALIFY oracle; rank CAST to INTEGER to match the exec's
    * IntegerType rank (the driver hash is type-sensitive). */
  val groupedTopKSql: String =
    """WITH r AS (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_orderpriority
      |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rank
      |  FROM orders)
      |SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM r
      |WHERE rank <= 10 ORDER BY o_orderpriority, rank""".stripMargin

  val q3Sql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount),4) AS DECIMAL(24,4))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY sum(CAST(round(l_extendedprice*(1-l_discount),4) AS DECIMAL(24,4))) DESC, l_orderkey
      |LIMIT 10""".stripMargin
}
