package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan

/** The SURVEY §4 co-location story, executed: bucketing both sides of the
  * orders⋈lineitem join by orderkey removes the join shuffle entirely —
  * at 100 TB that's the difference between re-shuffling the fact tables on
  * every join and reading pre-co-located buckets.
  */
class BucketedJoinSpec extends SparkSpec {

  private def countShuffles(plan: SparkPlan): Int =
    plan.collect { case _: ShuffleExchangeExec => 1 }.sum

  test("bucketed orders⋈lineitem joins without a shuffle exchange") {
    // warehouse.dir is a static conf — the default ./spark-warehouse is
    // used and the managed tables are dropped (files removed) afterwards
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    val t = graft.Tables(spark, sf)
    t.lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    t.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_b")

    val joined = spark.table("li_b").join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity").cast("decimal(20,2)")).as("qty"))
    val executed = joined.queryExecution.executedPlan

    // the aggregation still shuffles (its key differs), but the JOIN must
    // consume the bucketed layout directly: with a shuffle-free join the
    // plan has exactly the one agg exchange.
    assert(countShuffles(executed) <= 1,
      s"expected bucket-co-located join, got plan:\n$executed")

    // and it computes the right thing
    val viaBuckets = joined.collect().map(r => (r.getString(0), r.getDecimal(1))).toMap
    val direct = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity").cast("decimal(20,2)")).as("qty"))
      .collect().map(r => (r.getString(0), r.getDecimal(1))).toMap
    assert(viaBuckets == direct)

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}
