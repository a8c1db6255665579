package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §4): two-phase salted aggregation.
  * Phase 1 shuffles on (key, salt) — a hot key spreads over `salts`
  * reducers instead of melting one — phase 2 re-aggregates the tiny
  * partial results on the key alone. AQE's skew-join splitting covers
  * JOIN skew at runtime; this covers AGGREGATION skew, which AQE does not
  * re-plan.
  *
  * `aggs` must be algebraic (re-aggregatable): sum/count/min/max — the
  * caller passes (phase1, phase2) pairs via [[SaltedAgg]].
  */
object Salting {

  final case class SaltedAgg(phase1: Column, phase2: String => Column, name: String)

  def sumOf(c: Column, as: String): SaltedAgg =
    SaltedAgg(sum(c).as(as), inner => sum(col(inner)).as(as), as)
  def countOf(as: String): SaltedAgg =
    SaltedAgg(count(lit(1)).as(as), inner => sum(col(inner)).as(as), as)
  def maxOf(c: Column, as: String): SaltedAgg =
    SaltedAgg(max(c).as(as), inner => max(col(inner)).as(as), as)

  /** [[latestCell]]'s aggregation under a hot row key (one uid holding a
    * large share of all versions — HBase-style timeline skew): max(struct)
    * is algebraic, so the latest-version struct flows through the two
    * phases and one hot uid spreads over `salts` reducers. Output ≡ the
    * direct `latest_cell` aggregation (SaltingSpec proves it on a skewed
    * corpus and pins the two-exchange plan). */
  def latestCellSalted(kv: DataFrame, salts: Int): DataFrame =
    saltedAgg(kv, col("uid"), salts,
      maxOf(struct(col("ms"), col("eid")), "latest"),
      countOf("n_versions"))
      .select(col("key").as("uid"), col("latest.eid").as("latest_eid"),
        col("latest.ms").as("latest_ms"), col("n_versions"))

  /** Aggregate `df` by `key` with a salt fan-out of `salts`. */
  def saltedAgg(df: DataFrame, key: Column, salts: Int, aggs: SaltedAgg*): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted.groupBy(key.as("__key"), col("__salt"))
      .agg(aggs.head.phase1, aggs.tail.map(_.phase1): _*)
    phase1.groupBy(col("__key"))
      .agg(aggs.head.phase2(aggs.head.name), aggs.tail.map(a => a.phase2(a.name)): _*)
      .withColumnRenamed("__key", "key")
  }
}
