package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregation equals direct groupBy on a skewed frame") {
    // 90% of rows share one hot key
    val skewed = spark.range(0, 50000)
      .select(when($"id" % 10 < 9, lit("HOT")).otherwise(concat(lit("k"), $"id" % 97)).as("k"),
        ($"id" % 1000).cast("double").as("v"))
    val salted = Salting.saltedAgg(skewed, $"k", salts = 16,
        Salting.sumOf($"v", "sum_v"), Salting.countOf("n"), Salting.maxOf($"v", "max_v"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    val direct = skewed.groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"), max($"v").as("max_v"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (s, n, m)) =>
      val (ds, dn, dm) = direct(k)
      assert(n == dn && m == dm && math.abs(s - ds) < 1e-6, s"mismatch for $k")
    }
    // the hot key really was spread: phase-1 shuffle key includes the salt
    val plan = Salting.saltedAgg(skewed, $"k", 16, Salting.countOf("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "salt column missing from the plan")
  }

  test("salted latest_cell equals the direct aggregation under a hot uid") {
    // synthetic timeline skew on the REAL kv corpus: one uid absorbs 10%
    // of all rows (every eid % 10 == 0 remapped to uid 0)
    val skewed = graft.kv.KvModel.kv(spark, sf)
      .withColumn("uid", when($"eid" % 10 === 0, lit(0L)).otherwise($"uid"))
    val direct = skewed.groupBy($"uid")
      .agg(max_by($"eid", struct($"ms", $"eid")).as("latest_eid"),
        max(struct($"ms", $"eid")).getField("ms").as("latest_ms"),
        count(lit(1)).as("n_versions"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val salted = Salting.latestCellSalted(skewed, salts = 16)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(salted == direct)
    // the hot uid was actually spread: phase 1 shuffles on (__key, __salt),
    // phase 2 re-aggregates on __key alone → two hash exchanges
    val plan = Salting.latestCellSalted(skewed, 16).queryExecution.executedPlan.toString
    assert(plan.contains("__salt"))
    assert("hashpartitioning".r.findAllIn(plan).size >= 2,
      s"expected two-phase exchanges:\n$plan")
  }
}
