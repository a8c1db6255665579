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
}
