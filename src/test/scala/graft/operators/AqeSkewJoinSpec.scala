package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SURVEY §4's join-skew claim, EXECUTED: GraftSession relies on AQE's
  * runtime skew-join splitting (not manual salting) for skewed JOIN keys.
  * This proves the mechanism actually fires: a hot key holding ~90% of
  * the probe side is split at runtime — the final adaptive plan marks the
  * join `skew=true` — and the result still equals the plain join. */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed join at runtime") {
    import spark.implicits._
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
    val prev = keys.map(k => k -> spark.conf.getAll.get(k)).toMap
    try {
      // proof-sized thresholds: the hot partition (~90% of rows, padded
      // values) dwarfs the median partition and exceeds the byte floor
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      spark.conf.set("spark.sql.shuffle.partitions", "8")

      val pad = "x" * 128
      val left = spark.range(0, 120000)
        .select(when($"id" % 10 =!= 0, lit(7L)).otherwise($"id").as("k"),
          concat(lit(pad), $"id").as("v"))
      val right = spark.range(0, 64).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = left.join(right, "k")

      // drive THIS queryExecution (count() would plan its own) so the
      // adaptive plan we inspect is the one that ran
      val qe = joined.queryExecution
      val n = qe.toRdd.count()
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$finalPlan")

      // correctness under the split: equals the unskewed expectation
      // (hot key 7 matches right row 7; every id % 10 == 0 below 64... )
      val expected = left.collect().map(_.getLong(0))
        .count(k => k >= 0 && k < 64)
      assert(n == expected, s"skew-split join returned $n, expected $expected")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
