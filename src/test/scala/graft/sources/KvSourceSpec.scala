package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A stand-in "connector": the synthetic frame restricted to one topic —
  * shaped like what an HBase-connector-backed implementation returns
  * (must be a top-level class: KvSource resolves it reflectively by
  * name with a zero-arg constructor). */
final class OneTopicKvSource extends KvSource {
  override def kv(spark: SparkSession, dir: String): DataFrame =
    new SyntheticKvSource().kv(spark, dir).filter(col("topic") === "data.equality")
  override def envelopes(spark: SparkSession, dir: String): DataFrame =
    new SyntheticKvSource().envelopes(spark, dir).filter(col("topic") === "data.equality")
}

/** The injectable source seam: `spark.graft.kvSource` swaps the table
  * read under EVERY export operator without touching query code — the
  * explicit switch point for a production HBase/other connector. */
class KvSourceSpec extends SparkSpec {

  test("default source is the synthetic parquet view") {
    spark.conf.unset(KvSource.ConfKey)
    assert(KvSource.resolve(spark).isInstanceOf[SyntheticKvSource])
    assert(KvSource.kv(spark, sf).count() > 0)
  }

  test("a configured connector class is resolved and feeds the operators") {
    try {
      spark.conf.set(KvSource.ConfKey, classOf[OneTopicKvSource].getName)
      assert(KvSource.resolve(spark).isInstanceOf[OneTopicKvSource])
      // an export operator now reads ONLY what the injected source serves
      val topics = graft.queries.ExportQueries.topicTableMap(spark, sf)
        .select("topic").collect().map(_.getString(0)).toSet
      assert(topics == Set("data.equality"), s"got $topics")
      // and the envelope pipeline flows through the same seam
      val recs = graft.queries.ExportQueries.exportRecords(spark, sf)
      assert(recs.select("topic").distinct().collect().map(_.getString(0)).toSet == Set("data.equality"))
    } finally spark.conf.unset(KvSource.ConfKey)
  }

  test("kvPred pushes into the injected source's frame") {
    try {
      spark.conf.set(KvSource.ConfKey, classOf[OneTopicKvSource].getName)
      val n = KvSource.envelopes(spark, sf, col("eid") % 2 === 0)
        .select("eid").collect().map(_.getLong(0))
      assert(n.nonEmpty && n.forall(_ % 2 == 0))
    } finally spark.conf.unset(KvSource.ConfKey)
  }
}
