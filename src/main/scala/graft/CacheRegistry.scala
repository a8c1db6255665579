package graft

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Tracks DataFrames persisted inside query builders so long-lived sessions
  * (bench loops, notebooks, the Verify sweep) can release them once the
  * consuming action has run. A query builder cannot `unpersist()` itself:
  * the plan it RETURNS still references the cache, and releasing before the
  * action would silently recompute the corpus once per consumer. The
  * contract is: builders `track` their persists; the driver of the action
  * calls `releaseAll()` when the result is materialized.
  */
object CacheRegistry {
  import org.apache.spark.sql.SparkSession
  private val live = mutable.Map.empty[SparkSession, mutable.ArrayBuffer[DataFrame]]

  def track(df: DataFrame): DataFrame = synchronized {
    live.getOrElseUpdate(df.sparkSession, mutable.ArrayBuffer.empty) += df; df
  }

  /** Release the caches tracked for ONE session (idempotent, never
    * throws) — a second session or a concurrent streaming job sharing the
    * JVM keeps its caches. */
  def releaseAll(spark: SparkSession): Unit = synchronized {
    live.remove(spark).foreach(_.foreach(df =>
      try df.unpersist() catch { case scala.util.control.NonFatal(_) => () }))
  }

  /** Release everything tracked in this JVM (single-session drivers). */
  def releaseAll(): Unit = synchronized {
    live.keys.toSeq.foreach(releaseAll)
  }
}
