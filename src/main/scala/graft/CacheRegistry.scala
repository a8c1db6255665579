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
  private val live = mutable.ArrayBuffer.empty[DataFrame]

  def track(df: DataFrame): DataFrame = synchronized { live += df; df }

  /** Release every tracked cache (idempotent, never throws). */
  def releaseAll(): Unit = synchronized {
    live.foreach(df => try df.unpersist() catch { case scala.util.control.NonFatal(_) => () })
    live.clear()
  }
}
