package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Conf-gated presentation sort for CORPUS-CARDINALITY outputs.
  *
  * Several driver rows end in a global `orderBy` that exists ONLY so the
  * driver's row-hash compare is deterministic — semantically the result is
  * a row SET. On bounded outputs that sort is free; on corpus-cardinality
  * outputs (per-user rollups like salted_join / user_history) it is a
  * needless range exchange + full sort at 100 TB. Production runs set
  * [[HashSort.Conf]] = false and get the identical row set with the range
  * exchange gone (plan-pinned in PlanRegressionSpec); the driver gate
  * keeps the default (true) and its deterministic hashing. */
object HashSort {
  val Conf = "spark.graft.hash.sort"

  def apply(df: DataFrame)(cols: Column*): DataFrame =
    if (df.sparkSession.conf.get(Conf, "true").toBoolean) df.orderBy(cols: _*) else df
}
