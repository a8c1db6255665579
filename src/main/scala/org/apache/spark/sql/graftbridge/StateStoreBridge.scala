package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Bridge to the executor-side state-store registry (private[sql]).
  *
  * Why graft needs it: `StateStore.loadedProviders` is JVM-global and
  * providers survive `query.stop()` — they are evicted only when another
  * query re-claims the same operator/partition slot or the maintenance
  * thread drops them. A session that runs MANY short streaming replays
  * (the bench runs ~20 per full pass) accumulates hundreds of RocksDB
  * providers whose 60s-interval maintenance (snapshot + changelog work)
  * steals CPU from every later query — measured on the r7 full-order
  * bench as stream_session_builtin 9.8s late in the run vs 5.5s isolated.
  * Each replay harness unloads the registry after its final stop: the
  * replays own fresh per-run checkpoints, so an unload is pure cleanup
  * (an active concurrent query would simply reload from its checkpoint).
  */
object StateStoreBridge {
  def unloadAll(): Unit = StateStore.unloadAll()
}
