package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge: `SparkContext.listenerBus` is `private[spark]`. The plan-audit
  * tool ([[graft.Plans]]) registers a `QueryExecutionListener` to capture
  * the EXECUTED plans of multi-stage drill rows (whose final frame is a
  * driver-assembled LocalTableScan — the executed serve/repair stages are
  * the plans a scale review needs, r14 verdict item 4); listener delivery
  * is async, so the capture must drain the bus before reading what it
  * collected. Same shape as the test-side TestListenerBridge. */
object ListenerBridge {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
