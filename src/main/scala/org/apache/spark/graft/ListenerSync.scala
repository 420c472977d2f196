package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to `SparkContext.listenerBus.waitUntilEmpty()` (both
  * `private[spark]`, hence this file's package). The bus is
  * asynchronous: when an action returns, its last task-end events may
  * still be queued, so a listener-based per-query counter read without
  * draining first would charge this query's tail to the NEXT query.
  * Draining makes the read exact — the same technique Spark's own test
  * suites use to assert on listener state.
  */
object ListenerSync {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
