package org.apache.spark

/** Bridge to the `private[spark]` listener bus drain — lets metrics
  * snapshots wait for in-flight task-end events before reading counters
  * (same technique Spark's own test harness uses). */
object GraftListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
