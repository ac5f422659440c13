package org.apache.spark

/** Bridge to the `private[spark]` listener bus drain — lets metrics
  * snapshots wait for in-flight task-end events before reading counters
  * (same technique Spark's own test harness uses).
  *
  * `waitUntilEmpty` THROWS on a bus that stays busy past the timeout; a
  * drain is best-effort by nature (the snapshot is merely slightly stale),
  * so the timeout must never mask a caller's primary exception or skip its
  * listener cleanup — swallowed here, reported as `false`. */
object GraftListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: Exception => false }
}
