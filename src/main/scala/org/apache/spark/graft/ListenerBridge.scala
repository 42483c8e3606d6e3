package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Minimal `private[spark]` access bridge: the listener bus delivers
  * `onTaskEnd` asynchronously, so any reader of listener-fed counters
  * (per-query CPU attribution in [[graft.Bench]], the zero-retry/zero-spill
  * gates in StressSpec) must drain the bus before reading or the counters
  * can be short by whatever was still in flight — an assertion that passes
  * vacuously, a query billed its successor's tasks. Spark's own test
  * harness does exactly this via `LiveListenerBus.waitUntilEmpty`, which is
  * `private[spark]`; this object lives in a subpackage of
  * `org.apache.spark` purely to re-export that one call. No other internal
  * API is touched.
  */
object ListenerBridge {

  /** Block until every event posted to the bus so far has been delivered
    * to every listener (or the timeout elapses — surfaced as the
    * underlying TimeoutException, never swallowed: a silently-partial
    * drain would re-create exactly the vacuous-pass hazard this exists to
    * remove).
    */
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
