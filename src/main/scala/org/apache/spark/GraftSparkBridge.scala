package org.apache.spark

/** Narrow private[spark] bridge (the [[org.apache.spark.sql.GraftColumnBridge]]
  * pattern): exposes the listener-bus drain so the bench's per-query
  * shuffle/spill byte attribution is SYNCHRONOUS — task-end events ride
  * an async queue, and snapshotting counters without draining would
  * bleed one query's bytes into the next query's ledger. */
object GraftSparkBridge {
  /** Block until every queued listener event has been dispatched (or the
    * timeout passes — best-effort, a slow bus must not fail the bench). */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
