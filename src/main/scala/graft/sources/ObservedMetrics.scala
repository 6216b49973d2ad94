package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}

/** Zero-pass pipeline metrics via `observe()`: named aggregates accumulate
  * DURING whatever action consumes the DataFrame — no second scan — and
  * surface through QueryExecutionListener. The generic runner under
  * ErrorChannel.runWithMetrics and Multimodal.runWithMediaMetrics; at
  * 100 TB counting twice is not an option, so every pipeline metric rides
  * the consuming action's own pass. */
object ObservedMetrics {

  /** Attach `metrics` under `name`, run `action`, return its result plus
    * the metrics Row the execution recorded. */
  def run[A](df: DataFrame, name: String, metrics: Seq[Column])(
      action: DataFrame => A): (A, Row) = {
    val spark = df.sparkSession
    @volatile var observed: Option[Row] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get(name).foreach(row => observed = Some(row))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = action(df.observe(name, metrics.head, metrics.tail: _*))
      // listener callbacks are async; poll briefly for delivery
      val deadline = System.nanoTime() + 10_000_000_000L
      while (observed.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      (result, observed.getOrElse(throw new IllegalStateException(
        s"observed metrics '$name' not delivered")))
    } finally spark.listenerManager.unregister(listener)
  }
}
