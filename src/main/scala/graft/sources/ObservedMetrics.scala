package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}

/** Zero-pass pipeline metrics via `observe()`: named aggregates accumulate
  * DURING whatever action consumes the DataFrame — no second scan — and
  * surface through QueryExecutionListener. The generic runner under
  * ErrorChannel.runWithMetrics and Multimodal.runWithMediaMetrics; at
  * 100 TB counting twice is not an option, so every pipeline metric rides
  * the consuming action's own pass. */
object ObservedMetrics {

  private val runSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Attach `metrics` under `name`, run `action`, return its result plus
    * the metrics Row the execution recorded. The observation is registered
    * under a per-call unique name internally, so concurrent runs sharing
    * `name` on one session cannot deliver each other's rows. */
  def run[A](df: DataFrame, name: String, metrics: Seq[Column])(
      action: DataFrame => A): (A, Row) = {
    val spark = df.sparkSession
    val unique = s"$name#${runSeq.incrementAndGet()}"
    capture(spark, unique)(action(df.observe(unique, metrics.head, metrics.tail: _*)))
  }

  /** Run `action` and return the metrics Row recorded under `name` during
    * it — for frames that ALREADY carry `.observe(name, ...)` in their plan
    * (e.g. Multimodal.observedMedia baked into q70-q72). The name here is
    * exact, so concurrent executions observing the same name on one session
    * could deliver each other's rows — fine for the sequential query
    * runners; use [[run]]'s unique-suffix path otherwise. */
  def capture[A](spark: org.apache.spark.sql.SparkSession, name: String)(
      action: => A): (A, Row) = {
    @volatile var observed: Option[Row] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        if (observed.isEmpty)
          qe.observedMetrics.get(name).foreach(row => observed = Some(row))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = action
      // listener callbacks are async; poll briefly for delivery
      val deadline = System.nanoTime() + 10_000_000_000L
      while (observed.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      (result, observed.getOrElse(throw new IllegalStateException(
        s"observed metrics '$name' not delivered")))
    } finally spark.listenerManager.unregister(listener)
  }
}
