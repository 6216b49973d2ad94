package graft.migration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Error-channel-as-data (F6: per-record try/catch quarantine,
  * TicketProcessor.php:450-461, CustomerProcessor.php:163-166,
  * TicketPublisher.php:49-76). A transform never throws per-row: rows carry
  * `error_type` (null = ok) + `error_detail`, and the caller splits. The
  * grouped CSV report is A3 (groupBy+collect) immediately re-flattened by
  * A4 (explode) — expressed here as the direct groupBy count + examples.
  */
object ErrorChannel {
  val ErrorType = "error_type"
  val ErrorDetail = "error_detail"

  def ok(df: DataFrame): DataFrame =
    df.filter(col(ErrorType).isNull).drop(ErrorType, ErrorDetail)

  def errors(df: DataFrame): DataFrame =
    df.filter(col(ErrorType).isNotNull)
      .select(col(ErrorType), col(ErrorDetail))

  /** A3 error grouping (errorMapping[type][] = detail) with deterministic
    * ordering; the row form the CSV sink (K4, AH:241-261) writes. */
  def groupedReport(df: DataFrame): DataFrame =
    errors(df)
      .groupBy(col(ErrorType))
      .agg(count(lit(1)).as("n"),
        array_join(array_sort(collect_list(col(ErrorDetail))), "; ").as("details"))
      .orderBy(col(ErrorType))

  /** K4 (AH:241-261): timestamped CSV error report. The timestamp is
    * driver-side (X12) and injected so runs stay reproducible in tests. */
  def writeCsvReport(df: DataFrame, outDir: String, stamp: String): Unit =
    groupedReport(df)
      .coalesce(1)
      .write.mode("overwrite").option("header", "true")
      .csv(s"$outDir/sync-errors-$stamp")

  /** Conservation check: ok + err == total (the F6 invariant — record
    * failure never drops rows silently). */
  def conserves(df: DataFrame): Boolean =
    ok(df).count() + errors(df).count() == df.count()

  /** Attach zero-pass error metrics via `observe()`: n_rows / n_errors /
    * n_ok accumulate DURING whatever action consumes the DataFrame — no
    * second scan, unlike `conserves` — and surface through
    * `QueryExecutionListener` / `StreamingQueryListener` (the A2 running
    * counts + A5 progress feed at 100 TB, where counting twice is not an
    * option). Read them from `df.observe`'s named metrics after an action
    * or via `lastObservedMetrics`. */
  val MetricsName = "graft_error_metrics"

  private def metricCols: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_rows"),
    count(when(col(ErrorType).isNotNull, 1)).as("n_errors"),
    count(when(col(ErrorType).isNull, 1)).as("n_ok"))

  def observed(df: DataFrame): DataFrame =
    df.observe(MetricsName, metricCols.head, metricCols.tail: _*)

  /** Convenience: run `action` on the observed frame and return the
    * (n_rows, n_errors, n_ok) the execution recorded. */
  def runWithMetrics[A](df: DataFrame)(action: DataFrame => A): (A, (Long, Long, Long)) = {
    val (result, row) =
      graft.sources.ObservedMetrics.run(df, MetricsName, metricCols)(action)
    (result, (row.getLong(0), row.getLong(1), row.getLong(2)))
  }
}
