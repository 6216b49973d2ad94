package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.util.CollectionAccumulator

/** K1/K2 default HTTP publisher — the reference's per-record REST publish
  * with ApiException capture (TicketPublisher.php:30-91,
  * CustomerPublisher.php:28-69), shipped as a concrete `post` for
  * [[RateLimitedSink.publish]] instead of leaving the HTTP layer abstract.
  *
  * Per record (TicketPublisher foreach): POST the row as JSON to
  * `endpoint`; 2xx is success; 429/5xx retry with Retry-After backoff.
  * The honored sleep is hard-clamped at `maxRetryAfterMs` (default 4 s,
  * above the exponential schedule's 250·2^attempt ceiling): a server
  * demanding a longer hold — `Retry-After: 86400` would otherwise stall an
  * executor task inside `foreachPartition` for a day — fails the record
  * into the error channel instead of being honored. Both delta-seconds and
  * HTTP-date `Retry-After` forms are parsed (RFC 9110 §10.2.3); an
  * unparseable value falls back to the exponential schedule. Any other
  * response is captured — NEVER thrown — as an error
  * pair into a driver-side accumulator, the Spark form of the reference's
  * `$errorMapping[type][] = detail` (TicketPublisher.php:56-61):
  *
  *  - a structured API error body (`errors: [{property, message, ...}]`,
  *    APIHelper.php:224-233) groups by each error's `message` with a
  *    `[property] message` detail line — the same `[%s] %s` shape as the
  *    X16 column function `MigrationFunctions.formatErrors`;
  *  - an unstructured failure groups by `HTTP <code>` / the exception
  *    message with the record identifier as the detail
  *    (TicketPublisher.php:62, 64-76).
  *
  * The captured pairs convert to the standard error channel
  * (`error_type`/`error_detail`), so `ErrorChannel.groupedReport` /
  * `writeCsvReport` produce exactly the reference's grouped CSV
  * (APIHelper.php:241-261) with no extra plumbing.
  *
  * Scale: the accumulator carries only FAILED records' (type, detail)
  * strings — the expected-case volume is tiny; a pipeline expecting mass
  * failure should quarantine pre-publish via ErrorChannel instead. Rate
  * limiting stays the sink's job (token bucket per partition); this class
  * only posts and records.
  */
final class HttpPublisher(
    endpoint: String,
    record: ((String, String)) => Unit,
    idCol: Option[String] = None,
    maxRetries: Int = 3,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 30000,
    maxRetryAfterMs: Long = 4000L) extends (Seq[Row] => Unit) with Serializable {

  /** Accumulator-backed form (the classic foreachPartition path): the
    * captured pairs ride a driver-side CollectionAccumulator. The DSv2
    * write path ([[graft.sources.v2.HttpPublishSource]]) passes a
    * task-local buffer instead and ships the pairs through its
    * WriterCommitMessage — same capture logic, commit-protocol
    * transport. */
  def this(
      endpoint: String,
      errors: CollectionAccumulator[(String, String)],
      idCol: Option[String],
      maxRetries: Int) =
    this(endpoint, (e: (String, String)) => errors.add(e), idCol, maxRetries)

  def this(
      endpoint: String,
      errors: CollectionAccumulator[(String, String)]) =
    this(endpoint, (e: (String, String)) => errors.add(e))


  private val core = new HttpPostCore(endpoint, record, maxRetries,
    connectTimeoutMs, readTimeoutMs, maxRetryAfterMs)

  override def apply(batch: Seq[Row]): Unit = batch.foreach(postOne)

  /** The record identifier in error details (the reference cites
    * "(Groove ticket #N)", TicketPublisher.php:56). */
  private def identify(row: Row): String =
    idCol.map(c => s"($c=${row.getAs[Any](c)})")
      .getOrElse(s"(record ${row.json.take(80)})")

  private def postOne(row: Row): Unit = core.post(row.json, identify(row))
}

/** The transport half of the publisher — one JSON body POSTed with the
  * full retry/Retry-After/ApiException-capture contract documented at
  * [[HttpPublisher]], factored row-representation-free so BOTH publish
  * surfaces share it: the classic Row-based `foreachPartition` path and
  * the DSv2 InternalRow write path
  * ([[graft.sources.v2.HttpPublishSource]]), whose rows never convert
  * to external Rows. */
private[sources] final class HttpPostCore(
    endpoint: String,
    record: ((String, String)) => Unit,
    maxRetries: Int = 3,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 30000,
    maxRetryAfterMs: Long = 4000L) extends Serializable {

  /** POST `bodyJson`; `ident` is the record identifier used in captured
    * error details; `headers` are extra request headers (the DSv2 path's
    * optional Idempotency-Key rides here — empty for the classic path,
    * keeping its requests byte-identical). Never throws (capture
    * contract). */
  def post(
      bodyJson: String, ident: String,
      headers: Seq[(String, String)] = Nil): Unit = {
    val body = bodyJson.getBytes("UTF-8")
    var attempt = 0
    try {
      while (true) {
        val conn = java.net.URI.create(endpoint).toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/json")
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        conn.setDoOutput(true)
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        try {
          val out = conn.getOutputStream
          try { out.write(body); out.flush() } finally out.close()
          val code = conn.getResponseCode
          if (code >= 200 && code < 300) return
          val retryable = code == 429 || code >= 500
          if (retryable && attempt < maxRetries) {
            val headerMs = Option(conn.getHeaderField("Retry-After"))
              .flatMap(HttpPublisher.parseRetryAfterMs)
            if (headerMs.exists(_ > maxRetryAfterMs)) {
              // a day-long hold is a refusal, not a retry hint: fail the
              // record rather than stall the task (or disobey the server
              // by retrying early)
              recordFailure(code,
                s"Retry-After ${headerMs.get / 1000}s exceeds the " +
                  s"${maxRetryAfterMs}ms retry clamp", ident)
              return
            }
            Thread.sleep(
              headerMs.getOrElse(250L * (1L << attempt)).min(maxRetryAfterMs))
            attempt += 1
          } else {
            recordFailure(code, readErrorBody(conn), ident)
            return
          }
        } finally conn.disconnect()
      }
    } catch {
      // connection-level failure (the reference's CurlException arm,
      // TicketPublisher.php:64-67): captured, never thrown
      case scala.util.control.NonFatal(e) =>
        record((String.valueOf(e.getMessage),
          s"publish to $endpoint failed $ident"))
    }
  }

  private def readErrorBody(conn: java.net.HttpURLConnection): String = {
    val in = Option(conn.getErrorStream).orElse(
      scala.util.Try(Option(conn.getInputStream)).getOrElse(None))
    in.map { s =>
      try new String(s.readAllBytes(), "UTF-8") finally s.close()
    }.getOrElse("")
  }

  private def recordFailure(code: Int, body: String, ident: String): Unit = {
    val pairs = HttpPublisher.apiErrorPairs(body)
    if (pairs.nonEmpty)
      // ApiException with a structured errors array: group by the error
      // message, detail = "[property] message (ident)" (TP:56-58)
      pairs.foreach { case (property, message) =>
        record((message, s"Error: [$property] $message $ident"))
      }
    else
      // no structured errors: group by the HTTP failure itself (TP:62)
      record((s"HTTP $code", s"$ident: ${body.take(200)}"))
  }
}

object HttpPublisher {

  /** `{"property": "...", ..., "message": "..."}` pairs from an API error
    * body — the fields ApiException exposes (APIHelper.php:228-231). A
    * lenient regex parse: only same-object property→message order is
    * recognized, anything else degrades to the unstructured arm. */
  private val ApiErrorRe =
    """"property"\s*:\s*"([^"]*)"\s*[^{}]*?"message"\s*:\s*"([^"]*)"""".r

  private[sources] def apiErrorPairs(body: String): Seq[(String, String)] =
    ApiErrorRe.findAllMatchIn(body).map(m => (m.group(1), m.group(2))).toSeq

  /** `Retry-After` → millis: delta-seconds (`120`) or HTTP-date
    * (`Tue, 12 Aug 2026 17:00:00 GMT`), per RFC 9110 §10.2.3; a past date
    * or negative delta is 0 (retry now), an overflowing delta saturates
    * (the caller's clamp then fails the record), anything unparseable is
    * None (caller falls back to exponential backoff). Never negative —
    * a negative return would reach Thread.sleep and throw. */
  private[graft] def parseRetryAfterMs(s: String): Option[Long] =
    scala.util.Try(s.trim.toLong).toOption.map { sec =>
      if (sec <= 0L) 0L
      else if (sec > Long.MaxValue / 1000L) Long.MaxValue
      else sec * 1000L
    }.orElse(scala.util.Try {
      val at = java.time.ZonedDateTime.parse(
        s.trim, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
      math.max(0L, java.time.Duration.between(
        java.time.Instant.now(), at.toInstant).toMillis)
    }.toOption)

  /** Publish `df` to `endpoint` through [[RateLimitedSink.publishCounted]]
    * with the default HTTP publisher. Returns (batches, rowsPosted, errors)
    * where `errors` is an `error_type`/`error_detail` DataFrame ready for
    * `ErrorChannel.groupedReport`/`writeCsvReport` (the reference's
    * end-of-run CSV export, TicketPublisher.php:80-86). `rowsPosted`
    * counts attempts; failed records appear in `errors` (one row per
    * captured pair, as in `$errorMapping`).
    *
    * Driver-memory bound (r17 verdict #1, applied to the classic path):
    * the accumulator is [[BoundedErrorAccumulator]] — exact per-TYPE
    * counts (bounded by distinct error types, not failed rows) plus at
    * most `maxErrorSamples` sampled pairs. When a type overflows the
    * sample cap, `errors` carries its sampled rows plus ONE flagged
    * overflow row stating the exact count — a down endpoint failing
    * every record of a 100 TB publish costs the driver the cap, not one
    * pair per row. A pipeline needing complete per-record detail at that
    * volume should use the DSv2 path (graft-http), whose spool keeps it
    * executor-side. */
  def publish(
      df: DataFrame,
      endpoint: String,
      ratePerMinute: Int,
      batchSize: Int,
      parallelism: Int,
      idCol: Option[String] = None,
      maxRetries: Int = 3,
      maxErrorSamples: Int = 10000): (Long, Long, DataFrame) = {
    val spark = df.sparkSession
    val acc = new BoundedErrorAccumulator(maxErrorSamples)
    spark.sparkContext.register(acc, "graft.publish.errors")
    val (batches, rows) = RateLimitedSink.publishCounted(
      df, ratePerMinute, batchSize, parallelism)(
      new HttpPublisher(endpoint, (e: (String, String)) => acc.add(e),
        idCol, maxRetries))
    import spark.implicits._
    val be = acc.value
    val sampledByType =
      be.samples.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val overflow = be.typeCounts.toSeq.sortBy(_._1).collect {
      case (t, n) if n > sampledByType.getOrElse(t, 0L) =>
        (t, s"[sample cap ${be.cap} reached] " +
          s"${n - sampledByType.getOrElse(t, 0L)} more detail lines " +
          s"dropped (exact '$t' count: $n)")
    }
    val errDf = (be.samples ++ overflow)
      .toDF(graft.migration.ErrorChannel.ErrorType,
        graft.migration.ErrorChannel.ErrorDetail)
    (batches, rows, errDf)
  }
}

/** Value of [[BoundedErrorAccumulator]]: at most `cap` first-seen pairs
  * plus EXACT per-type counts (state bounded by cap + distinct types). */
final case class BoundedErrors(
    samples: Seq[(String, String)],
    typeCounts: Map[String, Long],
    cap: Int) {
  def total: Long = typeCounts.values.sum
}

/** Driver-bounded replacement for the publish paths' historical
  * CollectionAccumulator (r17 verdict #1): `add` keeps exact counts per
  * error TYPE (a handful of strings — HTTP codes and API messages) and
  * samples at most `cap` (type, detail) pairs, so driver state no longer
  * scales with failed-row count. Merge order across tasks is
  * nondeterministic (as with any accumulator), so WHICH pairs survive
  * the cap is not pinned — only that ≤ cap do and counts stay exact. */
final class BoundedErrorAccumulator(val cap: Int)
    extends org.apache.spark.util.AccumulatorV2[(String, String), BoundedErrors] {
  require(cap >= 0, "sample cap must be >= 0")
  private val samples =
    scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  private val counts = scala.collection.mutable.HashMap.empty[String, Long]

  override def isZero: Boolean = synchronized(counts.isEmpty)

  override def copy(): org.apache.spark.util.AccumulatorV2[(String, String), BoundedErrors] =
    synchronized {
      val c = new BoundedErrorAccumulator(cap)
      c.samples ++= samples
      counts.foreach { case (k, v) => c.counts(k) = v }
      c
    }

  override def reset(): Unit = synchronized {
    samples.clear(); counts.clear()
  }

  override def add(v: (String, String)): Unit = synchronized {
    counts(v._1) = counts.getOrElse(v._1, 0L) + 1L
    if (samples.size < cap) samples += v
  }

  override def merge(
      other: org.apache.spark.util.AccumulatorV2[(String, String), BoundedErrors]): Unit =
    other match {
      case b: BoundedErrorAccumulator =>
        val ov = b.value
        synchronized {
          ov.typeCounts.foreach { case (k, n) =>
            counts(k) = counts.getOrElse(k, 0L) + n
          }
          samples ++= ov.samples.take(math.max(0, cap - samples.size))
        }
      case _ => throw new UnsupportedOperationException(
        s"cannot merge ${other.getClass.getName}")
    }

  override def value: BoundedErrors =
    synchronized(BoundedErrors(samples.toSeq, counts.toMap, cap))
}
