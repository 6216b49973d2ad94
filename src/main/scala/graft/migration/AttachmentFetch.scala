package graft.migration

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{BinaryType, StringType, StructField}
import graft.sources.v2.{HttpFetch, RateLimitConf}

/** S6: live attachment-payload fetch (TicketProcessor.php:295-299 —
  * `file_get_contents($url)` per attachment at migration time, with the
  * catch-path feeding the failed-attachment note, TP:313-333).
  *
  * The Spark form is a map-only fetch stage `urls → (payload | failure)`
  * over `mapPartitions`: each executor task streams its partition's rows,
  * GETs the url through the same per-JVM, per-origin token bucket and
  * 429/5xx Retry-After backoff the paged scan uses (HttpFetch), and appends
  *
  *   - `payload`      binary — the fetched bytes, null on failure
  *   - `fetch_error`  string — null on success, the failure detail otherwise
  *
  * so the existing stage-A split (TicketTransform.uploadAttachments:
  * payload null → failed-note path) consumes the output unchanged. A fetch
  * failure NEVER fails the task (F6 quarantine discipline): the row is
  * retained with a null payload exactly as the reference degrades each
  * failed upload to a private note.
  *
  * Scale shape: no shuffle — fetches run partition-parallel where the rows
  * already live; the aggregate request rate is ratePerWindow × executor
  * count (the same decomposition as RateLimitedSink.publish), so size
  * `ratePerWindow` per-executor. Blobs materialize only from this stage
  * onward, and stage A immediately reduces them to (mime, hash).
  */
object AttachmentFetch {

  val FetchError = "fetch_error"

  /** Append fetched `payload` + `fetch_error` columns to `attachments`.
    *
    * @param urlCol        column holding the absolute attachment URL
    * @param ratePerWindow per-origin requests per window per JVM
    *                      (0 = unthrottled)
    * @param windowMillis  throttle window length
    * @param maxRetries    bounded 429/5xx retries before the row is failed
    */
  def fetchPayloads(
      attachments: DataFrame,
      urlCol: String = "url",
      ratePerWindow: Int = 0,
      windowMillis: Long = 60000L,
      maxRetries: Int = 3): DataFrame = {
    val inSchema = attachments.schema
    require(!inSchema.fieldNames.contains("payload"),
      "fetchPayloads input already carries a payload column — " +
        "payloads are pre-materialized, no fetch stage needed")
    require(inSchema.fieldNames.contains(urlCol),
      s"fetchPayloads requires a '$urlCol' column")
    val outSchema = inSchema
      .add(StructField("payload", BinaryType, nullable = true))
      .add(StructField(FetchError, StringType, nullable = true))
    val urlIdx = inSchema.fieldIndex(urlCol)
    val rate = RateLimitConf(ratePerWindow, windowMillis)
    attachments.mapPartitions { it =>
      it.map { r =>
        val url = if (r.isNullAt(urlIdx)) null else r.getString(urlIdx)
        val (payload, err): (Array[Byte], String) =
          if (url == null) (null, "attachment url is null")
          else try (HttpFetch.getBytes(url, rate, maxRetries), null)
          catch {
            // TP:313: "For whatever reason the upload failed" — any
            // exception degrades to the failed-note path, never a task kill
            case scala.util.control.NonFatal(e) =>
              (null, s"GET $url failed: ${e.getMessage}")
          }
        Row.fromSeq(r.toSeq :+ payload :+ err)
      }
    }(Encoders.row(outSchema))
  }
}
