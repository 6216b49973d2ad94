package graft.sources.v2

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Exactly-once STREAMING ingestion into the keyed connector layout —
  * the foreachBatch + batch-id idempotence leg that makes the
  * `graft-keyed` write path (q176's temp-dir/driver-commit protocol)
  * safe under Structured Streaming's at-least-once batch replay.
  *
  * Structured Streaming re-runs a micro-batch whenever the query
  * restarts after a failure between the sink's write and the
  * checkpoint's commit; a plain append sink then double-writes that
  * batch. The standard discipline (Spark's own foreachBatch guidance)
  * is batch-id idempotence: the SINK remembers which batch ids are
  * durably committed and makes a replayed id a no-op. Here the memory
  * is the connector's own `_batches/batch-<id>.committed` marker and
  * the scrub key is the `batch-<id>-` file-name prefix, so the whole
  * protocol lives next to the data it protects (the manifest-store
  * pattern of DocumentStreams.processCurationBatch applied to the DSv2
  * write path — connector story == manifest story):
  *
  *  - [[appendBatch]] skips a batch whose marker exists (replay after
  *    commit), otherwise drives the NORMAL `graft-keyed` batch write
  *    with the id attached — [[KeyedJsonBatchWrite.commit]] scrubs the
  *    id's partial residue, moves the files in, and flips the marker
  *    atomically (crash windows enumerated at the commit);
  *  - [[writer]] packages that as a ready-to-start foreachBatch sink.
  *
  * The written layout is byte-identical to a batch write's (plus the
  * `_batches` ledger), so the SPJ read side is unchanged: streamed-in
  * tables join shuffle-free like q176's.
  */
object KeyedJsonStream {

  /** True iff `batchId` committed durably (its marker exists). */
  def isCommitted(path: String, batchId: Long): Boolean =
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "_batches", s"batch-$batchId.committed"))

  /** The foreachBatch body: idempotently append one micro-batch into the
    * keyed layout. Returns false when the batch was a replay of a
    * committed id (skipped whole), true when it (re)wrote. */
  def appendBatch(
      df: DataFrame, path: String, keyCol: String, batchId: Long): Boolean =
    if (isCommitted(path, batchId)) false
    else {
      df.write.format("graft-keyed")
        .option("keycol", keyCol)
        .option("batchid", batchId.toString)
        .mode("append").save(path)
      true
    }

  /** A ready-to-start exactly-once stream writer into `path`: caller
    * sets the trigger (default AvailableNow) and calls `.start()`.
    * `checkpoint` is the normal Structured Streaming checkpoint — it
    * provides source-offset replay; the batch ledger provides sink
    * idempotence; together: exactly-once. */
  def writer(
      stream: DataFrame, path: String, keyCol: String,
      checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, path, keyCol, batchId); ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
}
