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

  /** GENERATION compaction of a keyed store (r17 verdict #3 — the
    * survivor-store twin of DocumentStreams.compactCommitted): each
    * shard's accreted per-batch files (plus its previous generation
    * file, if any) are concatenated into ONE `gen-<G>-part-0.json` —
    * pure byte concatenation, no Spark job: every data file is
    * newline-terminated JSON lines, so the rewrite moves bytes, never
    * rows — and the store's `_gen` manifest then swaps atomically to
    * name the new generation with the folded max batch id. Without
    * this, a years-long crawl loop's read side pays an O(batches)
    * per-shard listing and a many-small-files scan forever.
    *
    * Only COMMITTED batch files fold (marker present in `_batches`):
    * pre-marker residue of a crashed batch must stay individually
    * named so the replay's commit-time scrub still removes it. The
    * markers themselves are CARRIED (never deleted) — they remain the
    * replay authority, so `isCommitted`/[[appendBatch]] skip folded ids
    * exactly as before.
    *
    * Crash matrix (the manifest-protocol shape):
    *  - crash before the `_gen` swap (`failBeforeCommit` injects it) →
    *    the new gen files are orphans readers ignore (a gen file is
    *    live ONLY through the manifest — [[KeyedJson.liveFile]]); reads
    *    are identical to pre-compaction; a re-run rewrites them
    *    deterministically (REPLACE_EXISTING) and completes;
    *  - crash after the swap, before cleanup → stale folded files
    *    remain but are dead-by-rule; the next compaction (or this one
    *    re-run) deletes them best-effort.
    * SINGLE-WRITER contract as everywhere in this lifecycle: one
    * streaming query owns the store; compaction runs between batches.
    *
    * @return true iff a new generation committed (false = nothing
    *         foldable beyond the already-folded watermark). */
  def compact(
      path: String, keyCol: String,
      failBeforeCommit: Boolean = false): Boolean = {
    import java.nio.file.{Files, StandardCopyOption}
    val root = new java.io.File(path)
    require(root.isDirectory,
      s"graft-keyed compact: '$path' is not a local directory")
    val prior = KeyedJson.readGen(path)
    val folded = prior.map(_.folded).getOrElse(-1L)
    val markerRe = "^batch-(-?\\d+)\\.committed$".r
    val committed = Option(new java.io.File(root, "_batches").listFiles())
      .getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        case markerRe(id) => Some(id.toLong)
        case _ => None
      }).toSet
    val foldable = committed.filter(_ > folded)
    if (foldable.isEmpty) return false
    val maxFold = foldable.max
    val newGen = prior.map(_.gen).getOrElse(0L) + 1L
    val shardDirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(s"$keyCol="))
    // phase 1: write each shard's new generation file — VISIBLE names,
    // but dead-by-rule until the manifest swap (liveFile keys gen files
    // on the manifest's generation, and there is none naming newGen yet)
    shardDirs.foreach { shard =>
      val eligible = Option(shard.listFiles()).getOrElse(Array.empty)
        .filter(_.isFile)
        .filter(f => f.getName match {
          case KeyedJson.GenFileRe(g) => prior.exists(_.gen == g.toLong)
          case KeyedJson.BatchFileRe(id) =>
            val i = id.toLong
            i > folded && i <= maxFold && committed.contains(i)
          case _ => false
        })
        .sortBy(_.getName)
      if (eligible.nonEmpty) {
        val tmp = Files.createTempFile(shard.toPath, ".gen", ".tmp")
        val out = Files.newOutputStream(tmp)
        try eligible.foreach(f => Files.copy(f.toPath, out))
        finally out.close()
        Files.move(tmp, shard.toPath.resolve(s"gen-$newGen-part-0.json"),
          StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      }
    }
    if (failBeforeCommit)
      throw new IllegalStateException(
        "injected crash before keyed generation manifest swap")
    // phase 2 — THE commit point: atomic manifest swap
    val manifest = KeyedJson.genManifestPath(path)
    val tmp = Files.createTempFile(root.toPath, "_gen", ".tmp")
    Files.write(tmp, java.util.Arrays.asList(
      s"gen $newGen", s"folded $maxFold"))
    Files.move(tmp, manifest,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // phase 3: best-effort cleanup of dead files (previous generations,
    // folded batch files, crashed compactions' hidden temps) — readers
    // already cannot see them
    shardDirs.foreach { shard =>
      Option(shard.listFiles()).getOrElse(Array.empty)
        .filter(_.isFile)
        .filter(f => f.getName match {
          case KeyedJson.GenFileRe(g) => g.toLong != newGen
          case KeyedJson.BatchFileRe(id) =>
            val i = id.toLong; i <= maxFold && committed.contains(i)
          case n => n.startsWith(".gen")
        })
        .foreach(f =>
          try { java.nio.file.Files.deleteIfExists(f.toPath); () }
          catch { case _: Exception => () })
    }
    true
  }
}
