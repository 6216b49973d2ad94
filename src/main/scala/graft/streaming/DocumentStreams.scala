package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.functions.TextFunctions._

/** Structured Streaming surface over the `documents` table — the
  * continuously-crawling shape of the curation pipeline (q125's gate +
  * decontamination stage as a stream). The reference's incremental traits
  * (SURVEY §2.10) already map page offsets → source offsets for events;
  * this is the same mapping for the corpus side: each arriving crawl
  * micro-batch is quality-gated map-only and probed against the PERSISTED
  * signature index of the already-curated corpus, which is NEVER re-read
  * or re-signed.
  */
object DocumentStreams {

  /** documents.parquet schema as stored (a file stream needs it up
    * front). */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-streaming read of the documents table (micro-batched by the
    * source). */
  def readDocumentStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(documentSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  private def withStreamingShufflePartitions[T](
      spark: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prior = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, prior)
  }

  /** The q125 quality gate as a reusable predicate (Gopher-style
    * thresholds). */
  def qualityGate(textCol: Column): Column = {
    val g = gopherQuality(textCol)
    g.getField("n_words") >= 30 && g.getField("mean_word_len") <= 10 &&
      g.getField("symbol_ratio") <= 0.1 && g.getField("alpha_word_frac") >= 0.8
  }

  /** Gate + incremental decontamination of a STREAMED crawl batch against
    * a static near-dup signature index (Dedup.signatureTable's layout),
    * run to completion under Trigger.AvailableNow, appending survivors to
    * a parquet directory.
    *
    * Stream plan — each piece chosen for what streaming can actually
    * incrementalize:
    *   - the quality gate and the signing (word-hash set + minhash LSH
    *     bands, the SAME expressions the index was built with) are
    *     map-only over each micro-batch;
    *   - candidate probing is a stream-STATIC left join against the
    *     (band, bh)-keyed index rows with their stored word-hash sets
    *     attached — no stream-stream join anywhere (the batch operator's
    *     anti-join re-meets the incoming frame, which a stream cannot;
    *     here the dup verdict rides the stream row itself);
    *   - the per-doc "any candidate confirms" existential needs NO
    *     cross-batch state at all: a file source delivers each document
    *     in exactly one micro-batch, so the max(dup) verdict is computed
    *     per batch inside foreachBatch and survivors are APPENDED to the
    *     output directory. The streaming plan itself is stateless (zero
    *     state-store operators — asserted on every run), nothing is
    *     materialized on the driver, and the output is distributed
    *     storage: the shape that survives a corpus-cardinality stream.
    * Output: surviving (doc_id, lang) read back from `outPath` —
    * batch-parity-pinned in StreamingSpec against the same gate +
    * Dedup.dedupAgainstSignatureIndex composition, and hash-verified
    * end-to-end by q130's oracle over the q77/q92 fixtures.
    *
    * @param index  Dedup.signatureTable rows (doc_id, kind, idx, value) of
    *               the already-curated corpus — read it from its persisted
    *               parquet in production; parameter drift caveats of
    *               dedupAgainstSignatureIndex apply identically.
    * @param outPath parquet directory the surviving rows are appended to
    *               (the "curated corpus" sink a production stream feeds). */
  def curationGateToParquet(
      spark: SparkSession, dir: String, index: DataFrame, outPath: String,
      numHashes: Int = 64, bands: Int = 4, threshold: Double = 0.95,
      conf: EventStreams.StreamRunConf = EventStreams.StreamRunConf()): DataFrame = {
    val rows = numHashes / bands
    require(rows * bands == numHashes, "bands must divide numHashes")
    // static side: (band, bh) → stored word-hash set, prejoined once
    val exBands = index.filter(col("kind") === "band")
      .select(col("doc_id").as("old_id"),
        col("idx").cast("int").as("band"), col("value").as("bh"))
    val exWh = index.filter(col("kind") === "wh")
      .groupBy(col("doc_id"))
      .agg(transform(array_sort(collect_list(struct(col("idx"), col("value")))),
        s => s.getField("value")).as("wh_old"))
      .select(col("doc_id").as("old_id"), col("wh_old"))
    val ex = exBands.join(exWh, Seq("old_id"))
    // stream side: incoming crawl = the q125 train split, gated map-only,
    // signed with the index's own parameters
    val incoming = readDocumentStream(spark, dir)
      .filter(col("doc_id") % 10 =!= 0)
      .filter(qualityGate(col("text")))
      .select(col("doc_id"), col("lang"),
        array_sort(array_distinct(elementHashes(tokens(col("text")))))
          .as("wh_new"))
    val probed = incoming
      .withColumn("sig", minhashFromHashes(col("wh_new"), numHashes))
      .select(col("doc_id"), col("lang"), col("wh_new"),
        posexplode(lshBandHashes(col("sig"), bands, rows)).as(Seq("band", "bh")))
      .join(ex, Seq("band", "bh"), "left")
      .select(col("doc_id"), col("lang"),
        when(col("wh_old").isNotNull &&
          round(graft.plans.NativeExprs.jaccardSorted(
            col("wh_new"), col("wh_old")), 4) >= threshold, 1)
          .otherwise(0).as("dup"))
    // Seed the sink with an empty frame so the read-back has a schema even
    // if no batch produced survivors (and so outPath is a valid parquet dir
    // from the first trigger).
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("lang", StringType))))
      .write.mode("overwrite").parquet(outPath)
    withStreamingShufflePartitions(spark, conf.shufflePartitions) {
      val q = probed.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // each doc appears in exactly one micro-batch (file source), so
          // this per-batch existential IS the per-doc verdict
          batch.groupBy(col("doc_id"), col("lang"))
            .agg(max(col("dup")).as("dup"))
            .filter(col("dup") === 0)
            .select(col("doc_id"), col("lang"))
            .write.mode("append").parquet(outPath)
          ()
        }
        .options(conf.options)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // the scale pin: the registered plan keeps NO streaming state — the
      // verdict lives per batch, never in a state store or a memory sink
      require(q.recentProgress.flatMap(_.stateOperators).isEmpty,
        "curation gate stream must be stateless (per-batch verdicts)")
    }
    spark.read.parquet(outPath)
      .orderBy(col("doc_id"))
  }

  /** [[curationGateToParquet]] with the static index given as a
    * [[graft.operators.Dedup.signDocs]] frame, and the per-batch work
    * moved INSIDE foreachBatch (the [[incrementalCurationToParquet]]
    * architecture — still stateless, still no stream-stream join, still
    * per-batch existential verdicts). Two costs the in-plan form pays
    * disappear:
    *
    *  - the static side is checkpointed ONCE before the stream starts —
    *    the long-format route re-derived the index's explode + groupBy
    *    under every micro-batch's join, and the checkpoint's exact size
    *    stats let Catalyst broadcast it while it fits;
    *  - the gate + signing of each batch run after the conditional
    *    re-widen (the q184 rule): a file-delivered batch arrives with
    *    partition count = its file count — at fixture scale ONE task
    *    carried the whole tokenize/minhash pass while every other core
    *    idled; at deployment scale batches span many splits and the
    *    branch is a no-op.
    *
    * Survivor set is bit-identical to [[curationGateToParquet]]
    * (StreamingSpec pins the parity): "no candidate confirms" and
    * "not in the confirmed-dup anti-set" are the same existential. */
  def curationGateToParquetSigned(
      spark: SparkSession, dir: String, indexSigned: DataFrame,
      outPath: String,
      numHashes: Int = 64, bands: Int = 4, threshold: Double = 0.95,
      conf: EventStreams.StreamRunConf = EventStreams.StreamRunConf()): DataFrame = {
    val rows = numHashes / bands
    require(rows * bands == numHashes, "bands must divide numHashes")
    val seed = indexSigned.localCheckpoint(true)
    try {
      val (exBands, exWh) = graft.operators.Dedup.preparedFromSigned(seed)
      // Seed the sink with an empty frame so the read-back has a schema
      // even if no batch produced survivors (and so outPath is a valid
      // parquet dir from the first trigger).
      spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType(Seq(StructField("doc_id", LongType),
            StructField("lang", StringType))))
        .write.mode("overwrite").parquet(outPath)
      withStreamingShufflePartitions(spark, conf.shufflePartitions) {
        val q = readDocumentStream(spark, dir)
          .filter(col("doc_id") % 10 =!= 0)
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val gated = batch.filter(qualityGate(col("text")))
            val signed = graft.operators.Dedup.signDocs(
              gated, col("text"), col("doc_id"), carry = Seq(col("lang")),
              numHashes = numHashes, bands = bands).localCheckpoint(true)
            try {
              // each doc appears in exactly one micro-batch (file
              // source), so this per-batch anti-set IS the per-doc
              // verdict
              graft.operators.Dedup.dedupSignedAgainstPreparedIndex(
                  signed, exBands, exWh, threshold)
                .join(signed.select(col("doc_id"), col("lang")),
                  Seq("doc_id"))
                .write.mode("append").parquet(outPath)
            } finally { signed.unpersist(); () }
            ()
          }
          .options(conf.options)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // the scale pin: the registered plan keeps NO streaming state —
        // the verdict lives per batch, never in a state store or a
        // memory sink
        require(q.recentProgress.flatMap(_.stateOperators).isEmpty,
          "curation gate stream must be stateless (per-batch verdicts)")
      }
      spark.read.parquet(outPath)
        .orderBy(col("doc_id"))
    } finally { seed.unpersist(); () }
  }

  /** Continuous-ingest curation with index MAINTENANCE — the full
    * lifecycle [[curationGateToParquet]] stops short of: each arriving
    * micro-batch is quality-gated, deduped against the PERSISTED
    * signature index as it stands, its survivors are appended to the
    * curated corpus, and the survivors' OWN signatures are appended to
    * the index — so a later batch dedups against everything curated
    * before it (seed corpus + all earlier batches), exactly how a
    * production crawl keeps its dedup store current.
    *
    * Scale shape: the index lives on distributed storage and is read
    * per batch through the same banded probe join (never re-signed, never
    * driver-resident); the per-batch work is
    * [[graft.operators.Dedup.dedupAgainstSignatureIndex]] verbatim; the
    * streaming plan itself stays stateless (zero state-store operators,
    * require()-asserted) because ALL cross-batch state is the persisted
    * index — bounded by curated-corpus size on disk, not by stream volume
    * in memory. Within-batch new-new duplicates are intentionally not
    * compared (dedupAgainstSignatureIndex's documented contract;
    * minhashDedupSurvivors is the batch-internal tool) — a doc therefore
    * never collides with its OWN batch's signatures even though they are
    * appended before the stream finishes.
    *
    * Determinism: the incoming crawl is rendered as one parquet file per
    * batch (`batch b` = pmod(doc_id, batchFiles)) with strictly
    * increasing modification times, and the file source is throttled to
    * maxFilesPerTrigger=1 — FileStreamSource orders by (mtime, path), so
    * batches replay in a fixed order and the survivor set is a pure
    * function of the corpus (StreamingSpec pins parity with the
    * sequential batch unroll; q142's oracle re-derives the whole cascade
    * in SQL).
    *
    * @param seedIndex [[graft.operators.Dedup.signatureTable]] rows of the
    *                  already-curated corpus; persisted to `indexPath` as
    *                  the stream's starting state.
    * @param docsPath     crawl relation under `dir` (parameterized so a
    *                     deployment points at its own table).
    * @param streamSplit  predicate selecting the crawl side (rows NOT in
    *                     the seed corpus); default keeps doc_id%10==0 as
    *                     the never-streamed seed/eval split.
    * Durability: every batch's three outputs (band rows, wh rows,
    * survivors) commit ATOMICALLY via the manifest protocol documented at
    * [[CommitState]] — a mid-batch crash loses nothing and duplicates
    * nothing, and a foreachBatch replay of an already-committed batch is
    * a skip (exactly-once). Compaction swaps the manifest the same way,
    * so the r10 in-place-rewrite hazard (crash ⇒ total index loss) is
    * structurally gone.
    *
    * @param compactEvery rewrite the live entries of all three bases into
    *                     one target-size token every this many batches (0
    *                     disables) — bounds the O(batches) listing growth
    *                     of per-batch commits.
    * @return surviving (doc_id, lang) resolved through the manifest. */
  /** MANIFEST COMMIT PROTOCOL for the streaming curation store (the
    * production-strength fix the r9/r10 scaladoc promised): the store is
    * three parquet bases — `indexPath/bands`, `indexPath/wh` (the
    * signature index) and `outPath` (the curated corpus) — each holding
    * batch-token SUBDIRECTORIES (`seed`, `batch00001`, `compact00002`,
    * …). Which tokens are LIVE is decided solely by one manifest file
    * (`indexPath/_commits`, leading underscore so parquet listings skip
    * it), swapped atomically via FileContext.rename(OVERWRITE) — atomic
    * on HDFS and on POSIX local paths. Readers resolve the manifest to
    * concrete paths; a token dir not in the manifest does not exist as
    * far as the store is concerned.
    *
    * Crash matrix (replacing the r10 "non-transactional 3-append
    * window", whose failure mode was under-inclusion of a batch, and the
    * in-place compaction rewrite, whose failure mode was TOTAL index
    * loss):
    *   - crash before the manifest swap → every write of the batch is an
    *     orphan dir; replay recomputes against the unchanged manifest
    *     view and mode("overwrite") replaces the partial dirs. Nothing
    *     lost, nothing duplicated.
    *   - crash after the swap (before the streaming checkpoint commit) →
    *     the replayed batch's id is already in the manifest and the
    *     processor SKIPS it — exactly-once without recomputation.
    *   - compaction crash before its swap → orphan compact dirs, live
    *     state untouched; after its swap → stale pre-compaction dirs are
    *     deleted best-effort and are unreadable anyway (not in the
    *     manifest).
    * The manifest also carries the replay-skip record separately from the
    * live entries, so compaction (which REPLACES entries) never erases
    * it. SINGLE-WRITER contract: the manifest swap is atomic but the
    * read-modify-write around it is not CAS'd — exactly the Structured
    * Streaming model (one streaming query owns one checkpoint and its
    * store); two concurrent writers on one store would lose updates and
    * must serialize externally. That record is the MAX committed batch
    * id, not a set: stream
    * batch ids are monotonic (FileStreamSource numbers micro-batches
    * 0,1,2,…) and only the last not-yet-checkpointed batch can replay,
    * so `batchId <= maxBatch` decides "already committed" exactly — and
    * the manifest stays O(live entries) for the stream's whole lifetime
    * instead of accumulating one line per batch forever (a set would
    * quietly reintroduce the unbounded-growth problem the compaction
    * half of this protocol exists to bound). Contract: callers must
    * present batch ids in nondecreasing order (replays of the current id
    * included) — the streaming wrapper always does. */
  private[graft] final case class CommitState(
      entries: Seq[String], maxBatch: Long)

  private def manifestPath(indexPath: String) =
    new org.apache.hadoop.fs.Path(s"$indexPath/_commits")

  private[graft] def readCommits(
      spark: SparkSession, indexPath: String): CommitState = {
    val p = manifestPath(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return CommitState(Seq.empty, -1L)
    val in = fs.open(p)
    val txt = try {
      val b = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, b, 4096, false)
      b.toString("UTF-8")
    } finally in.close()
    val lines = txt.split("\n").map(_.trim).filter(_.nonEmpty)
    CommitState(
      lines.collect { case s if s.startsWith("entry ") => s.drop(6) }.toSeq,
      lines.collect { case s if s.startsWith("max_batch ") => s.drop(10).toLong }
        .headOption.getOrElse(-1L))
  }

  private[graft] def commitCommits(
      spark: SparkSession, indexPath: String, st: CommitState): Unit = {
    val p = manifestPath(indexPath)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(s"$indexPath/_commits.tmp")
    val out = fs.create(tmp, true)
    try {
      val body = (st.entries.map("entry " + _) :+
        s"max_batch ${st.maxBatch}").mkString("", "\n", "\n")
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
    // THE commit point: atomic swap (HDFS + POSIX rename semantics)
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Seed the curation store: prepared seed index under token `seed` in
    * both index bases, an empty (schema-bearing) survivor dir (skipped
    * when the survivor store is NOT manifest-resolved parquet — the
    * keyed-connector variant owns its own layout), and the initial
    * manifest. */
  private[graft] def initCurationStore(
      spark: SparkSession, seedIndex: DataFrame,
      indexPath: String, outPath: String,
      seedSurvivors: Boolean = true): Unit = {
    // the persisted dedup store keeps the PROBE-READY layout (band rows +
    // pre-grouped wh arrays): re-deriving wh arrays from the long format
    // would be an O(index) groupBy on EVERY micro-batch
    val (seedBands, seedWh) = graft.operators.Dedup.prepareSignatureIndex(seedIndex)
    initCurationStorePrepared(
      spark, seedBands, seedWh, indexPath, outPath, seedSurvivors)
  }

  /** [[initCurationStore]] for a seed already signed by
    * [[graft.operators.Dedup.signDocs]]: the long-format route pays an
    * |wh|-row explode and a groupBy EXCHANGE of the whole seed index
    * just to rebuild the arrays the signing started from, and — because
    * the two store writes evaluate their lazy inputs independently —
    * tokenizes the seed corpus once per write. Here the signed frame is
    * checkpointed once and both probe-layout writes are projections of
    * it: one signing pass, zero index-shaped shuffles. Layout on disk is
    * bit-identical (DedupSpec pins preparedFromSigned against
    * prepareSignatureIndex∘signatureTable). */
  private[graft] def initCurationStoreSigned(
      spark: SparkSession, seedSigned: DataFrame,
      indexPath: String, outPath: String,
      seedSurvivors: Boolean = true): Unit = {
    val seed = seedSigned.localCheckpoint(true)
    try {
      val (seedBands, seedWh) = graft.operators.Dedup.preparedFromSigned(seed)
      // coalesce(1): the per-batch token convention applied to the seed.
      // The signing ran wide in the eager checkpoint above; uncoalesced,
      // a re-widened seed lands one file PER PARTITION and every later
      // micro-batch re-lists and re-opens the whole seed store. Safe
      // here precisely because the inputs are materialized arrays (the
      // legacy long-format path stays uncoalesced — its frames are lazy
      // and a coalesce(1) would serialize the seed signing itself).
      initCurationStorePrepared(
        spark, seedBands.coalesce(1), seedWh.coalesce(1),
        indexPath, outPath, seedSurvivors)
    } finally { seed.unpersist(); () }
  }

  private def initCurationStorePrepared(
      spark: SparkSession, seedBands: DataFrame, seedWh: DataFrame,
      indexPath: String, outPath: String, seedSurvivors: Boolean): Unit = {
    seedBands.write.mode("overwrite").parquet(s"$indexPath/bands/seed")
    seedWh.write.mode("overwrite").parquet(s"$indexPath/wh/seed")
    // empty survivor seed so the read-back has a schema even if every
    // batch dedups away
    if (seedSurvivors)
      spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType(Seq(StructField("doc_id", LongType),
            StructField("lang", StringType))))
        .write.mode("overwrite").parquet(s"$outPath/seed")
    commitCommits(spark, indexPath, CommitState(Seq("seed"), -1L))
  }

  /** Read the curated corpus as committed by the manifest. */
  private[graft] def readCurated(
      spark: SparkSession, indexPath: String, outPath: String): DataFrame = {
    val st = readCommits(spark, indexPath)
    spark.read.parquet(st.entries.map(e => s"$outPath/$e"): _*)
  }

  /** One micro-batch of the incremental curation lifecycle under the
    * manifest protocol: gate → dedup against the manifest view of the
    * index → write the batch's three outputs under a batch token
    * (idempotent overwrite) → swap the manifest. Public-to-the-package so
    * the crash-replay spec can drive it directly; `failBeforeCommit`
    * injects a crash in the one window that exists (after the dir writes,
    * before the swap). */
  private[graft] def processCurationBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      indexPath: String, outPath: String,
      numHashes: Int, bands: Int, threshold: Double,
      failBeforeCommit: Boolean = false): Unit = {
    val st = readCommits(spark, indexPath)
    // exactly-once replay skip: the batch committed, the stream
    // checkpoint just didn't record it before the crash (ids are
    // monotonic — the CommitState contract — so <= max means committed)
    if (batchId <= st.maxBatch) return
    // the index AS OF this batch = the manifest view; the batch's own
    // token is not in it, so a doc never meets its own signatures
    val exBands =
      spark.read.parquet(st.entries.map(e => s"$indexPath/bands/$e"): _*)
    val exWh =
      spark.read.parquet(st.entries.map(e => s"$indexPath/wh/$e"): _*)
    val gated = batch.filter(qualityGate(col("text")))
    // Sign ONCE per batch: tokenize→hash→minhash previously evaluated
    // three times per batch (under the probe's band side, under its
    // word-hash join-back, and again for the index/survivor writes),
    // because each consumer re-derived signatures from `text` in its own
    // lazy subtree. The eager `signed` checkpoint materializes the one
    // frame every consumer reads; signDocs itself re-widens a
    // file-thin batch before the signature map (the q184 rule).
    val signed = graft.operators.Dedup.signDocs(
      gated, col("text"), col("doc_id"), carry = Seq(col("lang")),
      numHashes = numHashes, bands = bands).localCheckpoint(true)
    // the probe reads materialized arrays; the join-back attaches
    // lang/wh/mh_bands to the survivor ids so the three writes below are
    // cheap re-reads of THIS checkpoint, exactly as before
    val kept = graft.operators.Dedup.dedupSignedAgainstPreparedIndex(
        signed, exBands, exWh, threshold)
      .join(signed, Seq("doc_id"))
      .localCheckpoint(true)
    try {
      val token = f"batch$batchId%05d"
      // coalesce(1): micro-batch outputs are small by definition; one
      // file per batch keeps later batches' listings (and trigger commit
      // overhead) from growing with file count. mode("overwrite") makes
      // a replay after a pre-commit crash replace partial dirs.
      kept.select(col("doc_id").as("old_id"),
          posexplode(col("mh_bands")).as(Seq("band", "bh")))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$indexPath/bands/$token")
      kept.select(col("doc_id").as("old_id"), col("wh").as("wh_old"))
        .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/wh/$token")
      kept.select(col("doc_id"), col("lang"))
        .coalesce(1).write.mode("overwrite").parquet(s"$outPath/$token")
      if (failBeforeCommit)
        throw new IllegalStateException(
          "injected crash before manifest commit")
      commitCommits(spark, indexPath,
        CommitState(st.entries :+ token, math.max(st.maxBatch, batchId)))
    } finally { kept.unpersist(); signed.unpersist(); () }
  }

  /** Size-tiered compaction under the manifest protocol: rewrite the
    * UNION of the live entries of each base into one `compactNNNNN`
    * token dir (ceil(bytes/targetBytes) files), swap the manifest to the
    * single compacted entry, then delete the replaced dirs best-effort
    * (a crash leaves only unreadable orphans — the live state is always
    * whatever the manifest names, never a partially-rewritten dir).
    *
    * `includeSurvivors = false` compacts the INDEX BASES ONLY — the
    * keyed-connector lifecycle ([[incrementalDedupToKeyed]]), whose
    * survivor store is the `graft-keyed` layout with its own batch
    * ledger, not a manifest-resolved parquet base. `failBeforeCommit`
    * injects a crash in the only window the protocol leaves (compact
    * dirs written, manifest not yet swapped) for the crash spec; the
    * `maxBatch` replay record is carried UNCHANGED through the swap, so
    * the exactly-once skip survives compaction. */
  private[graft] def compactCommitted(
      spark: SparkSession, indexPath: String, outPath: String,
      batchId: Long, targetBytes: Long,
      includeSurvivors: Boolean = true,
      failBeforeCommit: Boolean = false): Unit = {
    val st = readCommits(spark, indexPath)
    if (st.entries.size <= 1) return
    val conf = spark.sparkContext.hadoopConfiguration
    val token = f"compact$batchId%05d"
    val bases = Seq(s"$indexPath/bands", s"$indexPath/wh") ++
      (if (includeSurvivors) Seq(outPath) else Seq.empty)
    for (base <- bases) {
      val dirs = st.entries.map(e => s"$base/$e")
      val bytes = dirs.map { d =>
        val hp = new org.apache.hadoop.fs.Path(d)
        val fs = hp.getFileSystem(conf)
        if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
      }.sum
      val want = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      spark.read.parquet(dirs: _*)
        .coalesce(want).write.mode("overwrite").parquet(s"$base/$token")
    }
    if (failBeforeCommit)
      throw new IllegalStateException(
        "injected crash before compaction manifest swap")
    commitCommits(spark, indexPath, CommitState(Seq(token), st.maxBatch))
    // the swap is durable; stale dirs are unreachable — deletion is pure
    // housekeeping and may fail without consequence
    for (base <- bases; e <- st.entries) {
      try {
        val hp = new org.apache.hadoop.fs.Path(s"$base/$e")
        hp.getFileSystem(conf).delete(hp, true); ()
      } catch { case _: Throwable => () }
    }
  }

  def incrementalCurationToParquet(
      spark: SparkSession, dir: String, seedIndex: DataFrame,
      outPath: String, indexPath: String, batchFiles: Int = 3,
      numHashes: Int = 64, bands: Int = 4, threshold: Double = 0.95,
      conf: EventStreams.StreamRunConf = EventStreams.StreamRunConf(),
      docsPath: String = "documents.parquet",
      streamSplit: Column = col("doc_id") % 10 =!= 0,
      compactEvery: Int = 2,
      compactTargetBytes: Long = 128L << 20): DataFrame =
    runIncrementalCuration(
      spark, dir, initCurationStore(spark, seedIndex, indexPath, outPath),
      outPath, indexPath, batchFiles, numHashes, bands, threshold, conf,
      docsPath, streamSplit, compactEvery, compactTargetBytes)

  /** [[incrementalCurationToParquet]] with the seed given as a
    * [[graft.operators.Dedup.signDocs]] frame instead of the long-format
    * signature table: seeding then pays one signing pass and zero
    * index-shaped shuffles (see [[initCurationStoreSigned]]) — the form
    * a pipeline whose seed is a document table (rather than an exported
    * q77-style index) should call. Everything downstream is identical. */
  def incrementalCurationToParquetSigned(
      spark: SparkSession, dir: String, seedSigned: DataFrame,
      outPath: String, indexPath: String, batchFiles: Int = 3,
      numHashes: Int = 64, bands: Int = 4, threshold: Double = 0.95,
      conf: EventStreams.StreamRunConf = EventStreams.StreamRunConf(),
      docsPath: String = "documents.parquet",
      streamSplit: Column = col("doc_id") % 10 =!= 0,
      compactEvery: Int = 2,
      compactTargetBytes: Long = 128L << 20): DataFrame =
    runIncrementalCuration(
      spark, dir,
      initCurationStoreSigned(spark, seedSigned, indexPath, outPath),
      outPath, indexPath, batchFiles, numHashes, bands, threshold, conf,
      docsPath, streamSplit, compactEvery, compactTargetBytes)

  private def runIncrementalCuration(
      spark: SparkSession, dir: String, initStore: => Unit,
      outPath: String, indexPath: String, batchFiles: Int,
      numHashes: Int, bands: Int, threshold: Double,
      conf: EventStreams.StreamRunConf, docsPath: String,
      streamSplit: Column, compactEvery: Int,
      compactTargetBytes: Long): DataFrame = {
    require(batchFiles >= 1, "need at least one batch file")
    // streamSplit selects the crawl side (default: the 10%-eval split is
    // the seed corpus and never streams); both the predicate and the
    // source relation are parameters so a deployment can point the stream
    // at its own crawl table without editing the operator
    val docs = spark.read.parquet(s"$dir/$docsPath").filter(streamSplit)
    val streamDir = renderCrawlBatches(docs, batchFiles)
    initStore
    val incoming = spark.readStream
      .schema(documentSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir)
    withStreamingShufflePartitions(spark, conf.shufflePartitions) {
      val q = incoming.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // all batch effects commit atomically through the manifest
          // swap in processCurationBatch (crash matrix at CommitState)
          processCurationBatch(spark, batch, batchId, indexPath, outPath,
            numHashes, bands, threshold)
          // size-tiered compaction: even at one file per batch the
          // listings grow O(batches) over a stream's lifetime; every
          // compactEvery batches the live entries are rewritten into one
          // ceil(bytes/target)-file token and the manifest swaps to it.
          // Runs AFTER this batch's commit and BEFORE the next batch's
          // manifest read, so a batch still never sees its own
          // signatures.
          if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
            compactCommitted(spark, indexPath, outPath, batchId,
              compactTargetBytes)
          ()
        }
        .options(conf.options)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      require(q.recentProgress.flatMap(_.stateOperators).isEmpty,
        "incremental curation stream must be stateless (index IS the state)")
    }
    readCurated(spark, indexPath, outPath).orderBy(col("doc_id"))
  }

  /** Render a crawl relation as one parquet file per micro-batch
    * (`batch b` = pmod(doc_id, batchFiles)) with strictly increasing
    * mtimes — FileStreamSource orders by (mtime, path), so throttled
    * replays process batches in a fixed order and every downstream
    * cascade is a pure function of the corpus. ONE partitioned write
    * renders every file (partitionBy drops the bat column, so the stream
    * schema is untouched); a per-batch filter+write loop would re-scan
    * the corpus batchFiles times. */
  private def renderCrawlBatches(docs: DataFrame, batchFiles: Int): String = {
    import java.nio.file.{Files, Paths}
    val streamDir = Files.createTempDirectory("graft-crawl").toString
    val tmp = Files.createTempDirectory("graft-crawl-part").toString
    docs.withColumn("bat", pmod(col("doc_id"), lit(batchFiles)))
      .coalesce(1).write.partitionBy("bat").mode("overwrite").parquet(tmp)
    (0 until batchFiles).foreach { b =>
      val partDir = new java.io.File(tmp, s"bat=$b")
      val part = Option(partDir.listFiles).getOrElse(Array.empty)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file for batch $b"))
      val dest = Paths.get(streamDir, f"batch$b%02d.parquet")
      Files.move(part.toPath, dest)
      require(dest.toFile.setLastModified((b + 1) * 60000L),
        s"could not stamp batch $b's replay order")
    }
    streamDir
  }

  /** One micro-batch of the KEYED-CONNECTOR incremental dedup lifecycle
    * ([[incrementalDedupToKeyed]]): dedup the batch against the manifest
    * view of the signature index, append the NOVEL docs into the
    * `graft-keyed` layout through [[graft.sources.v2.KeyedJsonStream
    * .appendBatch]] (the connector's own batch-id marker + residue-scrub
    * idempotence), then append the novel docs' signatures to the index
    * under the manifest protocol.
    *
    * Two stores, each idempotent per batch id, COMMITTED IN A FIXED
    * ORDER (keyed first, manifest second) — that ordering is what makes
    * every crash window safe:
    *  - crash before the keyed append commits → nothing durable anywhere;
    *    the replay recomputes the identical survivor set from the
    *    UNCHANGED manifest view (dedup is deterministic) and redoes both;
    *  - crash between keyed commit and manifest swap → the replay
    *    recomputes the same survivors (manifest still unchanged — this is
    *    why the index must commit LAST), the keyed append skips on its
    *    marker, the index writes overwrite the orphan token and swap;
    *  - crash after the swap → `batchId <= maxBatch` skips the batch
    *    whole; the keyed marker agrees by the ordering invariant.
    * `failBeforeCommit` injects the middle window for the crash spec. */
  private[graft] def processKeyedDedupBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      indexPath: String, outPath: String, shards: Int,
      numHashes: Int, bands: Int, threshold: Double,
      failBeforeCommit: Boolean = false): Unit = {
    val st = readCommits(spark, indexPath)
    if (batchId <= st.maxBatch) return
    val exBands =
      spark.read.parquet(st.entries.map(e => s"$indexPath/bands/$e"): _*)
    val exWh =
      spark.read.parquet(st.entries.map(e => s"$indexPath/wh/$e"): _*)
    // sign ONCE per batch — the [[processCurationBatch]] rule, for the
    // same three-evaluations reason (probe band side, probe wh
    // join-back, index writes); signDocs re-widens a file-thin batch
    val signed = graft.operators.Dedup.signDocs(
      batch, col("text"), col("doc_id"), carry = Seq(col("lang")),
      numHashes = numHashes, bands = bands).localCheckpoint(true)
    val kept = graft.operators.Dedup.dedupSignedAgainstPreparedIndex(
        signed, exBands, exWh, threshold)
      .join(signed, Seq("doc_id"))
      .localCheckpoint(true)
    try {
      // 1) novel docs into the keyed store (its ledger makes a replay of
      // a committed id a whole-batch skip)
      graft.sources.v2.KeyedJsonStream.appendBatch(
        kept.select(col("doc_id"), col("lang"),
          pmod(xxhash64(col("doc_id")), lit(shards.toLong))
            .cast("int").as("shard")),
        outPath, "shard", batchId)
      // 2) their signatures into the index (manifest swap LAST)
      val token = f"batch$batchId%05d"
      kept.select(col("doc_id").as("old_id"),
          posexplode(col("mh_bands")).as(Seq("band", "bh")))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$indexPath/bands/$token")
      kept.select(col("doc_id").as("old_id"), col("wh").as("wh_old"))
        .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/wh/$token")
      if (failBeforeCommit)
        throw new IllegalStateException(
          "injected crash between keyed commit and manifest swap")
      commitCommits(spark, indexPath,
        CommitState(st.entries :+ token, math.max(st.maxBatch, batchId)))
    } finally { kept.unpersist(); signed.unpersist(); () }
  }

  /** Incremental near-dup dedup with the curated corpus living in the
    * DSv2 KEYED CONNECTOR — the continuously-crawled-corpus loop
    * composed from pieces the engine already grades separately: new
    * documents arrive as throttled micro-batches, each batch probes the
    * PERSISTED MinHash/LSH band index (q38's banded algebra through
    * [[graft.operators.Dedup.dedupAgainstPreparedIndex]] — seed corpus ∪
    * every earlier batch's survivors, never re-signed), and ONLY NOVEL
    * docs append — into the `graft-keyed` layout (so the curated corpus
    * is immediately SPJ-joinable shuffle-free, q176's read side) and
    * into the index. Exactly-once across BOTH stores via the connector's
    * batch ledger + the index manifest, committed in the fixed order
    * [[processKeyedDedupBatch]] documents; the streaming plan itself is
    * stateless (require()-asserted — ALL cross-batch state is on disk,
    * bounded by curated-corpus size, not stream volume).
    *
    * Returns the curated corpus read back THROUGH the connector's scan.
    * Within-batch new-new duplicates are out of scope, exactly as in
    * [[incrementalCurationToParquet]] (dedupAgainstSignatureIndex's
    * documented contract). */
  /** @param compactEvery rewrite BOTH stores' accreted per-batch state
    *                      every this many batches (0 disables): the
    *                      signature index's live entries into one token
    *                      (r16 verdict #5 — manifest swap, `maxBatch`
    *                      carried) AND the keyed survivor store's
    *                      per-shard batch files into one generation
    *                      (r17 verdict #3 —
    *                      [[graft.sources.v2.KeyedJsonStream.compact]],
    *                      `_gen` manifest swap, ledger markers carried so
    *                      replay skips are identical pre/post). Without
    *                      either, a years-long crawl loop pays an
    *                      O(batches) listing + many-small-files scan at
    *                      every trigger on that store's read side. q236
    *                      grades the full cascade over both compacted
    *                      stores against q227's verbatim oracle:
    *                      compaction must move bytes, never verdicts. */
  def incrementalDedupToKeyed(
      spark: SparkSession, dir: String, seedIndex: DataFrame,
      outPath: String, indexPath: String, batchFiles: Int = 3,
      shards: Int = 8, numHashes: Int = 64, bands: Int = 4,
      threshold: Double = 0.95,
      conf: EventStreams.StreamRunConf = EventStreams.StreamRunConf(),
      docsPath: String = "documents.parquet",
      streamSplit: Column = col("doc_id") % 10 =!= 0,
      compactEvery: Int = 0,
      compactTargetBytes: Long = 128L << 20): DataFrame =
    runIncrementalDedupToKeyed(
      spark, dir,
      initCurationStore(spark, seedIndex, indexPath, outPath,
        seedSurvivors = false),
      outPath, indexPath, batchFiles, shards, numHashes, bands, threshold,
      conf, docsPath, streamSplit, compactEvery, compactTargetBytes)

  /** [[incrementalDedupToKeyed]] with the seed given as a
    * [[graft.operators.Dedup.signDocs]] frame — one seed signing pass,
    * zero index-shaped shuffles (see [[initCurationStoreSigned]]);
    * everything downstream identical. */
  def incrementalDedupToKeyedSigned(
      spark: SparkSession, dir: String, seedSigned: DataFrame,
      outPath: String, indexPath: String, batchFiles: Int = 3,
      shards: Int = 8, numHashes: Int = 64, bands: Int = 4,
      threshold: Double = 0.95,
      conf: EventStreams.StreamRunConf = EventStreams.StreamRunConf(),
      docsPath: String = "documents.parquet",
      streamSplit: Column = col("doc_id") % 10 =!= 0,
      compactEvery: Int = 0,
      compactTargetBytes: Long = 128L << 20): DataFrame =
    runIncrementalDedupToKeyed(
      spark, dir,
      initCurationStoreSigned(spark, seedSigned, indexPath, outPath,
        seedSurvivors = false),
      outPath, indexPath, batchFiles, shards, numHashes, bands, threshold,
      conf, docsPath, streamSplit, compactEvery, compactTargetBytes)

  private def runIncrementalDedupToKeyed(
      spark: SparkSession, dir: String, initStore: => Unit,
      outPath: String, indexPath: String, batchFiles: Int,
      shards: Int, numHashes: Int, bands: Int, threshold: Double,
      conf: EventStreams.StreamRunConf, docsPath: String,
      streamSplit: Column, compactEvery: Int,
      compactTargetBytes: Long): DataFrame = {
    require(batchFiles >= 1, "need at least one batch file")
    val docs = spark.read.parquet(s"$dir/$docsPath").filter(streamSplit)
    val streamDir = renderCrawlBatches(docs, batchFiles)
    initStore
    val incoming = spark.readStream
      .schema(documentSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir)
    withStreamingShufflePartitions(spark, conf.shufflePartitions) {
      val q = incoming.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          processKeyedDedupBatch(spark, batch, batchId, indexPath, outPath,
            shards, numHashes, bands, threshold)
          // compaction AFTER this batch's two-store commit and BEFORE
          // the next batch's manifest read — a batch still never meets
          // its own signatures. The index compacts through its manifest
          // (includeSurvivors=false: the survivor store is NOT a
          // manifest-resolved parquet base); the keyed survivor store
          // compacts through its OWN generation protocol, with the
          // batch ledger carried as the replay authority.
          if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
            compactCommitted(spark, indexPath, outPath, batchId,
              compactTargetBytes, includeSurvivors = false)
            graft.sources.v2.KeyedJsonStream.compact(outPath, "shard")
          }
          ()
        }
        .options(conf.options)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      require(q.recentProgress.flatMap(_.stateOperators).isEmpty,
        "keyed incremental dedup stream must be stateless (both stores " +
          "live on disk)")
    }
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("shard", IntegerType)))
    spark.read.format("graft-keyed").schema(outSchema)
      .option("keycol", "shard").load(outPath)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }
}
