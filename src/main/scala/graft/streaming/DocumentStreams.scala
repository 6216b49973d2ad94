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
    * run to completion under Trigger.AvailableNow into a memory sink.
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
    *   - the per-doc "any candidate confirms" existential is a running
    *     max(dup) aggregate in COMPLETE mode (the q54 device): state is
    *     one row per incoming doc, bounded for a run-to-completion batch
    *     and exactly the dedup-state a production stream would keep in a
    *     store keyed by doc.
    * Output: surviving (doc_id, lang) — batch-parity-pinned in
    * StreamingSpec against the same gate + Dedup.dedupAgainstSignatureIndex
    * composition, and hash-verified end-to-end by q130's oracle over the
    * q77/q92 fixtures.
    *
    * @param index  Dedup.signatureTable rows (doc_id, kind, idx, value) of
    *               the already-curated corpus — read it from its persisted
    *               parquet in production; parameter drift caveats of
    *               dedupAgainstSignatureIndex apply identically. */
  def curationGateToTable(
      spark: SparkSession, dir: String, index: DataFrame, tableName: String,
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
    val verdicts = probed
      .groupBy(col("doc_id"), col("lang"))
      .agg(max(col("dup")).as("dup"))
    withStreamingShufflePartitions(spark, conf.shufflePartitions) {
      val q = verdicts.writeStream
        .format("memory")
        .queryName(tableName)
        .outputMode("complete")
        .options(conf.options)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(tableName)
      .filter(col("dup") === 0)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }
}
