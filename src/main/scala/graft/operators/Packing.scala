package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training batches: documents in a stable order are
  * packed into ~budget-token bins via bin = floor(exclusive-running-sum /
  * budget). A bin can overflow by at most one document — the standard
  * streaming-packing approximation (the exact close-when-exceeding rule is
  * an inherently sequential scan).
  *
  * The running sum is computed SCALABLY: a naive global window
  * (`Window.orderBy(id)` with no partition) collapses onto a single
  * partition — the classic 100 TB trap. Here:
  *   1. range-repartition by id (global order across partitions),
  *   2. per-partition exclusive cumsum (parallel windows),
  *   3. per-partition totals to the driver (one row per partition),
  *      prefix-summed and joined back as broadcast offsets.
  * Only the tiny offsets table ever leaves the executors.
  */
object Packing {

  /** (id, n_tokens, cum, bin) per input row; `cum` is the exclusive
    * running token sum in `orderCol` order. */
  def sequencePack(
      df: DataFrame, orderCol: Column, tokensCol: Column, budget: Long,
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df.select(orderCol.as("id"), tokensCol.cast("long").as("n_tokens"))
      .repartitionByRange(n, col("id"))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // eager checkpoint: the totals collect below and the returned frame
    // must see the SAME partition assignment (a re-executed range shuffle
    // over a nondeterministic input could draw different boundaries than
    // the ones the offsets were computed from), and it also avoids running
    // the shuffle + window twice
    val local = ranged.withColumn("__local_cum",
      coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .localCheckpoint(true)
    // per-partition totals -> exclusive prefix offsets (driver-side: one
    // row per partition, the legitimate collect of a two-phase scan)
    val totals = local.groupBy("__pid")
      .agg(coalesce(sum(col("n_tokens")), lit(0L)).as("__psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (pid, s)) => (pid, acc + s)
    }.sliding(2).collect { case Array((_, acc), (pid, _)) => (pid, acc) }.toSeq
    val offsetsDf = spark.createDataFrame(offsets).toDF("__pid", "__offset")
    local.join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn("cum", col("__local_cum") + col("__offset"))
      .withColumn("bin", floor(col("cum") / budget).cast("long"))
      .select(col("id"), col("n_tokens"), col("cum"), col("bin"))
  }

  /** Bin-level rollup of [[sequencePack]]. Unsorted — the bin count grows
    * with the corpus, so a global sort here would be a needless range
    * shuffle at scale; callers that need a total order sort themselves. */
  def packedBins(
      df: DataFrame, orderCol: Column, tokensCol: Column, budget: Long): DataFrame =
    sequencePack(df, orderCol, tokensCol, budget)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        min(col("id")).as("first_doc"), max(col("id")).as("last_doc"))

  /** Document chunking for context-window-bounded training: split each
    * document into fixed-size character windows with `overlapChars` of
    * overlap (the standard sliding-window prep before tokenization when a
    * corpus exceeds the model's context). Chunk i covers
    * `[i*stride, i*stride + chunkChars)` with stride = chunkChars -
    * overlapChars; the final chunk may run short; empty documents emit no
    * chunks. Map-side only — one scan, a sequence/explode per row, no
    * shuffle — so it composes with dedup/quality filters at any scale.
    *
    * Output: doc_id, chunk_id (0-based), chunk, chunk_len. Chunk counts
    * use exact integer math (no float ceil), so the row set is
    * reproducible and SQL-restatable — q74 hash-checks it against DuckDB.
    */
  def chunkDocuments(
      df: DataFrame, textCol: Column, idCol: Column,
      chunkChars: Int, overlapChars: Int = 0): DataFrame = {
    require(chunkChars > 0, "chunkChars must be positive")
    require(overlapChars >= 0 && overlapChars < chunkChars,
      s"overlap must be in [0, chunkChars): $overlapChars vs $chunkChars")
    val stride = chunkChars - overlapChars
    val len = length(textCol)
    // extra chunks past the first: ceil(max(len - chunkChars, 0) / stride)
    // in exact integer arithmetic (floor((len - chunkChars + stride - 1) / stride))
    val extra = greatest(lit(0L),
      floor((len.cast("long") - chunkChars + stride - 1) / lit(stride.toDouble))
        .cast("long"))
    df.filter(len > 0)
      .select(idCol.cast("long").as("doc_id"), textCol.as("__t"),
        posexplode(sequence(lit(0L), extra)).as(Seq("chunk_id", "__i")))
      .select(col("doc_id"), col("chunk_id"),
        col("__t").substr(
          (col("__i") * stride + 1).cast("int"), lit(chunkChars)).as("chunk"))
      .withColumn("chunk_len", length(col("chunk")))
  }
}
