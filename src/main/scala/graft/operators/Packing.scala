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

  /** Bin-level rollup of [[sequencePack]]. */
  def packedBins(
      df: DataFrame, orderCol: Column, tokensCol: Column, budget: Long): DataFrame =
    sequencePack(df, orderCol, tokensCol, budget)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        min(col("id")).as("first_doc"), max(col("id")).as("last_doc"))
      .orderBy(col("bin"))
}
