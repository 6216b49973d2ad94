package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixture control: deterministic stratified subsampling toward a
  * target stratum mixture — the "data mixing" step of a training-data
  * pipeline (upweight rare languages/sources by downsampling the rest).
  *
  * Sampling is hash-based, not `sampleBy`: a row survives iff
  * xxhash64(id, seed) mapped to [0,1) falls under its stratum's fraction.
  * That makes the sample a pure, deterministic FUNCTION of (id, seed) —
  * reproducible across runs, cluster layouts, and partitionings, and
  * stable under re-execution (Bernoulli `sampleBy` depends on partition
  * iteration order). One scan, no shuffle: the fractions table broadcasts.
  */
object Sampling {

  /** Per-row survival test: uniform in [0,1) from xxhash64(id, seed). */
  private def unitHash(idCol: Column, seed: Long): Column =
    (pmod(xxhash64(idCol, lit(seed)), lit(1000000000L)).cast("double") / 1e9)

  /** Keep each stratum at `fractions(stratum)` (missing strata keep 0). */
  def stratifiedSample(
      df: DataFrame, strataCol: Column, idCol: Column,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val fdf = spark.createDataFrame(fractions.toSeq).toDF("__stratum", "__fraction")
    df.withColumn("__stratum", strataCol.cast("string"))
      .join(broadcast(fdf), Seq("__stratum"), "left")
      .filter(unitHash(idCol, seed) < coalesce(col("__fraction"), lit(0.0)))
      .drop("__stratum", "__fraction")
  }

  /** Sampling fractions that move the corpus toward `targetShares`
    * (shares of the OUTPUT, summing to <= 1): the stratum needing the
    * deepest cut keeps fraction 1.0 is wrong — instead the output size is
    * maximized subject to every stratum hitting its share: output N is
    * bounded by min over strata of count(s) / share(s); fraction(s) =
    * N * share(s) / count(s). Strata absent from the target are dropped. */
  def mixtureFractions(
      df: DataFrame, strataCol: Column,
      targetShares: Map[String, Double]): Map[String, Double] = {
    val counts = df.groupBy(strataCol.cast("string").as("s"))
      .count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a positively-weighted stratum with zero rows makes the target
    // infeasible — fail loudly rather than silently renormalizing the
    // mixture over the strata that happen to exist
    val missing = targetShares.collect {
      case (s, share) if share > 0 && counts.getOrElse(s, 0L) == 0L => s
    }
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"target mixture is infeasible: strata ${missing.mkString(", ")} have no rows")
    val feasibleN = targetShares.collect {
      case (s, share) if share > 0 => counts(s) / share
    }
    if (feasibleN.isEmpty) Map.empty
    else {
      val n = feasibleN.min
      targetShares.collect {
        case (s, share) if share > 0 =>
          s -> math.min(1.0, n * share / counts(s))
      }
    }
  }

  /** Resample the corpus to the target stratum mixture (deterministic). */
  def resampleToMixture(
      df: DataFrame, strataCol: Column, idCol: Column,
      targetShares: Map[String, Double], seed: Long = 42L): DataFrame =
    stratifiedSample(df, strataCol, idCol,
      mixtureFractions(df, strataCol, targetShares), seed)

  /** Temperature-scaled mixture shares — the multilingual smoothing rule
    * of XLM-R (Conneau et al. 2020) / mT5 (Xue et al. 2021):
    * share_s ∝ c_s^α, so α = 1 keeps the natural distribution, α → 0
    * approaches uniform, and intermediate α up-samples low-resource
    * strata without flattening entirely.
    *
    * Determinism contract: the Σ c^α normalizer is folded in ASCENDING
    * STRATUM-NAME order (IEEE addition is order-sensitive; an unordered
    * Map fold would make the shares run-dependent), and α = 0.5 routes
    * through `sqrt` — the one power IEEE 754 requires correctly rounded,
    * so a cross-engine oracle (q133) reproduces the exact doubles where
    * generic libm `pow` parity is never assumed in this codebase.
    * Driver state is strata-sized (the same counts collect as
    * [[mixtureFractions]]), never corpus-sized. */
  def temperatureShares(
      df: DataFrame, strataCol: Column, alpha: Double): Map[String, Double] = {
    require(alpha > 0 && alpha <= 1, s"temperature alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(strataCol.cast("string").as("s"))
      .count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    require(counts.nonEmpty, "temperatureShares needs a non-empty corpus")
    val pows = counts.map { case (s, c) =>
      s -> (if (alpha == 0.5) math.sqrt(c.toDouble) else math.pow(c.toDouble, alpha))
    }
    val z = pows.foldLeft(0.0)(_ + _._2)
    pows.map { case (s, p) => s -> p / z }.toMap
  }

  /** Resample toward the α-temperature mixture (deterministic hash gate —
    * composition of [[temperatureShares]] and [[resampleToMixture]]). */
  def resampleToTemperature(
      df: DataFrame, strataCol: Column, idCol: Column,
      alpha: Double, seed: Long = 42L): DataFrame =
    resampleToMixture(df, strataCol, idCol,
      temperatureShares(df, strataCol, alpha), seed)

  /** Deterministic train/val/test (or any n-way) split: each row gets
    * exactly one label, chosen by where its unit hash falls among the
    * cumulative split fractions. A pure function of (id, seed) — the same
    * row lands in the same split on every run, cluster layout, and
    * re-execution, which is what keeps eval sets leak-free when the corpus
    * is rebuilt. Map-only: no shuffle, no count, arbitrarily wide.
    *
    * @param splits ordered (label, fraction) pairs; fractions must sum to
    *               1 (±1e-9) — an explicit contract beats silently
    *               renormalizing a typo'd 0.8/0.1/0.2
    */
  def assignSplits(
      df: DataFrame, idCol: Column,
      splits: Seq[(String, Double)], seed: Long = 42L,
      labelCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "assignSplits needs at least one split")
    require(splits.forall(_._2 >= 0), "split fractions must be non-negative")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $total")
    val u = unitHash(idCol, seed)
    // cumulative upper bounds; the last bucket takes everything below 1.0
    // (incl. float-sum slack), so every row gets exactly one label
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
    val labeled = splits.init.zip(bounds.init)
      .foldLeft(when(lit(false), lit(null).cast("string"))) {
        case (acc, ((label, _), upper)) => acc.when(u < upper, label)
      }
      .otherwise(splits.last._1)
    df.withColumn(labelCol, labeled)
  }

  /** Token-budget mixture allocation — the data-constrained-scaling
    * planning step (Muennighoff et al. 2023): given a total training
    * token budget and a repeat cap, decide how many tokens to draw from
    * each source. Uniform target share (budget/S per source), capped at
    * availability × maxRepeat; the gap between budget and Σ alloc is
    * reported per-row (`leftover_tokens`, same value every row) rather
    * than silently redistributed — redistribution policy is a caller
    * decision (re-run on the uncapped sources with the leftover).
    * Output per source: avail_tokens, alloc_tokens (2dp), epochs (4dp),
    * capped flag, leftover_tokens (2dp).
    *
    * Scale shape: one map-side-combining aggregate over the corpus; the
    * allocation itself is S-sized arithmetic in a window over the tiny
    * aggregate result. */
  def tokenBudgetMix(docs: DataFrame, textCol: Column, srcCol: Column,
      budget: Long, maxRepeat: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    docs
      .groupBy(srcCol.cast("string").as("source"))
      .agg(sum(graft.functions.TextFunctions.tokenCount(textCol))
        .as("avail_tokens"))
      .withColumn("__target",
        lit(budget.toDouble) / count(lit(1)).over(w))
      .withColumn("__alloc",
        least(col("avail_tokens").cast("double") * lit(maxRepeat),
          col("__target")))
      .withColumn("alloc_tokens", round(col("__alloc"), 2))
      .withColumn("epochs",
        round(col("__alloc") / col("avail_tokens").cast("double"), 4))
      .withColumn("capped",
        when(col("avail_tokens").cast("double") * lit(maxRepeat)
          < col("__target"), 1L).otherwise(0L))
      .withColumn("leftover_tokens",
        round(lit(budget.toDouble) - sum(col("__alloc")).over(w), 2))
      .drop("__target", "__alloc")
  }

  /** Deterministic per-stratum bottom-k sample (the "bottom-k sketch"
    * device): keep the k rows with the SMALLEST unit hash in each
    * stratum — an exact uniform simple random sample without
    * replacement of size min(k, |stratum|), as a pure function of
    * (id, seed). Replay-stable like [[assignSplits]], and COORDINATED:
    * two corpus snapshots sample consistently (a doc is displaced only
    * by a doc with a smaller hash, never by re-rolls), which is what
    * makes per-snapshot eval panels comparable. Ties in the 1e-9-grid
    * unit hash break by id, so the sample is total-order deterministic.
    *
    * Scale shape: one hash shuffle on the stratum key; the rank filter
    * plans as WindowGroupLimit (per-group top-k pushdown — partial
    * limits run map-side before the exchange; no stratum is ever fully
    * sorted in one task's memory beyond its top k).
    */
  def bottomKSample(docs: DataFrame, strataCol: Column, idCol: Column,
      k: Int, seed: Long = 42L, rankCol: String = "sample_rank"): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(unitHash(idCol, seed).asc, idCol.asc)
    docs.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }

  /** Deterministic epoch shuffle into training shards: every row gets a
    * (shard, pos) address from its unit hash — the global pseudo-random
    * order a training run reads, reproducible across runs and cluster
    * layouts (same contract as [[assignSplits]]; vary `seed` per epoch
    * for a fresh order). Output (doc_id, shard, pos), pos 1-based within
    * shard by (u, doc_id).
    *
    * Scale shape: shard assignment is map-only; the position window
    * shuffles once on shard and sorts within — exactly the
    * repartition+sortWithinPartitions a shard writer runs anyway. No
    * global sort: order is only ever defined WITHIN a shard. */
  def shardAssignment(docs: DataFrame, idCol: Column, nShards: Int,
      seed: Long = 42L): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val u = unitHash(idCol, seed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("u"), col("doc_id"))
    docs.select(idCol.cast("long").as("doc_id"), u.as("u"),
        floor(u * lit(nShards)).cast("long").as("shard"))
      .select(col("doc_id"), col("shard"),
        row_number().over(w).cast("long").as("pos"))
  }

  /** Deterministic WEIGHTED fixed-size sample (without replacement) by
    * integer-weight expansion bottom-k: each row is expanded into
    * `weight` virtual copies keyed xxhash64(id, j), j < weight, and the
    * k rows with the smallest per-row minimum key win — EXACTLY a
    * uniform bottom-k over the weight-fold expanded corpus, so a
    * weight-w row competes with w lottery tickets (P(min below any
    * threshold u) = 1-(1-u)^w). The quality-weighted "pick k docs,
    * favoring the good ones" step of a curation pipeline, with the same
    * reproducibility contract as [[stratifiedSample]]: the sample is a
    * pure function of (id, weight, k), stable across runs, partition
    * layouts, and cluster sizes — and exactly re-derivable by an
    * external oracle, which no RNG-based weighted sampler is.
    *
    * Scale shape: the expansion is map-only ×avg(weight) (integer
    * weights are meant to be SMALL — quality buckets, not raw scores);
    * the per-row min is a map-side-combining aggregate; the global
    * bottom-k is TakeOrdered (per-partition heaps, never a full sort).
    * Ties broken by id for a total deterministic order.
    *
    * Output: (doc_id, weight, priority), the k winners ascending. */
  def weightedBottomK(docs: DataFrame, idCol: Column, weight: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    docs.select(idCol.cast("long").as("doc_id"),
        weight.cast("long").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("__j", explode(sequence(lit(0L), col("weight") - 1)))
      // group by id ALONE: an id appearing with several weights (an
      // upstream dedup miss, a weight recomputed across epochs) must
      // still win at most ONE slot — the ticket sets j < w are nested,
      // so min over the union of tickets ≡ the max-weight semantics,
      // and max(weight) reports the weight that actually competed
      .groupBy(col("doc_id"))
      .agg(max(col("weight")).as("weight"),
        min(xxhash64(col("doc_id"), col("__j"))).as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)
  }
}
