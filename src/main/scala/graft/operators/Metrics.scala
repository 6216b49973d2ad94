package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics over scored corpora — the feedback half of a
  * quality-classifier pipeline (train on labels → score the corpus →
  * measure whether the score actually separates the classes before
  * gating 100 TB on it). Binary ROC AUC via the Mann-Whitney U statistic
  * and the full precision/recall curve, both built on ONE primitive: per
  * distinct score, the exact count of positives/negatives strictly
  * below.
  *
  * Scale shape: scores aggregate to one row per DISTINCT value first
  * (one shuffle; pre-round continuous scores — every producer in this
  * library already emits 6dp-rounded scores), and the cumulative counts
  * are computed WITHOUT any single-partition window: approx-quantile
  * cuts of the score distribution bucket the distinct-score frame,
  * per-bucket windows run in parallel, and the bucket offsets ride as
  * literal arrays (the ceBandsScalable device). Cut placement only moves
  * rows between buckets — offsets + in-bucket prefix sums are exact
  * wherever the cuts land, so approxQuantile's estimation error (and
  * any run-to-run wobble) cannot change a single output value.
  *
  * The U statistic stays in INTEGER arithmetic (u2 = 2U, avoiding the
  * half-credit fraction for ties), so the oracle compare is exact; only
  * the final ratios round.
  */
object Metrics {

  /** Per-distinct-score frame: (score, n_pos, n_neg, cum_pos_below,
    * cum_neg_below) with EXCLUSIVE cumulative counts over ascending
    * score. NULL scores and NULL labels are excluded (a null score ranks
    * nowhere; a null label is unjudgeable). */
  private[operators] def cumCounts(
      df: DataFrame, scoreCol: Column, labelCol: Column,
      buckets: Int = 32): DataFrame = {
    val agg = df
      .select(scoreCol.cast("double").as("score"),
        labelCol.cast("boolean").as("y"))
      .filter(col("score").isNotNull && col("y").isNotNull)
      .groupBy(col("score"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("y"), 0L).otherwise(1L)).as("n_neg"))
      // reused three times below (cuts, totals, windows): pay the
      // aggregation once
      .localCheckpoint(true)
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val cuts =
      if (probes.isEmpty) Array.empty[Double]
      else agg.stat.approxQuantile("score", probes, 0.001).distinct.sorted
    val bucketOf = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col("score") > c, 1).otherwise(0)
    }
    val bucketed = agg.withColumn("bkt", bucketOf)
    // per-bucket totals are (≤ buckets) rows — driver-sized by
    // construction; exclusive prefix over bucket id = the literal offsets
    val totals = bucketed.groupBy(col("bkt"))
      .agg(sum(col("n_pos")).as("p"), sum(col("n_neg")).as("n"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    val nBuckets = cuts.length + 1
    val offs = (0 until nBuckets).scanLeft((0L, 0L)) { case ((p, n), b) =>
      val (bp, bn) = totals.getOrElse(b, (0L, 0L))
      (p + bp, n + bn)
    }.init
    val offPos = array(offs.map(o => lit(o._1)): _*)
    val offNeg = array(offs.map(o => lit(o._2)): _*)
    val w = Window.partitionBy(col("bkt")).orderBy(col("score"))
    bucketed
      .withColumn("cp", sum(col("n_pos")).over(w))
      .withColumn("cn", sum(col("n_neg")).over(w))
      .select(col("score"), col("n_pos"), col("n_neg"),
        (element_at(offPos, col("bkt") + 1) + col("cp") - col("n_pos"))
          .as("cum_pos_below"),
        (element_at(offNeg, col("bkt") + 1) + col("cn") - col("n_neg"))
          .as("cum_neg_below"))
  }

  /** Binary ROC AUC — one row: (n_pos, n_neg, u2, auc). u2 = 2·U where
    * U is the Mann-Whitney statistic with the standard half credit for
    * ties: u2 = Σ_s n_pos(s)·(2·cum_neg_below(s) + n_neg(s)), exact in
    * LONG arithmetic; auc = u2 / (2·n_pos·n_neg) rounded to 9dp. AUC is
    * undefined when either class is absent — that raises at evaluation
    * time (raise_error keeps the operator lazy/distributed; mirroring
    * prCurve's require() would force an extra driver-side job here). */
  def binaryAuc(
      df: DataFrame, scoreCol: Column, labelCol: Column,
      buckets: Int = 32): DataFrame =
    cumCounts(df, scoreCol, labelCol, buckets)
      .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_neg")).as("n_neg"),
        sum(col("n_pos") * (lit(2L) * col("cum_neg_below") + col("n_neg")))
          .as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 9))
          .otherwise(raise_error(concat(
            lit("binaryAuc needs both classes: n_pos="), col("n_pos"),
            lit(" n_neg="), col("n_neg"))))
          .as("auc"))

  /** The precision/recall curve: one row per distinct score s for the
    * decision rule "positive iff score ≥ s" — (score, tp, fp, fn,
    * precision 6dp, recall 6dp), descending score = sweeping the
    * threshold from strict to lax. tp+fp ≥ n_pos(s)+n_neg(s) ≥ 1 at
    * every emitted s, so precision never divides by zero. */
  def prCurve(
      df: DataFrame, scoreCol: Column, labelCol: Column,
      buckets: Int = 32): DataFrame = {
    val cc = cumCounts(df, scoreCol, labelCol, buckets)
    val tot = cc.agg(
        sum(col("n_pos")).as("tot_pos"), sum(col("n_neg")).as("tot_neg"))
      .collect()(0)
    val (totPos, totNeg) = (tot.getLong(0), tot.getLong(1))
    require(totPos > 0, "prCurve needs at least one positive label")
    cc.select(col("score"),
        (lit(totPos) - col("cum_pos_below")).as("tp"),
        (lit(totNeg) - col("cum_neg_below")).as("fp"),
        col("cum_pos_below").as("fn"))
      .select(col("score"), col("tp"), col("fp"), col("fn"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
          .as("precision"),
        round(col("tp").cast("double") / lit(totPos.toDouble), 6)
          .as("recall"))
      .orderBy(col("score").desc)
  }

  /** Ranking-quality eval for the ANN/retrieval family: one row per
    * query — `n_hits` (how many of the exact top-k the retrieved top-k
    * found), `recall_k` = n_hits/k, and `rr` = reciprocal rank of the
    * TRUE nearest neighbor in the retrieved list (0.0 when missed) —
    * the per-query pieces of recall@k and MRR. Averaging across queries
    * is left to the caller: per-query rows avoid a cross-query float
    * accumulation, so every output value is a count or a single IEEE
    * division (1/rank, n/k) that any engine rounds identically — no
    * libm, no order-dependent sums.
    *
    * Ranks are re-derived on BOTH frames with the family's tie order
    * (score desc, id asc), making the metric a pure function of the two
    * frames regardless of their row order. Queries present in `truth`
    * but absent from `retrieved` still emit a row (zero hits). Scale
    * shape: both inputs are per-query top-k frames (queries × k rows,
    * never corpus-sized); one equi-join on (query, id) + one groupBy
    * query. */
  def retrievalEval(
      retrieved: DataFrame, truth: DataFrame, k: Int,
      qCol: String = "q_id", idCol: String = "vec_id",
      scoreCol: String = "cos_sim"): DataFrame = {
    require(k >= 1, "k must be positive")
    def ranked(df: DataFrame, rank: String): DataFrame = {
      val w = Window.partitionBy(col(qCol))
        .orderBy(col(scoreCol).desc, col(idCol))
      df.select(col(qCol), col(idCol), col(scoreCol))
        .withColumn(rank, row_number().over(w))
        .filter(col(rank) <= k)
        .drop(scoreCol)
    }
    val r = ranked(retrieved, "rank")
    val t = ranked(truth, "t_rank")
    val hits = r.join(t, Seq(qCol, idCol))
      .groupBy(col(qCol))
      .agg(count(lit(1)).as("n_hits"),
        min(when(col("t_rank") === 1, col("rank"))).as("nn_rank"))
    t.select(col(qCol)).distinct()
      .join(hits, Seq(qCol), "left")
      .select(col(qCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall_k"),
        when(col("nn_rank").isNotNull,
            lit(1.0) / col("nn_rank").cast("double"))
          .otherwise(lit(0.0)).as("rr"))
  }
}
