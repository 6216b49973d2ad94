package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw document
  * by how much more likely a TARGET-domain n-gram LM finds it than the
  * SOURCE (raw-corpus) LM, then keep the top slice by weight — the
  * standard way a pretraining pipeline steers a 100 TB crawl toward a
  * quality/domain target without a neural classifier. Re-expressed
  * relationally over the [[LangModel]] bigram machinery (the paper's
  * hashed-n-gram features are exactly bag-of-bigram log-likelihood
  * ratios; our features are the unhashed bigrams themselves).
  *
  * Determinism contract (the q93/q94 fixture-oracle device): log2 lives
  * ONLY inside [[LangModel.bigramLm]]; both LMs' snapped logp doubles are
  * exported as fixtures, and scoring — engine and oracle alike — is pure
  * coalesce + IEEE subtraction + the position-ordered fold, so the
  * cross-engine compare is exact with no libm on the oracle side.
  *
  * The reference's pipeline has no selection stage (it migrates every
  * record that validates, Validators.php:24-61); this is a north-star
  * extension over the `documents` table.
  */
object Dsir {

  /** Per-document log importance weight
    * logw = Σ_pos (logp_target − logp_source), the log-likelihood ratio
    * of the document under the two LMs, folded in token-position order
    * (the q89 device, via the native [[graft.plans.OrderedSumAgg]]) and
    * rounded to 6dp (+0.0 normalizes −0.0).
    * Docs with no bigram get logw = 0 and n_bigrams = 0 — never dropped.
    *
    * Scale shape: ONE corpus-sized bigramRows scan, and the two LMs'
    * lookup tables are pre-combined with model-sized full-outer joins so
    * the corpus stream passes through only TWO lookup joins + one 1-row
    * crossJoin (not one set per LM) — presence of each side's logp is
    * preserved exactly, so the coalesce chains are unchanged. The fold
    * state is one document's bigrams. The Δlogp is computed POSITIONWISE
    * before the fold (not two separate CE folds subtracted) so the
    * oracle can replay the identical IEEE sequence. */
  def importanceWeights(docs: DataFrame, lmTarget: DataFrame,
      lmSource: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    def parts(lm: DataFrame, tag: String) = (
      lm.filter(col("w1") =!= "" && col("w2") =!= "")
        .select(col("w1"), col("w2"), col("logp").as(s"lp_obs_$tag")),
      lm.filter(col("w1") =!= "" && col("w2") === "")
        .select(col("w1"), col("logp").as(s"lp_uns_$tag")),
      lm.filter(col("w1") === "" && col("w2") === "")
        .select(col("logp").as(s"lp_oov_$tag")))
    val (obsT, unsT, oovT) = parts(lmTarget, "t")
    val (obsS, unsS, oovS) = parts(lmSource, "s")
    // union+aggregate, not full_outer join: same presence semantics
    // (group exists iff the key is in either table; each side's logp is
    // null iff absent there — max() of one non-null double is bitwise
    // itself), but plans as one model-sized HashAggregate instead of a
    // SortMergeJoin, keeping the plan SMJ-free outside the doc_id join
    val nd = lit(null).cast("double")
    val obsJ = broadcast(
      obsT.withColumn("lp_obs_s", nd)
        .unionByName(obsS.withColumn("lp_obs_t", nd))
        .groupBy(col("w1"), col("w2"))
        .agg(max(col("lp_obs_t")).as("lp_obs_t"),
          max(col("lp_obs_s")).as("lp_obs_s")))
    val unsJ = broadcast(
      unsT.withColumn("lp_uns_s", nd)
        .unionByName(unsS.withColumn("lp_uns_t", nd))
        .groupBy(col("w1"))
        .agg(max(col("lp_uns_t")).as("lp_uns_t"),
          max(col("lp_uns_s")).as("lp_uns_s")))
    val oovJ = oovT.crossJoin(oovS)
    val dlp = LangModel.bigramRows(docs, textCol, idCol)
      .join(obsJ, Seq("w1", "w2"), "left")
      .join(unsJ, Seq("w1"), "left")
      .crossJoin(broadcast(oovJ))
      .select(col("doc_id"), col("pos"),
        (coalesce(col("lp_obs_t"), col("lp_uns_t"), col("lp_oov_t")) -
          coalesce(col("lp_obs_s"), col("lp_uns_s"), col("lp_oov_s")))
          .as("dlp"))
    val perDoc = dlp.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_bigrams"),
      graft.plans.OrderedFold.orderedSum(col("pos"), col("dlp")).as("logw_raw"))
    docs.select(idCol.cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (round(coalesce(col("logw_raw"), lit(0.0)), 6) + lit(0.0)).as("logw"))
  }

  /** Deterministic top-k selection by (logw DESC, doc_id): the
    * resampling step with the paper's Gumbel noise dropped for
    * replay-stability (ties broken by id, not RNG). Output
    * (rank, doc_id, logw), rank 1 = strongest target pull.
    *
    * Scale shape: orderBy+limit plans as TakeOrderedAndProject — a
    * per-partition top-k + driver merge of k-sized heaps, NO global sort
    * shuffle; the rank window runs on the k-sized result only. */
  def selectTopK(weights: DataFrame, k: Int): DataFrame = {
    val topk = weights.filter(col("n_bigrams") > 0)
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("logw").desc, col("doc_id"))
    topk.select(row_number().over(w).as("rank"), col("doc_id"), col("logw"))
      .orderBy(col("rank"))
  }
}
