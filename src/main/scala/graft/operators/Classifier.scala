package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Multinomial Naive-Bayes text classifier — train + score, fully
  * relational. The model-based counterpart of the heuristic language-ID
  * and quality gates: LLM pipelines run exactly this shape (fastText-
  * style linear classifiers in CCNet / quality selection à la GPT-3's
  * reference-corpus filter) between rule gates and dedup. The reference
  * has no model stage (its gates are field-validity checks,
  * Validators.php:24-61); north-star extension over `documents`.
  *
  * Determinism contract (the q93/q94 fixture-oracle device): `log2` runs
  * ONLY in Spark, once, at train time, 9dp-snapped; scoring — engine and
  * DuckDB oracle alike — consumes the same logp doubles and folds them
  * in token-position order with plain IEEE adds. No cross-engine libm
  * parity is ever assumed.
  *
  * Model rows are scalar (driver-sortable), one table for the whole
  * model, self-describing by `kind`:
  *  - ("prior", "", c, n_docs_c, log2(n_docs_c / N))
  *  - ("obs",    w, c, cnt,      log2((cnt+1)/(tot_c+V)))   [Laplace]
  *  - ("oov",   "", c, 0,        log2(1/(tot_c+V)))         [one per c]
  */
object Classifier {

  /** (doc_id, pos, word) occurrence stream — map-only posexplode. */
  def wordRows(docs: DataFrame, textCol: Column, idCol: Column): DataFrame =
    docs.select(idCol.cast("long").as("doc_id"),
        posexplode(tokens(textCol)).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)

  /** Train on `classCol` labels. Scale shape: ONE map-side-combining
    * corpus aggregate on (cls, word) — the only corpus-sized shuffle;
    * V, totals, and priors all re-derive from its (vocab × classes)-
    * bounded result (localCheckpoint so the corpus explode runs once —
    * the q76 device); the doc-count aggregate groups on the tiny class
    * key. */
  def naiveBayes(docs: DataFrame, textCol: Column, idCol: Column,
      classCol: Column): DataFrame = {
    val wc = docs
      .select(classCol.cast("string").as("cls"), explode(tokens(textCol)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("cls"), col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val v: Long = wc.agg(countDistinct(col("word"))).head().getLong(0)
    val tot = wc.groupBy(col("cls")).agg(sum(col("cnt")).as("tot"))
    val obs = wc.join(tot, Seq("cls"))
      .select(lit("obs").as("kind"), col("word"), col("cls"), col("cnt"),
        round(log2((col("cnt") + lit(1L)).cast("double") /
          (col("tot") + lit(v)).cast("double")), 9).as("logp"))
    val oov = tot.select(lit("oov").as("kind"), lit("").as("word"), col("cls"),
      lit(0L).as("cnt"),
      round(log2(lit(1.0) / (col("tot") + lit(v)).cast("double")), 9).as("logp"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val prior = docs.groupBy(classCol.cast("string").as("cls"))
      .agg(count(lit(1)).as("cnt"))
      .select(lit("prior").as("kind"), lit("").as("word"), col("cls"), col("cnt"),
        round(log2(col("cnt").cast("double") /
          sum(col("cnt")).over(wAll).cast("double")), 9).as("logp"))
    obs.unionByName(oov).unionByName(prior)
  }

  /** Per-(doc, class) log-posterior: score = round(prior + Σ logp, 6),
    * the Σ folded in token-position order (q89 device, via the native
    * [[graft.plans.OrderedSumAgg]] — restatable as DuckDB
    * list_sum(list(lp ORDER BY pos))). Every doc scores against
    * EVERY class (the class table is model-sized → broadcast); unseen
    * words take the class's OOV mass; token-less docs keep their prior
    * row (docs are never dropped). Output (doc_id, cls, n_tokens,
    * score); `+ 0.0` normalizes IEEE −0.0. */
  def nbScores(docs: DataFrame, model: DataFrame, textCol: Column,
      idCol: Column): DataFrame = {
    val obs = model.filter(col("kind") === "obs")
      .select(col("word"), col("cls"), col("logp"))
    val oov = model.filter(col("kind") === "oov")
      .select(col("cls"), col("logp").as("lp_oov"))
    val prior = model.filter(col("kind") === "prior")
      .select(col("cls"), col("logp").as("lp_prior"))
    // re-widen (r18): the token explode × C crossJoin is the operator's
    // heavy map and a single-file corpus runs it on one core otherwise
    val perDocCls = wordRows(Dedup.rewiden(docs, idCol), textCol, idCol)
      .crossJoin(broadcast(prior.select(col("cls"))))
      .join(broadcast(obs), Seq("word", "cls"), "left")
      .join(broadcast(oov), Seq("cls"), "left")
      .select(col("doc_id"), col("cls"), col("pos"),
        coalesce(col("logp"), col("lp_oov")).as("lp"))
      .groupBy(col("doc_id"), col("cls")).agg(
        count(lit(1)).as("n_tokens"),
        graft.plans.OrderedFold.orderedSum(col("pos"), col("lp")).as("sum_lp"))
    docs.select(idCol.cast("long").as("doc_id"))
      .crossJoin(broadcast(prior))
      .join(perDocCls, Seq("doc_id", "cls"), "left")
      .select(col("doc_id"), col("cls"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (round(col("lp_prior") + coalesce(col("sum_lp"), lit(0.0)), 6) + lit(0.0))
          .as("score"))
  }

  /** [[nbScores]] re-expressed SPARSELY — the many-class (C ≥ ~100)
    * deployment shape. The wide path crossJoins every token row with
    * every class before the obs lookup, so its one corpus shuffle
    * carries a ×C blowup (fine at C = 5, fatal at C = 1000). This path
    * uses the standard sparse-NB decomposition
    *   score(d,c) = prior_c + n_d·oov_c + Σ_{hits} (logp(w,c) − oov_c)
    * so the corpus-sized shuffle carries only OBSERVED (doc, cls) hits
    * (each token joins the classes that actually contain its word — the
    * model-sparsity factor, not C) plus one per-doc token count; the
    * dense doc×C surface is assembled afterwards by broadcast joins with
    * no shuffle on it. Hit deltas fold in token-position order (the
    * same OrderedSumAgg), so the path is deterministic.
    *
    * NOT bit-identical to [[nbScores]]: the wide fold adds oov_c once
    * per unseen token inside the position-ordered chain, the sparse form
    * adds n_d·oov_c in one multiply — IEEE results differ at ~1 ulp, so
    * a pre-round score within ~1e-12 of a round(·, 6) boundary can land
    * on the other side. ClassifierSpec pins equality of the rounded
    * frames and labels on the fixture corpus at 5 classes and label
    * parity at 128 synthetic classes.
    *
    * Shuffle audit (the point of the path): (1) hits keyed by
    * (doc, cls) — corpus tokens × model sparsity, NOT × C; (2) per-doc
    * token counts and delta maps keyed by doc — corpus-sized; the dense
    * doc×C output is then a broadcast nested-loop product evaluated
    * map-side (delta rides a per-doc map, bounded by the doc's distinct
    * hit classes), so no ×C frame ever crosses an exchange. */
  def nbScoresSparse(docs: DataFrame, model: DataFrame, textCol: Column,
      idCol: Column): DataFrame = {
    val obs = model.filter(col("kind") === "obs")
      .select(col("word"), col("cls"), col("logp"))
    val oov = model.filter(col("kind") === "oov")
      .select(col("cls"), col("logp").as("lp_oov"))
    val prior = model.filter(col("kind") === "prior")
      .select(col("cls"), col("logp").as("lp_prior"))
    // re-widened + lazily checkpointed (r18): `words` feeds the delta
    // aggregation AND the per-doc token count — uncut, the corpus
    // tokenized twice (the q100-audit no-ReusedExchange finding)
    val words = wordRows(Dedup.rewiden(docs, idCol), textCol, idCol)
      .localCheckpoint(eager = false)
    val deltasPerDoc = words
      .join(broadcast(obs), Seq("word"))
      .join(broadcast(oov), Seq("cls"))
      .select(col("doc_id"), col("cls"), col("pos"),
        (col("logp") - col("lp_oov")).as("delta"))
      .groupBy(col("doc_id"), col("cls"))
      .agg(graft.plans.OrderedFold.orderedSum(col("pos"), col("delta"))
        .as("delta_sum"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("cls"), col("delta_sum")))))
        .as("deltas"))
    val lens = words.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"))
    docs.select(idCol.cast("long").as("doc_id"))
      .join(lens, Seq("doc_id"), "left")
      .join(deltasPerDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior.join(oov, Seq("cls"))))
      .select(col("doc_id"), col("cls"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (round(col("lp_prior")
          + coalesce(col("n_tokens"), lit(0L)).cast("double") * col("lp_oov")
          + coalesce(element_at(col("deltas"), col("cls")), lit(0.0)), 6)
          + lit(0.0)).as("score"))
  }

  /** Argmax label per document over [[nbScores]] rows: highest score,
    * ties → smallest class string (min over the (−score, cls) struct —
    * one aggregate, no window). */
  def nbLabel(scores: DataFrame): DataFrame =
    scores
      .groupBy(col("doc_id"))
      .agg(min(struct((col("score") * lit(-1.0)).as("negs"), col("cls").as("cls")))
        .as("m"))
      .select(col("doc_id"), col("m.cls").as("label"))
}
