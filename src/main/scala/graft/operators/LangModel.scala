package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Corpus bigram language model + per-document cross-entropy scoring —
  * the CCNet-style perplexity quality filter (Wenzek et al. 2020) that
  * LLM training pipelines run between heuristic gates and dedup,
  * re-expressed relationally. The reference's pipeline has no LM stage
  * (its quality gates are field-validity checks, Validators.php:24-61);
  * this is a north-star extension over the `documents` table.
  *
  * Determinism contract (the fixture-oracle device, see q93/q94):
  * `log2` is computed ONLY in Spark, once, inside [[bigramLm]], and its
  * output is exported as a parquet fixture. Scoring — both the engine's
  * [[crossEntropy]] and the DuckDB oracle — consumes the SAME logp
  * doubles and folds them in the SAME (token-position) order with plain
  * IEEE adds, so the compare is exact by construction and no cross-engine
  * libm parity is ever assumed. Probabilities are Laplace-smoothed
  * rationals ((cnt+1)/(c1+V)) — exact in both engines by IEEE division.
  */
object LangModel {

  /** (doc_id, pos, w1, w2) bigram stream: zip the token array against its
    * own 1-shift — map-only (posexplode of a zip_with over slices), no
    * self-join, no shuffle. Docs with <2 tokens emit nothing. Empty
    * tokens cannot occur ('\S+' tokenization); the filter guards the ""
    * unseen-sentinel invariant anyway. */
  def bigramRows(docs: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    val w = tokens(textCol)
    val n1 = greatest(size(w) - 1, lit(0))
    // re-widen (r18, Dedup.rewiden): the tokenize+zip explode is every
    // LM consumer's heavy map and a single-file corpus runs it serially
    Dedup.rewiden(docs, idCol)
      .select(idCol.cast("long").as("doc_id"),
        posexplode(zip_with(slice(w, lit(1), n1), slice(w, lit(2), n1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as(Seq("pos", "bg")))
      .select(col("doc_id"), col("pos"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
  }

  /** Laplace-smoothed corpus bigram LM: p(w2|w1) = (c(w1,w2)+1)/(c1(w1)+V)
    * where c1 is w1's count as a bigram prefix and V the corpus unigram
    * vocabulary. Output rows (w1, w2, cnt, logp), logp = round(log2 p, 9):
    *   - observed bigrams:        (w1,  w2, cnt, logp)
    *   - per-prefix unseen mass:  (w1,  "",   0, log2(1/(c1+V)))   [one per w1]
    *   - global OOV fallback:     ("",  "",   0, log2(1/V))        [one row]
    * so a scorer coalesces observed → prefix-unseen → global and never
    * misses. All columns scalar (driver-sortable).
    *
    * Scale shape: ONE map-side-combining aggregate on (w1,w2) — the only
    * corpus-sized shuffle; c1 re-aggregates the (vocab²-bounded) result;
    * V is a single scalar aggregate. The c1 join is vocab-sized →
    * broadcast at any corpus scale. */
  def bigramLm(docs: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    val vocabV: Long = docs
      .select(explode(tokens(textCol)).as("word"))
      .filter(length(col("word")) > 0)
      .agg(countDistinct(col("word"))).head().getLong(0)
    // c2 is the ONLY corpus-sized aggregation; everything downstream (c1,
    // obs, unseen) re-derives from its vocab²-bounded result. Without the
    // lazy localCheckpoint each union branch would recompute the corpus
    // explode+shuffle (the q76 device).
    val c2 = bigramRows(docs, textCol, idCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    lmFromCounts(docs, c2, vocabV)
  }

  /** The counts→LM derivation shared by [[bigramLm]] and
    * [[bigramLmPair]]: `c2` must be the (w1, w2, cnt) bigram counts of
    * the corpus the LM describes (vocab²-bounded, already checkpointed
    * by the caller), `vocabV` its unigram vocabulary size. */
  private def lmFromCounts(docs: DataFrame, c2: DataFrame,
      vocabV: Long): DataFrame = {
    val c1 = c2.groupBy(col("w1")).agg(sum(col("cnt")).as("c1"))
    val obs = c2.join(c1, Seq("w1"))
      .select(col("w1"), col("w2"), col("cnt"),
        round(log2((col("cnt") + lit(1L)).cast("double") /
          (col("c1") + lit(vocabV)).cast("double")), 9).as("logp"))
    val unseen = c1.select(col("w1"), lit("").as("w2"), lit(0L).as("cnt"),
      round(log2(lit(1.0) / (col("c1") + lit(vocabV)).cast("double")), 9)
        .as("logp"))
    val oov = docs.sparkSession.range(1)
      .select(lit("").as("w1"), lit("").as("w2"), lit(0L).as("cnt"),
        round(log2(lit(1.0) / lit(vocabV).cast("double")), 9).as("logp"))
    obs.unionByName(unseen).unionByName(oov)
  }

  /** Train the (target-slice, full-corpus) LM PAIR a DSIR selection
    * needs in HALF the corpus passes of two [[bigramLm]] calls: one
    * flagged token scan yields both vocabularies (two countDistincts in
    * one aggregate), one flagged bigram aggregate yields both count
    * tables (`cnt_t` counts only rows where `targetCond` held; the
    * target LM's counts are the cnt_t > 0 slice). Bit-identical to
    * `(bigramLm(docs.filter(targetCond)), bigramLm(docs))` — the counts
    * and vocab sizes are the same integers, so every logp double is the
    * same IEEE division + log2 + round — pinned in LangModelSpec.
    *
    * Scale shape: same as [[bigramLm]] — the flagged aggregate is the
    * only corpus-sized shuffle (map-side combining; one column wider),
    * checkpointed once and sliced twice. */
  def bigramLmPair(docs: DataFrame, textCol: Column, idCol: Column,
      targetCond: Column): (DataFrame, DataFrame) = {
    val vr = docs
      .select(explode(tokens(textCol)).as("word"), targetCond.as("t"))
      .filter(length(col("word")) > 0)
      .agg(countDistinct(col("word")),
        countDistinct(when(col("t"), col("word")))).head()
    val (vS, vT) = (vr.getLong(0), vr.getLong(1))
    val w = tokens(textCol)
    val n1 = greatest(size(w) - 1, lit(0))
    val c2both = docs
      .select(targetCond.as("t"),
        posexplode(zip_with(slice(w, lit(1), n1), slice(w, lit(2), n1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as(Seq("pos", "bg")))
      .select(col("t"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
      .groupBy(col("w1"), col("w2")).agg(
        count(lit(1)).as("cnt_s"),
        count(when(col("t"), lit(1))).as("cnt_t"))
      .localCheckpoint(eager = false)
    val lmS = lmFromCounts(docs,
      c2both.select(col("w1"), col("w2"), col("cnt_s").as("cnt")), vS)
    val lmT = lmFromCounts(docs,
      c2both.filter(col("cnt_t") > 0)
        .select(col("w1"), col("w2"), col("cnt_t").as("cnt")), vT)
    (lmT, lmS)
  }

  /** Per-document cross-entropy under a [[bigramLm]] model: one row per
    * input document — (doc_id, n_bigrams, total_bits, bits_per_token),
    * bits_per_token = −(Σ logp)/n at 6dp (NULL when the doc has no
    * bigram; total_bits 0 there — docs are never dropped). The Σ is the
    * q89 ordered-fold device, computed by the native
    * [[graft.plans.OrderedSumAgg]] (position-sorted left-fold of IEEE
    * adds) — bit-reproducible and exactly restatable as DuckDB
    * `list_sum(list(lp ORDER BY pos))` over the same fixture doubles.
    *
    * Scale shape: the lm joins are model-sized (vocab² bounded) →
    * broadcast; the fold's state is one document's bigrams, never
    * corpus-wide. `+ 0.0` normalizes a possible IEEE −0.0 total (a
    * degenerate all-certain corpus) to +0.0 on both engines. */
  /** Per-(doc, pos) bigram log-probability under `lm` — the shared
    * scoring frame behind [[crossEntropy]] and [[minKProb]] (broadcast
    * model-sized lookups, obs → unseen-continuation → OOV coalesce). */
  private def tokenLogps(docs: DataFrame, lm: DataFrame, textCol: Column,
      idCol: Column): DataFrame = {
    val obs = lm.filter(col("w1") =!= "" && col("w2") =!= "")
      .select(col("w1"), col("w2"), col("logp"))
    val uns = lm.filter(col("w1") =!= "" && col("w2") === "")
      .select(col("w1"), col("logp").as("lp_unseen"))
    val oov = lm.filter(col("w1") === "" && col("w2") === "")
      .select(col("logp").as("lp_oov"))
    bigramRows(docs, textCol, idCol)
      .join(obs, Seq("w1", "w2"), "left")
      .join(uns, Seq("w1"), "left")
      .crossJoin(broadcast(oov))
      .select(col("doc_id"), col("pos"),
        coalesce(col("logp"), col("lp_unseen"), col("lp_oov")).as("lp"))
  }

  def crossEntropy(docs: DataFrame, lm: DataFrame, textCol: Column,
      idCol: Column): DataFrame = {
    val lp = tokenLogps(docs, lm, textCol, idCol)
    val perDoc = lp.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_bigrams"),
      graft.plans.OrderedFold.orderedSum(col("pos"), col("lp")).as("sum_lp"))
    docs.select(idCol.cast("long").as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (round(coalesce(col("sum_lp") * lit(-1.0), lit(0.0)), 6) + lit(0.0))
          .as("total_bits"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          round(col("sum_lp") * lit(-1.0) / col("n_bigrams"), 6) + lit(0.0))
          .as("bits_per_token"))
  }

  /** Min-K% prob membership audit (Shi et al. 2023, "Detecting
    * Pretraining Data from Large Language Models"): per document, the
    * mean log-probability of its LOWEST-k-fraction token logps. The
    * paper's signal: a document the model trained on has its outlier
    * (lowest-probability) tokens predicted unusually well, so a HIGH
    * min-k mean flags likely membership / benchmark contamination —
    * while the full-document mean ([[crossEntropy]]) is diluted by the
    * easy tokens everyone predicts.
    *
    * m = max(1, floor(k·n_bigrams)); both engines compute floor on the
    * identical IEEE product, so the cut is cross-engine stable. The
    * selected-subset sum folds by SELECTION RANK (the per-doc
    * (lp, pos) order) through the native ordered aggregate, which the
    * oracle reproduces bit-for-bit with an ordered list_sum. Scale
    * shape: the LM lookups broadcast (model-sized); the selection is a
    * per-document window (never global); state is one document's
    * bigrams. */
  def minKProb(docs: DataFrame, lm: DataFrame, textCol: Column,
      idCol: Column, k: Double = 0.2): DataFrame = {
    require(k > 0 && k <= 1, s"k=$k must be a fraction in (0, 1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("lp"), col("pos"))
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val sel = tokenLogps(docs, lm, textCol, idCol)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_bigrams", count(lit(1)).over(cw))
      .withColumn("m", greatest(lit(1L), floor(lit(k) * col("n_bigrams"))))
      .filter(col("rn") <= col("m"))
    val perDoc = sel.groupBy(col("doc_id")).agg(
      max(col("n_bigrams")).as("n_bigrams"), max(col("m")).as("m"),
      graft.plans.OrderedFold.orderedSum(col("rn"), col("lp")).as("s"))
    docs.select(idCol.cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("m"), lit(0L)).as("m"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          round(col("s") / col("m"), 6) + lit(0.0)).as("mink_logp"))
  }

  /** CCNet's head/middle/tail banding: rank scored docs by
    * bits_per_token (ascending — head = most LM-predictable) and cut
    * into `bands` equal tiles, ties → doc_id. Docs without a defined
    * score (no bigram) are excluded — they have no perplexity.
    *
    * This plans as a single-partition window — the REFERENCE
    * implementation, kept only as the equality pin for
    * [[ceBandsScalable]] (the registered, distributed form that produces
    * bit-identical bands with no global window). */
  def ceBands(scored: DataFrame, bands: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bits_per_token"), col("doc_id"))
    scored.filter(col("n_bigrams") > 0)
      .select(col("doc_id"), col("bits_per_token"))
      .withColumn("band", ntile(bands).over(w))
  }

  /** EXACT ntile banding with NO single-partition window — the 100 TB
    * form of [[ceBands]], and the one q95 registers (same hash oracle:
    * output is bit-identical to the exact ntile).
    *
    * Two-phase distributed rank (the Packing.scala prefix-offset device,
    * applied to a sort instead of a cumsum):
    *   1. one Greenwald-Khanna pass picks ~`parts` value cut points —
    *      used ONLY to partition, so their approximation error moves rows
    *      between partitions, never between bands;
    *   2. rows map to a partition via a flat literal cut array (ties
    *      share a partition: boundaries are values, so (value, doc_id)
    *      order is globally consistent across partitions);
    *   3. per-partition row counts (≤ `parts` rows) collect to the driver
    *      and become literal prefix offsets — model-sized by construction;
    *   4. global rank = offset + row_number over a window PARTITIONED by
    *      the pid (parallel, each partition ~n/parts);
    *   5. band = the exact ntile formula over (rank, n): first n%k tiles
    *      hold ⌈n/k⌉ rows, the rest ⌊n/k⌋.
    * The two driver actions (quantile pass, count collect) run once at
    * plan build — partition assignment is a literal expression, so the
    * counts job and the rank job cannot disagree (a raw
    * repartitionByRange would re-sample boundaries per job).
    * Skew caveat: a value tied across ≥ n/parts rows concentrates its run
    * in one partition — at that point band identity of the run is mostly
    * degenerate anyway; raise `parts` or pre-round the score. */
  def ceBandsScalable(scored: DataFrame, bands: Int = 3, parts: Int = 32,
      relativeError: Double = 1e-4): DataFrame = {
    // lazily checkpoint the scored input: the quantile pass, the count
    // pass, and the rank job would otherwise each re-execute the whole
    // upstream scoring pipeline (3× a corpus LM scan, measured 5.0 s vs
    // 1.2 s on the q94 composition) — at 100 TB the scored frame is
    // materialized once, exactly as a real banding pass would persist it
    val defined = scored.filter(col("n_bigrams") > 0)
      .select(col("doc_id"), col("bits_per_token"))
      .localCheckpoint(false)
    val cuts =
      if (parts <= 1) Seq.empty[Double]
      else defined.stat.approxQuantile("bits_per_token",
        (1 until parts).map(_.toDouble / parts).toArray, relativeError)
        .toSeq.distinct.sorted
    // pid = count of cuts strictly below the value — a FLAT literal-array
    // expression, not a nested when-chain (a fold of when().otherwise()
    // builds a Column tree `parts` deep and overflows the converter stack
    // near ~1000 branches; one array literal + size(filter) stays O(1)
    // deep at any parts)
    val pidExpr =
      if (cuts.isEmpty) lit(0)
      else size(filter(array(cuts.map(lit): _*),
        c => c < col("bits_per_token")))
    val withPid = defined.withColumn("pid", pidExpr)
    val counts: Map[Int, Long] = withPid.groupBy(col("pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = 0 to cuts.size
    val offsets = pids.scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    // prefix-offset lookup by pid, same flat-literal device (1-based
    // element_at over the offsets array)
    val offExpr = element_at(
      array(pids.map(p => lit(offsets(p))): _*), col("pid") + 1)
    val n = counts.values.sum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("bits_per_token"), col("doc_id"))
    val ranked = withPid
      .withColumn("r", row_number().over(w).cast("long") + offExpr)
    val base = n / bands
    val rem = n % bands
    val headRows = rem * (base + 1)
    // exact-integer tile arithmetic via floor on doubles: exact to 2^53
    // rows, and `/` on longs would return double anyway
    val band = when(col("r") <= headRows,
        floor((col("r") - 1) / (base + 1)) + 1)
      .otherwise(lit(rem) +
        floor((col("r") - headRows - 1) / math.max(base, 1L)) + 1)
    ranked.select(col("doc_id"), col("bits_per_token"),
      band.cast("int").as("band"))
  }

  /** Approximate banding: cut points from approxQuantile (one pass,
    * Greenwald-Khanna, no global sort) then a map-only when-chain —
    * bands are value-defined, so ties NEVER split across bands (unlike
    * ntile) and band sizes deviate by up to ε·n plus tie-run length.
    * [[ceBandsScalable]] supersedes this for exact-parity needs; kept as
    * the cheapest (zero-window) variant, agreement-pinned in
    * LangModelSpec. */
  def ceBandsApprox(scored: DataFrame, bands: Int = 3,
      relativeError: Double = 1e-4): DataFrame = {
    val defined = scored.filter(col("n_bigrams") > 0)
      .select(col("doc_id"), col("bits_per_token"))
    val probs = (1 until bands).map(_.toDouble / bands).toArray
    val cuts = defined.stat.approxQuantile("bits_per_token", probs, relativeError)
    val band = cuts.zipWithIndex.foldRight(lit(bands): Column) {
      case ((cut, i), rest) => when(col("bits_per_token") <= cut, i + 1).otherwise(rest)
    }
    defined.withColumn("band", band)
  }
}
