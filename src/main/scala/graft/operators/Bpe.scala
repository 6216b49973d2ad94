package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-training pass of an LLM data pipeline. Symbols start as
  * single characters within whitespace words (merges never cross a word
  * boundary); each round counts adjacent symbol pairs corpus-wide
  * weighted by word frequency, picks the most frequent (ties → smaller
  * left, then right, by binary string order), and merges its occurrences
  * greedily left-to-right ("aaa" + merge (a,a) → "(aa)a", exactly like
  * reference BPE implementations).
  *
  * Distribution contract (the same shape as the kmeans/PQ trainers):
  * the ONE corpus-sized step — collapsing the corpus to (word, freq) —
  * is a distributed map-side-combining aggregate; the merge loop then
  * runs on that MODEL-SIZED state driver-side, exactly like every
  * reference BPE trainer (the vocab table IS the tokenizer model). The
  * driver state is bounded by `maxVocab` BY DEFAULT (keep the most
  * frequent words; ties → word order) — see [[DefaultMaxVocab]]. The
  * loop itself costs microseconds — all the engine pays per round is
  * nothing, not a distributed job.
  *
  * Every quantity is an integer count or a string — no floats — so the
  * loop is exactly restatable in ANSI SQL; the q98/q99 oracles replay it
  * round by round from the raw documents.
  */
object Bpe {

  /** Default driver-state bound: keep the 2^16 most frequent words.
    * Reference BPE trainers cap the word table anyway (rare tail words
    * contribute negligible pair mass), and an UNCAPPED collect is
    * billions of entries at 100 TB — so the cap is the default and
    * `maxVocab = None` is the explicit small-corpus opt-out. */
  val DefaultMaxVocab = 65536

  final case class Merge(step: Int, lhs: String, rhs: String, pairCount: Long)

  /** The corpus collapsed to (word, freq) — the single corpus-sized step. */
  def wordFreq(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(tokens(textCol)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Greedy left-to-right application of one merge to one word's symbols. */
  private[operators] def mergeWord(
      syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Run `nMerges` rounds on the collected (word, freq) model state.
    * Returns the learned merges and the final per-word segmentation.
    * Stops early if no pair remains. */
  def learnMerges(docs: DataFrame, textCol: Column, nMerges: Int,
      maxVocab: Option[Int] = Some(DefaultMaxVocab)): (Seq[Merge], Seq[(String, Long, Vector[String])]) = {
    val wf = wordFreq(docs, textCol)
    val capped = maxVocab.fold(wf)(m =>
      wf.orderBy(col("freq").desc, col("word")).limit(m))
    var state: Vector[(String, Long, Vector[String])] = capped.collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(0).map(_.toString).toVector))
      .toVector.sortBy(_._1)
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((_, freq, syms) <- state; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + freq
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), cnt) =
          counts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += Merge(step, l, r, cnt)
        state = state.map { case (w, f, syms) => (w, f, mergeWord(syms, l, r)) }
        step += 1
      }
    }
    (merges.result(), state)
  }

  /** The learned merge table as a DataFrame (step, lhs, rhs, pair_count) —
    * the exportable tokenizer artifact. */
  def mergeTable(docs: DataFrame, textCol: Column, nMerges: Int,
      maxVocab: Option[Int] = Some(DefaultMaxVocab)): DataFrame = {
    val (merges, _) = learnMerges(docs, textCol, nMerges, maxVocab)
    val spark = docs.sparkSession
    import spark.implicits._
    merges.map(m => (m.step.toLong, m.lhs, m.rhs, m.pairCount))
      .toDF("step", "lhs", "rhs", "pair_count")
  }

  /** Per-document segmentation stats under the learned merges:
    * (doc_id, n_tokens, distinct_tokens), docs never dropped. The doc →
    * word occurrence stream joins the model-sized per-word stats
    * (broadcast local relations) — the only post-training corpus pass.
    * Words outside a `maxVocab` cap count as unsegmented single tokens
    * of one distinct symbol (the whole word). */
  def segmentStats(docs: DataFrame, textCol: Column, idCol: Column,
      nMerges: Int, maxVocab: Option[Int] = Some(DefaultMaxVocab)): DataFrame = {
    val (_, state) = learnMerges(docs, textCol, nMerges, maxVocab)
    val spark = docs.sparkSession
    import spark.implicits._
    val perWord = state.map { case (w, _, syms) => (w, syms.length.toLong) }
      .toDF("word", "w_tokens")
    val wordSyms = state.flatMap { case (w, _, syms) => syms.distinct.map((w, _)) }
      .toDF("word", "sym")
    val occ = docs.select(idCol.cast("long").as("doc_id"),
        explode(tokens(textCol)).as("word"))
      .filter(length(col("word")) > 0)
    val nt = occ.join(broadcast(perWord), Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("w_tokens"), lit(1L))).as("n_tokens"))
    val dt = occ.distinct()
      .join(broadcast(wordSyms), Seq("word"), "left")
      .select(col("doc_id"), coalesce(col("sym"), col("word")).as("sym"))
      .groupBy(col("doc_id")).agg(countDistinct(col("sym")).as("distinct_tokens"))
    docs.select(idCol.cast("long").as("doc_id"))
      .join(nt, Seq("doc_id"), "left").join(dt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("distinct_tokens"), lit(0L)).as("distinct_tokens"))
  }
}
