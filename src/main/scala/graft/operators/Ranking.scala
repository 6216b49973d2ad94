package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.OrderedFold.orderedSum

/** Sparse lexical retrieval scoring (Okapi BM25) — the workhorse behind
  * retrieval-based curation: quality-by-relatedness filtering, targeted
  * decontamination probes, and building retrieval training pairs from a
  * raw corpus. The reference's closest surface is its content search
  * (conversation search by subject, TicketProcessor.php:353-373); this is
  * that idea generalized to ranked full-text relevance at corpus scale.
  *
  * Scale shape (the 100 TB plan):
  *  - one tokenize+count shuffle builds the (doc, term, tf) posting frame
  *    and its per-doc length side — the same frame an inverted index
  *    would persist; everything downstream joins AGAINST it, never
  *    re-reading text;
  *  - the query set is model-sized and rides as a broadcast literal
  *    table, so the posting frame is pruned to the query vocabulary
  *    BEFORE any per-term statistics join — the big frame is touched
  *    once, map-side;
  *  - corpus constants (N, avgdl) are single-row aggregates crossJoin'd
  *    as a broadcast, exact by construction: avgdl divides the exact
  *    long token total, no double accumulation;
  *  - the per-(query, doc) score folds term contributions in pinned
  *    term-hash order ([[graft.plans.OrderedSumAgg]]) so repeated runs
  *    are bit-identical regardless of shuffle arrival order.
  */
object Ranking {

  /** BM25 scores for every (query, document) pair sharing at least one
    * term. Emits `(query_id, doc_id, n_terms, tf_sum, score)` — the two
    * integer columns are exact join/count algebra (hash-verifiable
    * cross-engine), `score` is the IEEE double fold.
    *
    * idf is the Lucene-style always-positive form
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`; the term weight is
    * `idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`.
    *
    * @param queryTerms model-sized query set: (query_id, terms); terms
    *                   are matched against whitespace-lowercased tokens.
    */
  def bm25Scores(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      queryTerms: Seq[(Long, Seq[String])],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // Posting frame: one shuffle on (doc_id, term), materialized ONCE
    // (localCheckpoint) — dl, df, and the query match all read it, and a
    // deployment persists exactly this frame as its inverted index
    // rather than re-tokenizing the corpus per derived statistic.
    // Empty-string tokens (whitespace-only text) are dropped to match
    // `\S+` extraction.
    val tc = docs
      .select(idCol.as("doc_id"),
        explode(split(trim(lower(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()

    val dl = tc.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))

    // Corpus constants: N over ALL docs (standard BM25), avgdl over docs
    // that have tokens. Exact long sums divided once — no double
    // accumulation, so both engines derive bit-identical constants.
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val avg = dl.agg((sum(col("dl")).cast("double") /
      count(lit(1)).cast("double")).as("avgdl"))

    val qt = queryTerms
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")

    // Prune the posting frame to the query vocabulary FIRST (broadcast
    // semi-shape), then derive df over exactly the surviving terms.
    val matched = tc.join(broadcast(qt), Seq("term"))
    val dfT = tc
      .join(broadcast(qt.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))

    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)))
    val denom = tfD + lit(k1) * (lit(1.0 - b) + lit(b) * dlD / col("avgdl"))
    val contrib = idf * (tfD * lit(k1 + 1.0)) / denom

    matched
      .join(broadcast(dfT), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(nDocs))
      .crossJoin(broadcast(avg))
      .select(col("query_id"), col("doc_id"), col("term"), col("tf"),
        contrib.as("contrib"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("tf")).as("tf_sum"),
        orderedSum(xxhash64(col("term")), col("contrib")).as("score"))
  }
}
