package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Hand-computed pins for BPE merge learning (q98/q99). Corpus
  * "aaab aab": round 1 counts (a,a)=3 (two in "aaab" — overlapping —
  * plus one in "aab"), (a,b)=2 → merge (a,a); greedy left-to-right turns
  * "aaa" into "(aa)a", NOT "a(aa)". Round 2 ties (aa,a)/(a,b)/(aa,b) at
  * 1 → smallest lhs "a" wins → (a,b). Round 3 ties (aa,ab)/(aa,b) →
  * smallest rhs "ab" wins. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tiny = Seq((1L, "aaab aab")).toDF("doc_id", "text")

  test("learnMerges: hand-computed merges, greedy overlap, tie order") {
    val (merges, state) = Bpe.learnMerges(tiny, col("text"), 3)
    assert(merges.map(m => (m.step, m.lhs, m.rhs, m.pairCount)) ===
      Seq((1, "a", "a", 3L), (2, "a", "b", 1L), (3, "aa", "ab", 1L)))
    assert(state.map { case (w, f, syms) => (w, f, syms) } ===
      Seq(("aaab", 1L, Vector("aaab")), ("aab", 1L, Vector("aa", "b"))))
  }

  test("pair counts are word-FREQUENCY weighted, not distinct-word counts") {
    // "ab" occurs 3 times across docs → merge (a,b) with corpus count 3,
    // even though the distinct-word state holds a single "ab" row
    val docs = Seq((1L, "ab ab"), (2L, "ab cd")).toDF("doc_id", "text")
    val (merges, _) = Bpe.learnMerges(docs, col("text"), 1)
    assert(merges.map(m => (m.lhs, m.rhs, m.pairCount)) === Seq(("a", "b", 3L)))
  }

  test("segmentStats: token and distinct counts after merges") {
    val got = Bpe.segmentStats(tiny, col("text"), col("doc_id"), 3).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 3L, 3L)), "tokens aaab | aa b; distinct {aaab, aa, b}")
  }

  test("exhaustion: merges stop when no pair remains; docs never dropped") {
    val docs = Seq((1L, "ab cd"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    // round 1: (a,b)=1 ties (c,d)=1 → (a,b); round 2: (c,d); then single
    // symbols everywhere → exhausted before round 4
    val (merges, _) = Bpe.learnMerges(docs, col("text"), 4)
    assert(merges.map(m => (m.lhs, m.rhs)) === Seq(("a", "b"), ("c", "d")))
    val seg = Bpe.segmentStats(docs, col("text"), col("doc_id"), 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(seg.toSeq === Seq((1L, 2L), (2L, 1L), (3L, 0L)))
  }

  test("even-length repeat runs pair up completely") {
    // "aaaa" + merge (a,a): sites at 0,1,2; parity keeps 0 and 2 → "aa aa"
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val (merges, state) = Bpe.learnMerges(docs, col("text"), 1)
    assert(merges.head.pairCount === 3L)
    assert(state.head._3 === Vector("aa", "aa"))
  }

  test("maxVocab cap: most-frequent kept (ties → word); OOV words are themselves") {
    val docs = Seq((1L, "aa aa bb cc"), (2L, "bb aa dd")).toDF("doc_id", "text")
    // freqs: aa=3, bb=2, cc=1, dd=1 → cap 2 trains on {aa, bb} only
    val (m2, state2) = Bpe.learnMerges(docs, col("text"), 2, Some(2))
    assert(state2.map(_._1) === Seq("aa", "bb"))
    assert(m2.map(m => (m.lhs, m.rhs, m.pairCount)) ===
      Seq(("a", "a", 3L), ("b", "b", 2L)))
    // freq ties at the cut break by word order: cap 3 keeps cc, not dd
    val (_, state3) = Bpe.learnMerges(docs, col("text"), 0, Some(3))
    assert(state3.map(_._1) === Seq("aa", "bb", "cc"))
    // segmentation: capped words use their merges; OOV words count one
    // token of one distinct symbol (the whole word)
    val seg = Bpe.segmentStats(docs, col("text"), col("doc_id"), 2, Some(2))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(seg.toSeq === Seq((1L, 4L, 3L), (2L, 3L, 3L)),
      "doc1: aa aa bb cc → 4 tokens, syms {aa,bb,cc}; doc2: bb aa dd → 3, {bb,aa,dd}")
  }
}
