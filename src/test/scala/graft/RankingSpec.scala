package graft

import org.apache.spark.sql.functions._
import graft.operators.Ranking

class RankingSpec extends SparkSpec {

  private val docs = Seq(
    (1L, "apple banana apple"),     // tf(apple)=2, dl=3
    (2L, "apple cherry"),           // tf(apple)=1, dl=2
    (3L, "banana cherry cherry"),   // no apple
    (4L, "durian")                  // rare term
  )

  private def scores(qs: Seq[(Long, Seq[String])]): Map[(Long, Long), Double] = {
    import spark.implicits._
    Ranking.bm25Scores(docs.toDF("id", "text"), col("id"), col("text"), qs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
  }

  /** The exact formula, driver-side. */
  private def bm25(tf: Double, df: Double, dl: Double,
      n: Double, avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
      (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))

  test("single-term query reproduces the closed formula; non-matching docs absent") {
    val got = scores(Seq(1L -> Seq("apple")))
    // N=4 docs, avgdl = (3+2+3+1)/4 = 2.25, df(apple)=2
    assert(got.keySet === Set(1L -> 1L, 1L -> 2L))
    assert(math.abs(got(1L -> 1L) - bm25(2, 2, 3, 4, 2.25)) < 1e-12)
    assert(math.abs(got(1L -> 2L) - bm25(1, 2, 2, 4, 2.25)) < 1e-12)
  }

  test("rare terms outscore common terms at equal tf (idf ordering)") {
    val got = scores(Seq(1L -> Seq("durian"), 2L -> Seq("cherry")))
    // durian: df=1, in doc 4 (dl=1). cherry: df=2, best doc 3 (tf=2).
    val durian = got(1L -> 4L)
    val cherryIn2 = got(2L -> 2L) // tf=1 like durian
    assert(durian > cherryIn2)
  }

  test("matching both query terms beats matching one (same doc lengths)") {
    import spark.implicits._
    val d = Seq((1L, "apple banana"), (2L, "apple cherry"), (3L, "kiwi mango"))
      .toDF("id", "text")
    val got = Ranking.bm25Scores(d, col("id"), col("text"),
        Seq(1L -> Seq("apple", "banana")))
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(got(1L) > got(2L))
    assert(!got.contains(3L))
  }

  test("tokenization is lowercased and whitespace-robust") {
    import spark.implicits._
    val d = Seq((1L, "  Apple\tAPPLE  "), (2L, "apple")).toDF("id", "text")
    val got = Ranking.bm25Scores(d, col("id"), col("text"),
        Seq(1L -> Seq("apple")))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // doc 1: n_terms=1 distinct match with tf_sum=2; doc 2: tf_sum=1
    assert(got === Set((1L, 1L, 2L), (2L, 1L, 1L)))
  }
}
