package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Dedup
import graft.functions.TextFunctions._

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir).documents.cache()

  /** Brute-force ground truth: all pairs with word-set jaccard >= t. */
  private def bruteForcePairs(t: Double): Set[(Long, Long)] = {
    val sets = docs.select(col("doc_id"),
      array_distinct(tokens(col("text"))).as("words"))
    val a = sets.select(col("doc_id").as("id_a"), col("words").as("words_a"))
    val b = sets.select(col("doc_id").as("id_b"), col("words").as("words_b"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(round(jaccard(col("words_a"), col("words_b")), 4) >= t)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("exact dedup groups conserve rows") {
    val groups = Dedup.exactDupGroups(docs, col("text"), col("doc_id"))
    val total = groups.agg(sum(col("n"))).head().getLong(0)
    assert(total === docs.count())
  }

  test("minhash LSH pairs: perfect precision, high recall vs brute force") {
    val truth = bruteForcePairs(0.95)
    val got = Dedup.minhashNearDupPairs(docs, col("text"), col("doc_id"),
        numHashes = 64, bands = 4, threshold = 0.95)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth), "verify step must kill every false candidate")
    assert(truth.nonEmpty, "fixture should contain near-dups")
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.7, s"LSH recall $recall too low (${got.size}/${truth.size})")
  }

  test("simhash: identical texts collide at hamming 0, pairs are plausible") {
    val sig = docs.select(simhash64(col("text")).as("s"), col("doc_id"))
    val s0 = sig.filter(col("doc_id") === 0).head().getLong(0)
    assert(s0 === sig.filter(col("doc_id") === 0).head().getLong(0)) // deterministic
    val pairs = Dedup.simhashNearDupPairs(docs, col("text"), col("doc_id"), maxHamming = 6)
    val rows = pairs.collect()
    assert(rows.forall(r => r.getInt(2) <= 6))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("ngram jaccard for explicit pairs matches jaccard() on shingles") {
    val pairs = spark.createDataFrame(Seq((0L, 1L), (1L, 2L))).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccardForPairs(docs, pairs, col("text"), col("doc_id"), 3)
    assert(out.count() === 2)
    assert(out.collect().forall { r =>
      val j = r.getDouble(2); j >= 0.0 && j <= 1.0
    })
  }
}
