package graft

import org.apache.spark.sql.functions._
import graft.plans.HeavyHitters
import graft.sources.Tables

/** The Misra-Gries heavy-hitters aggregate, pinned in both regimes:
  * exact (capacity ≥ distinct items — the registered q111 contract) and
  * lossy (the N/(capacity+1) underestimate bound and the no-false-
  * negative guarantee for items above it). */
class HeavyHittersSpec extends SparkSpec {

  private def summarize(df: org.apache.spark.sql.DataFrame, cap: Int): Map[String, Long] =
    df.agg(HeavyHitters.misraGries(col("item"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact regime: counts equal groupBy counts, independent of partitioning") {
    val items = Tables(spark, sfDir).documents
      .select(explode(split(trim(col("text")), "\\s+")).as("item"))
    val truth = items.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(truth.size <= 2048, "fixture vocabulary outgrew the exact-regime premise")
    val one = summarize(items.repartition(1), 2048)
    val many = summarize(items.repartition(13), 2048)
    assert(one === truth)
    // merge order cannot matter when no decrement ever fires
    assert(many === truth)
  }

  test("lossy regime: underestimates bounded by N/(k+1); big items never lost") {
    import spark.implicits._
    // 60x a, 30x b, 10x c, 20 singletons -> N = 120, k = 3 -> bound 30
    val stream =
      Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c") ++
        (0 until 20).map(i => s"s$i")
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = stream.size
    val cap = 3
    val bound = n / (cap + 1)
    val got = summarize(stream.toDF("item").repartition(1), cap)
    assert(got.size <= cap)
    for ((item, est) <- got) {
      val t = truth(item)
      assert(est <= t, s"$item overestimated: $est > $t")
      assert(est >= t - bound, s"$item below the N/(k+1) bound: $est < ${t - bound}")
    }
    // every item with true frequency > N/(k+1) must be present
    for ((item, t) <- truth if t > bound)
      assert(got.contains(item), s"heavy item $item (freq $t > $bound) missing")
  }

  test("merge over-capacity subtracts the (k+1)-th largest and keeps bounds") {
    import spark.implicits._
    // two partitions with disjoint heavy sets force a merge overflow
    val part0 = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(5)("x")
    val part1 = Seq.fill(40)("c") ++ Seq.fill(25)("d") ++ Seq.fill(5)("y")
    val stream = part0 ++ part1
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = stream.size
    val cap = 3
    val bound = n / (cap + 1) // 35
    val df = (part0.map(("p0", _)) ++ part1.map(("p1", _)))
      .toDF("p", "item").repartition(2, col("p"))
    val got = summarize(df, cap)
    assert(got.size <= cap)
    for ((item, est) <- got) {
      assert(est <= truth(item))
      assert(est >= truth(item) - bound)
    }
    for ((item, t) <- truth if t > bound)
      assert(got.contains(item), s"heavy item $item (freq $t > $bound) missing after merge")
  }
}
