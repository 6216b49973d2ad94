package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import graft.plans.CountMin
import graft.sources.Tables

/** The Count-Min sketch aggregate: structural invariants (each row's
  * counters sum to N; merge = elementwise sum so partitioning can't
  * matter), the one-sided estimate contract (est ≥ true count, always),
  * the update↔estimate bucket-rule parity (the aggregate's Scala chain
  * vs the stock `pmod(xxhash64(item, j), width)` columns), and the
  * error bound at the registered 4×512 geometry. */
class CountMinSpec extends SparkSpec {

  private val depth = 4
  private val width = 512

  private def whStream = graft.operators.Dedup.signatureTable(
      Tables(spark, sfDir).documents, col("text"), col("doc_id"),
      numHashes = 64, bands = 4)
    .filter(col("kind") === "wh")
    .select(col("value"))

  private def cellsOf(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
    df.agg(CountMin.sketch(col("value"), depth, width).as("cells"))
      .select(explode(col("cells")).as("e"))
      .collect()
      .map(r => {
        val e = r.getStruct(0)
        ((e.getInt(0), e.getInt(1)), e.getLong(2))
      }).toMap

  test("each row's counters sum to the stream length; merge is partitioning-independent") {
    val wh = whStream.cache()
    try {
      val n = wh.count()
      val one = cellsOf(wh.repartition(1))
      val many = cellsOf(wh.repartition(32))
      assert(one === many, "CMS must be merge-order-independent (elementwise sum)")
      (0 until depth).foreach { j =>
        val rowSum = one.collect { case ((r, _), c) if r == j => c }.sum
        assert(rowSum === n, s"row $j counters must sum to the stream length")
      }
    } finally wh.unpersist()
  }

  test("estimates never undercount, and bound error at the sketch geometry") {
    val wh = whStream.cache()
    try {
      val n = wh.count()
      val cells = cellsOf(wh)
      val truth = wh.groupBy("value").agg(count(lit(1)).as("df"))
      val est = truth
        .withColumn("est", CountMin.estimate(col("value"), cells, depth, width))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      est.foreach { case (v, df, e) =>
        assert(e >= df, s"CMS undercounted $v: est $e < true $df")
      }
      // Markov bound per row: P(err > 2N/width) < 1/2, so over depth
      // independent rows P(all rows err > 2N/width) < 2^-depth per item.
      // Assert the 99th-percentile error stays within 4N/width — loose
      // enough for hash luck, tight enough to catch a broken bucket rule.
      val errs = est.map { case (_, df, e) => e - df }.sorted
      val p99 = errs(math.min(errs.length - 1, (errs.length * 99) / 100))
      assert(p99 <= 4L * n / width,
        s"p99 CMS error $p99 exceeds 4N/width = ${4L * n / width}")
    } finally wh.unpersist()
  }

  test("update-rule buckets == the stock pmod(xxhash64(item, j), width) columns") {
    // the aggregate's Scala chain (XxHash64Function, j as the second
    // lane) must match the Column chain estimate() addresses with —
    // otherwise estimates silently read the wrong counters
    val items = Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue,
      42L, 0x9E3779B97F4A7C15L)
    import spark.implicits._
    val viaColumns = items.toDF("value")
      .select(col("value") +: (0 until depth).map(j =>
        pmod(xxhash64(col("value"), lit(j.toLong)), lit(width.toLong)).as(s"b$j")): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to depth).map(r.getLong).toSeq).toMap
    items.foreach { v =>
      val seed = XxHash64Function.hash(v, LongType, 42L)
      val viaUpdate = (0 until depth).map(j => java.lang.Math.floorMod(
        XxHash64Function.hash(j.toLong, LongType, seed), width.toLong))
      assert(viaUpdate === viaColumns(v), s"bucket chain diverged for item $v")
    }
  }

  test("hand-built stream: exact counts when no collisions, nulls skipped") {
    import spark.implicits._
    // three distinct keys with multiplicities 3/2/1 + nulls
    val rows = Seq(Some(10L), Some(10L), Some(10L), Some(20L), Some(20L),
      Some(30L), None, None).toDF("value")
    val cells = cellsOf(rows)
    val total = cells.collect { case ((r, _), c) if r == 0 => c }.sum
    assert(total === 6L, "null inputs must not be counted")
    val est = Seq(10L, 20L, 30L).toDF("value")
      .withColumn("est", CountMin.estimate(col("value"), cells, depth, width))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est(10L) >= 3L && est(20L) >= 2L && est(30L) >= 1L)
    // with 3 keys in 512 buckets a collision in ALL 4 rows is
    // (3/512)^4-unlikely; the min over rows recovers exact counts
    assert(est === Map(10L -> 3L, 20L -> 2L, 30L -> 1L))
  }
}
