package graft

import org.apache.spark.sql.functions._
import graft.operators.Metrics

class MetricsSpec extends SparkSpec {

  // scores with a tie straddling the classes: pos {0.9, 0.7, 0.5},
  // neg {0.7, 0.3}. Pairs: (0.9 beats both) + (0.7 ties 0.7 = half,
  // beats 0.3) + (0.5 loses to 0.7, beats 0.3) → U = 2 + 1.5 + 1 = 4.5
  // of 6 → AUC = 0.75, u2 = 9.
  private def tiny = {
    import spark.implicits._
    Seq((0.9, true), (0.7, true), (0.5, true), (0.7, false), (0.3, false))
      .toDF("score", "y")
  }

  test("binaryAuc: hand-computed value with cross-class tie; u2 exact") {
    val r = Metrics.binaryAuc(tiny, col("score"), col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 9L)))
    assert(r.getDouble(3) === 0.75)
  }

  test("retrievalEval: hand-computed recall@k and reciprocal rank") {
    import spark.implicits._
    // truth top-3 for q1: (11, 12, 13); retrieved finds 12 first (the
    // true NN 11 at rank 2) and misses 13 → n_hits=2, recall=2/3, rr=1/2.
    // q2's retrieval misses the true NN entirely → rr=0; q3 has truth
    // rows but no retrieved rows at all → zero row still emitted.
    val truth = Seq(
      (1L, 11L, 0.9), (1L, 12L, 0.8), (1L, 13L, 0.7),
      (2L, 21L, 0.9), (2L, 22L, 0.8), (2L, 23L, 0.7),
      (3L, 31L, 0.9)).toDF("q_id", "vec_id", "cos_sim")
    val retrieved = Seq(
      (1L, 12L, 0.95), (1L, 11L, 0.85), (1L, 99L, 0.75),
      (2L, 22L, 0.9), (2L, 23L, 0.8), (2L, 98L, 0.7))
      .toDF("q_id", "vec_id", "cos_sim")
    val rows = Metrics.retrievalEval(retrieved, truth, k = 3)
      .orderBy(col("q_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      (1L, 2L, 2.0 / 3, 0.5),
      (2L, 2L, 2.0 / 3, 0.0),
      (3L, 0L, 0.0, 0.0)))
  }

  test("binaryAuc: single-class input raises instead of silent NULL auc") {
    import spark.implicits._
    val onlyPos = Seq((0.9, true), (0.5, true)).toDF("score", "y")
    val e = intercept[Exception] {
      Metrics.binaryAuc(onlyPos, col("score"), col("y")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("binaryAuc needs both classes")),
      s"unexpected error: $e")
  }

  test("prCurve: hand-computed tp/fp/precision/recall at every threshold") {
    val rows = Metrics.prCurve(tiny, col("score"), col("y")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.toSeq === Seq(
      (0.9, 1L, 0L, 2L, 1.0, round6(1.0 / 3)),
      (0.7, 2L, 1L, 1L, round6(2.0 / 3), round6(2.0 / 3)),
      (0.5, 3L, 1L, 0L, 0.75, 1.0),
      (0.3, 3L, 2L, 0L, 0.6, 1.0)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bucketing is invisible: buckets=1 equals buckets=32 on real scores") {
    // the scale device (quantile-cut buckets + literal offsets) must be a
    // pure implementation detail — any bucket count gives identical rows
    val docs = graft.sources.Tables(spark, sfDir).documents
    val scored = docs.select(col("doc_id"),
        (col("n_chars") % 97).cast("double").as("score"),
        (col("lang") === "en").as("y"))
    val a = Metrics.binaryAuc(scored, col("score"), col("y"), buckets = 1)
      .collect()(0).toSeq
    val b = Metrics.binaryAuc(scored, col("score"), col("y"), buckets = 32)
      .collect()(0).toSeq
    assert(a === b)
    val pa = Metrics.prCurve(scored, col("score"), col("y"), buckets = 1)
      .collect().map(_.toSeq).toSeq
    val pb = Metrics.prCurve(scored, col("score"), col("y"), buckets = 32)
      .collect().map(_.toSeq).toSeq
    assert(pa === pb)
  }

  test("null scores and null labels are excluded, not miscounted") {
    import spark.implicits._
    val df = Seq(
        (Some(0.9), Some(true)), (Some(0.1), Some(false)),
        (None, Some(true)), (Some(0.5), None))
      .toDF("score", "y")
    val r = Metrics.binaryAuc(df, col("score"), col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((1L, 1L)))
    assert(r.getDouble(3) === 1.0)
  }

  test("no SinglePartition exchange in the cumulative-count plan") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val scored = docs.select(col("doc_id"),
      (col("n_chars") % 97).cast("double").as("score"),
      (col("lang") === "en").as("y"))
    val p = Metrics.prCurve(scored, col("score"), col("y"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"cum counts must never serialize onto one partition:\n${p.take(1200)}")
  }
}
