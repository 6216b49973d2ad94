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
