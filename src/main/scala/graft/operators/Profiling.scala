package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the release report a pipeline publishes
  * next to a corpus version (and diffs across versions with
  * [[Snapshot.snapshotDiff]]'s sibling discipline): per column, row/null
  * counts, distinct cardinality, min/max, and a verdict that the
  * engine's HLL sketch agrees with the exact count.
  *
  * Scale shape: ONE aggregation pass over the table computes every
  * metric for every requested column (null counts, min/max, and
  * approx_count_distinct are all map-side-combining); the output is
  * column-count-sized, so the driver-side row assembly is model-sized by
  * construction. The exact `countDistinct` alongside the sketch plans as
  * Spark's expand (one extra shuffle per distinct column) — affordable
  * at audit scale, and exactly what grades the sketch: at 100 TB a
  * deployment drops the exact column and keeps the sketch the verdict
  * has been green against (the q40 device).
  */
object Profiling {

  /** Long-format profile: (column, n_rows, n_nulls, n_distinct,
    * min_value, max_value, approx_ok). min/max are rendered as strings
    * so one frame carries every column type; `approx_ok` pins
    * |approx − exact| ≤ relTol·exact (vacuously true on an all-null
    * column). */
  def profile(
      df: DataFrame, cols: Seq[String], relTol: Double = 0.15): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls__$c"),
        countDistinct(col(c)).as(s"dist__$c"),
        approx_count_distinct(col(c)).as(s"approx__$c"),
        min(col(c)).cast("string").as(s"min__$c"),
        max(col(c)).cast("string").as(s"max__$c"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getAs[Long]("__n")
    val rows = cols.map { c =>
      val d = r.getAs[Long](s"dist__$c")
      val a = r.getAs[Long](s"approx__$c")
      (c, n, r.getAs[Long](s"nulls__$c"), d,
        r.getAs[String](s"min__$c"), r.getAs[String](s"max__$c"),
        d == 0L || math.abs(a - d).toDouble / d <= relTol)
    }
    df.sparkSession.createDataFrame(rows).toDF(
      "column", "n_rows", "n_nulls", "n_distinct",
      "min_value", "max_value", "approx_ok")
  }
}
