package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the release report a pipeline publishes
  * next to a corpus version (and diffs across versions with
  * [[Snapshot.snapshotDiff]]'s sibling discipline): per column, row/null
  * counts, distinct cardinality, min/max, and a verdict that the
  * engine's HLL sketch agrees with the exact count.
  *
  * Scale shape: TWO aggregation passes — one streaming pass computes
  * null counts, min/max, and approx_count_distinct for every column
  * (all map-side-combining), one Expand pass computes the exact
  * distincts that grade the sketches (see the in-body note on why they
  * must not share an agg). The output is column-count-sized, so the
  * driver-side row assembly is model-sized by construction. At 100 TB a
  * deployment drops the exact pass and keeps the sketch the verdict has
  * been green against (the q40 device).
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
    // TWO aggregation jobs, not one: mixing multi-column countDistinct
    // (which plans an Expand) with the streaming aggregates in a single
    // agg knocks the whole aggregate off the fast path — measured 6.0 s
    // combined vs 0.75 s + 0.6 s split on the sf0.1 fixture. The
    // streaming pass carries everything else.
    val exactAggs = cols.map(c => countDistinct(col(c)).as(s"dist__$c"))
    val streamAggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls__$c"),
        approx_count_distinct(col(c)).as(s"approx__$c"),
        min(col(c)).cast("string").as(s"min__$c"),
        max(col(c)).cast("string").as(s"max__$c"))
    }
    val de = df.agg(exactAggs.head, exactAggs.tail: _*).collect()(0)
    val r = df.agg(streamAggs.head, streamAggs.tail: _*).collect()(0)
    val n = r.getAs[Long]("__n")
    val rows = cols.map { c =>
      val d = de.getAs[Long](s"dist__$c")
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
