package graft

import org.apache.spark.sql.functions._
import graft.operators.Snapshot

class SnapshotSpec extends SparkSpec {

  test("snapshotDiff classifies added/removed/changed; drops unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
      .toDF("id", "s", "v")
    val nw = Seq((1L, "a", 10), (2L, "B", 20), (3L, "c", 31), (5L, "e", 50))
      .toDF("id", "s", "v")
    val got = Snapshot.snapshotDiff(old, nw, col("id"),
        Seq(col("s"), col("v")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set(
      (2L, "changed"), (3L, "changed"), (4L, "removed"), (5L, "added")))
  }

  test("content-column ORDER is part of row identity (documented hash order)") {
    import spark.implicits._
    val old = Seq((1L, "x", "y")).toDF("id", "a", "b")
    val nw = Seq((1L, "y", "x")).toDF("id", "a", "b")
    // swapped values under swapped column refs hash identically…
    val same = Snapshot.snapshotDiff(old, nw, col("id"),
      Seq(col("a"), col("b"))).count()
    assert(same === 1L, "(x,y) vs (y,x) must differ under the same order")
    // …but comparing old (a,b) against new (b,a) realigns them
    val realigned = Snapshot.snapshotDiff(
      old, nw.select(col("id"), col("b").as("a"), col("a").as("b")),
      col("id"), Seq(col("a"), col("b"))).count()
    assert(realigned === 0L)
  }

  test("profile: null counts, all-null columns, distinct, min/max") {
    import spark.implicits._
    val df = Seq(
        (1L, Some("b"), Some(10)), (2L, Some("a"), None),
        (3L, None, Some(10)), (4L, Some("a"), Some(30)))
      .toDF("id", "s", "v")
      .withColumn("dead", lit(null).cast("string"))
    val got = graft.operators.Profiling.profile(df, Seq("id", "s", "v", "dead"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), Option(r.getString(5)),
          r.getBoolean(6))).toMap
    assert(got("id") === ((4L, 0L, 4L, Some("1"), Some("4"), true)))
    assert(got("s") === ((4L, 1L, 2L, Some("a"), Some("b"), true)))
    assert(got("v") === ((4L, 1L, 2L, Some("10"), Some("30"), true)))
    // an all-null column: 0 distinct, no min/max, vacuously-true verdict
    assert(got("dead") === ((4L, 4L, 0L, None, None, true)))
  }
}
