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
}
