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

  test("paretoFrontier: dominance vs brute force, ties kept, nulls " +
    "dropped, within-x dominance") {
    import spark.implicits._
    import graft.operators.Profiling
    // minimize x, maximize y. Hand-set: (1,5) frontier; (2,5) dominated
    // by (1,5) (same y, larger x); (2,7) frontier; (3,7) dominated;
    // (3,9) frontier; (3,2) dominated within its x group; duplicate
    // (3,9) kept (equal points don't dominate each other)
    val df = Seq((1.0, 5, "a"), (2.0, 5, "b"), (2.0, 7, "c"),
      (3.0, 7, "d"), (3.0, 9, "e"), (3.0, 2, "f"), (3.0, 9, "g"))
      .toDF("x", "y", "id")
    val got = Profiling.paretoFrontier(df, col("x"), col("y"))
      .select("id").as[String].collect().sorted.toSeq
    assert(got === Seq("a", "c", "e", "g"))
    // brute-force dominance agrees on a bigger deterministic frame
    val big = (1 to 200)
      .map(i => ((i * 37 % 97).toDouble, (i * 53) % 89, s"r$i"))
      .toDF("x", "y", "id")
    val rows = big.collect().map(r =>
      (r.getDouble(0), r.getInt(1), r.getString(2)))
    val brute = rows.filter { case (x, y, _) =>
      !rows.exists { case (x2, y2, _) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y) }
    }.map(_._3).sorted.toSeq
    val fast = Profiling.paretoFrontier(big, col("x"), col("y"))
      .select("id").as[String].collect().sorted.toSeq
    assert(fast === brute)
    // null coordinates are dropped, not frontier'd
    val withNulls = df.unionByName(
      Seq((null.asInstanceOf[java.lang.Double], 99, "n")).toDF("x", "y", "id")
        .select(col("x").cast("double"), col("y").cast("int"), col("id")))
    assert(!Profiling.paretoFrontier(withNulls, col("x"), col("y"))
      .select("id").as[String].collect().contains("n"))
  }

  test("scd2History: run collapse, half-open tiling, null states, " +
    "tie-broken total order") {
    import spark.implicits._
    import graft.operators.Snapshot
    val log = Seq(
      ("A", "x", 1L, 1L), ("A", "x", 2L, 2L),   // duplicate state: collapse
      ("A", "y", 3L, 3L), ("A", "y", 4L, 4L),
      ("A", "x", 5L, 5L),                       // state can recur
      ("B", "z", 10L, 6L)).toDF("k", "st", "t", "id")
    val got = Snapshot.scd2History(log, col("k"), col("st"), col("t"),
        Seq(col("id")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4),
        r.getBoolean(5))).toSet
    assert(got === Set(
      ("A", "x", 1L, 3L, 1, false),
      ("A", "y", 3L, 5L, 2, false),
      ("A", "x", 5L, -1L, 3, true),
      ("B", "z", 10L, -1L, 1, true)))

    // null states are states (null-safe change test): x, null, null, x
    val nl = Seq(("A", Some("x"), 1L, 1L), ("A", None, 2L, 2L),
      ("A", None, 3L, 3L), ("A", Some("x"), 4L, 4L))
      .toDF("k", "st", "t", "id")
    val gotN = Snapshot.scd2History(nl, col("k"), col("st"), col("t"),
        Seq(col("id")))
      .collect().map(r => (Option(r.getString(1)), r.getLong(2),
        r.getInt(4))).toSet
    assert(gotN === Set((Some("x"), 1L, 1), (None, 2L, 2), (Some("x"), 4L, 3)))

    // equal-ts changes: the tie column decides which opens first
    val tie = Seq(("A", "p", 1L, 2L), ("A", "q", 1L, 1L))
      .toDF("k", "st", "t", "id")
    val gotT = Snapshot.scd2History(tie, col("k"), col("st"), col("t"),
        Seq(col("id")))
      .collect().map(r => (r.getString(1), r.getInt(4))).toSet
    assert(gotT === Set(("q", 1), ("p", 2)))
  }

  test("applyCdc: last-writer-wins, delete+update overlap, unknown op raises") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "s")
    // id 2: update; id 3: delete; id 4: delete seq1 THEN update seq2
    // (update wins); id 4 also shows out-of-order arrival (seq2 listed
    // first); id 5: insert; id 1: untouched
    val ch = Seq(
      (4L, 2L, "U", "d2"),
      (2L, 1L, "U", "b2"),
      (3L, 1L, "D", null.asInstanceOf[String]),
      (4L, 1L, "D", null.asInstanceOf[String]),
      (5L, 1L, "U", "e")
    ).toDF("id", "seq", "op", "s")
    val got = Snapshot.applyCdc(base, ch, "id", "seq", "op", Seq("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a", 2L -> "b2", 4L -> "d2", 5L -> "e"))

    // a bad op fails loudly instead of silently dropping the write
    val bad = Seq((1L, 1L, "X", "boom")).toDF("id", "seq", "op", "s")
    val e = intercept[Exception] {
      Snapshot.applyCdc(base, bad, "id", "seq", "op", Seq("s")).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("applyCdc")), msgs(e).take(2))
  }
}
