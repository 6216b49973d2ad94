package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal
import graft.sources.Tables

class TemporalSpec extends SparkSpec {

  test("asof join: latest-at-or-before per key, ties match, no-match is null") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "p1"), // after r@50 and r@100 (tie) -> 100
      (1L, 99L, "p2"),  // after r@50 only -> 50
      (1L, 10L, "p3"),  // before all -> null
      (2L, 500L, "p4")  // key with no right rows -> null
    ).toDF("k", "t", "tag")
      .select(col("k"), timestamp_seconds(col("t")).as("ts"), col("tag"))
    val right = Seq(
      (1L, 50L, "a"), (1L, 100L, "b"), (3L, 1L, "c")
    ).toDF("k", "t", "r_tag")
      .select(col("k"), timestamp_seconds(col("t")).as("ts"), col("r_tag"))

    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("r_tag"))
      .select(col("tag"), col("ts_asof").cast("long"), col("r_tag_asof"))
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))).toMap

    assert(out("p1") === ((100L, "b")))
    assert(out("p2") === ((50L, "a")))
    assert(out("p3") === ((-1L, null)))
    assert(out("p4") === ((-1L, null)))

    // forward: earliest at-or-after — p1 ties r@100; p2's next is r@100;
    // p3's next is r@50; p4 still matchless
    val fwd = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts",
        Seq("r_tag"), direction = "forward")
      .select(col("tag"), col("ts_asof").cast("long"), col("r_tag_asof"))
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))).toMap
    assert(fwd("p1") === ((100L, "b")))
    assert(fwd("p2") === ((100L, "b")))
    assert(fwd("p3") === ((50L, "a")))
    assert(fwd("p4") === ((-1L, null)))

    // unknown direction fails by name
    val bad = intercept[IllegalArgumentException] {
      Temporal.asofJoin(left, right, Seq("k"), "ts", "ts",
        direction = "sideways")
    }
    assert(bad.getMessage.contains("direction"))
  }

  test("asof join ignores right rows with null ts or null key (SQL semantics)") {
    import spark.implicits._
    val left = Seq((1L, Some(100L)), (2L, Some(100L)))
      .toDF("k", "t")
      .select(col("k"), timestamp_seconds(col("t")).as("ts"))
    val right = Seq(
      (Some(1L), None, "null-ts"),          // null ts: can never match
      (None, Some(50L), "null-key"),        // null key: can never match
      (Some(1L), Some(40L), "real")
    ).toDF("k", "t", "r_tag")
      .select(col("k"), timestamp_seconds(col("t")).as("ts"), col("r_tag"))
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("r_tag"))
      .select(col("k"), col("r_tag_asof"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === Some("real"), "null-ts right row must not win the window")
    assert(out(2L) === None, "null-key right row must match nothing")
  }

  test("asof join on fixture matches the correlated-subquery semantics") {
    val ev = Tables(spark, sfDir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"))
    val got = Temporal.asofJoin(purchases, signups, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("ts_asof"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    // reference: per-purchase max signup ts at or before, via a plain join
    val want = purchases.as("p")
      .join(signups.as("s"),
        col("p.user_id") === col("s.user_id") && col("s.ts") <= col("p.ts"), "left")
      .groupBy(col("p.event_id"))
      .agg(max(col("s.ts")).as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    assert(got === want)
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }

  test("rangeJoinAdvised: three-verdict parity with the static rangeJoin, " +
    "verdicts match the operating points") {
    import spark.implicits._
    val pts = (0L until 500L).map(t => (t * 7L, s"p$t")).toDF("ts", "pid")
    // one hour-sized interval cluster on bucket 0 (the hot block) plus
    // sparse wide intervals — the q229 shape at fixture scale
    val ivs = ((1L to 40L).map(i => (i, 0L, 99L)) ++
      Seq((100L, 0L, 3490L), (101L, 3400L, 9999L))).toDF("wid", "f", "t")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("wid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val static = rows(graft.operators.Temporal.rangeJoin(
      pts, col("ts"), ivs, col("f"), col("t"), bucketWidth = 100L))
    // broadcast point: dimension-sized sides under the default threshold
    val (aB, dfB) = graft.operators.Temporal.rangeJoinAdvised(
      pts, col("ts"), ivs, col("f"), col("t"), bucketWidth = 100L)
    assert(aB.strategy === "broadcast")
    assert(rows(dfB) === static)
    // shuffle point: broadcast disallowed, skew test unreachable
    val (aSh, dfSh) = graft.operators.Temporal.rangeJoinAdvised(
      pts, col("ts"), ivs, col("f"), col("t"), bucketWidth = 100L,
      broadcastMaxRows = 0L, minSaltOutputRows = Long.MaxValue)
    assert(aSh.strategy === "shuffle")
    assert(rows(dfSh) === static)
    // salt point: the interval cluster's bucket 0 must be MG-named, the
    // executed result must STILL be identical (targeted hot/cold bucket
    // partition is exact by key disjointness)
    // (maxHotShare lifted: at fixture scale most bucket keys breach
    // the forced thresholds, so the replicated-side hot share is past
    // the default demotion ceiling — salt-execution parity is the
    // thing under test; the crossover itself is JoinAdvisorSpec's pin)
    val (aS, dfS) = graft.operators.Temporal.rangeJoinAdvised(
      pts, col("ts"), ivs, col("f"), col("t"), bucketWidth = 100L,
      broadcastMaxRows = 0L, skewFactor = 1.5, minSaltOutputRows = 1L,
      maxSaltBuckets = 8, targetPartitions = Some(2000000),
      maxHotShare = 1.0)
    assert(aS.strategy === "salt" && aS.hotKeys.contains("0"))
    assert(dfS.queryExecution.executedPlan.toString.contains("__sl"),
      "salted range join executes the salt key")
    assert(rows(dfS) === static)
    // the conf flag routes the PLAIN operator through the advisory
    spark.conf.set("spark.graft.advisor.rangeJoin", "true")
    try {
      assert(rows(graft.operators.Temporal.rangeJoin(
        pts, col("ts"), ivs, col("f"), col("t"), bucketWidth = 100L))
        === static)
    } finally spark.conf.unset("spark.graft.advisor.rangeJoin")
  }

  test("rangeJoin: exactly-once matches across bucket boundaries, vs brute force") {
    import spark.implicits._
    // points on a fine grid; intervals of wildly different lengths, some
    // spanning many buckets, one degenerate (from > to), boundary-inclusive
    val pts = (0L until 500L).map(t => (t * 7L, s"p$t")).toDF("ts", "pid")
    val ivs = Seq(
      (1L, 0L, 100L), (2L, 95L, 105L), (3L, 100L, 100L), // point interval
      (4L, 0L, 3490L),                                   // spans all buckets
      (5L, 200L, 100L),                                  // degenerate: drops
      (6L, 3400L, 9999L)                                 // tail overhang
    ).toDF("wid", "f", "t")
    val got = graft.operators.Temporal.rangeJoin(
        pts, col("ts"), ivs, col("f"), col("t"), bucketWidth = 100L)
      .select(col("wid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val want = (for {
      (ts, pid) <- (0L until 500L).map(t => (t * 7L, s"p$t"))
      (wid, f, t) <- Seq((1L, 0L, 100L), (2L, 95L, 105L), (3L, 100L, 100L),
        (4L, 0L, 3490L), (5L, 200L, 100L), (6L, 3400L, 9999L))
      if f <= t && ts >= f && ts <= t
    } yield (wid, pid)).sorted
    assert(got === want)
    // a duplicate match anywhere would break the === (exactly-once claim)

    // reserved working names are rejected, not silently overwritten
    val clash = intercept[IllegalArgumentException] {
      graft.operators.Temporal.rangeJoin(
        pts.withColumnRenamed("pid", "__ts"), col("ts"),
        ivs, col("f"), col("t"), bucketWidth = 100L)
    }
    assert(clash.getMessage.contains("__ts"))

    // bucketing is exact beyond 2^53 (integer division, not double floor):
    // a boundary pair up at ~2^60 must still match
    val bigT = (1L << 60) + 12345L
    val bigPts = Seq((bigT, "bp")).toDF("ts", "pid")
    val bigIvs = Seq((1L, bigT, bigT)).toDF("wid", "f", "t")
    val bigGot = graft.operators.Temporal.rangeJoin(
        bigPts, col("ts"), bigIvs, col("f"), col("t"), bucketWidth = 7L)
      .count()
    assert(bigGot === 1L, "2^60-scale boundary match must survive bucketing")

    // span guard: an open-ended sentinel interval fails EXPLICITLY,
    // naming the parameter — not an opaque ~2^50-element array
    // allocation inside sequence()
    val sentinel = Seq((9L, 0L, Long.MaxValue - 1)).toDF("wid", "f", "t")
    val wide = intercept[Exception] {
      graft.operators.Temporal.rangeJoin(
        pts, col("ts"), sentinel, col("f"), col("t"), bucketWidth = 100L)
        .count()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(wide).exists(_.contains("maxBucketsPerInterval")),
      s"wide-interval failure must name the parameter: ${msgs(wide).take(2)}")

    // ...and a wide interval passes when the caller raises the cap
    val wideOk = graft.operators.Temporal.rangeJoin(
      pts, col("ts"), Seq((9L, 0L, 40_000_000L)).toDF("wid", "f", "t"),
      col("f"), col("t"), bucketWidth = 100L,
      maxBucketsPerInterval = 1_000_000L).count()
    assert(wideOk === 500L)

    // boundary: the cap counts BUCKETS, not span — an interval covering
    // exactly maxBucketsPerInterval buckets passes, one more fails
    val atCap = graft.operators.Temporal.rangeJoin(
      pts, col("ts"), Seq((9L, 0L, 900L)).toDF("wid", "f", "t"),
      col("f"), col("t"), bucketWidth = 100L,
      maxBucketsPerInterval = 10L).count()   // buckets 0..9 = exactly 10
    assert(atCap > 0L, "interval covering exactly the cap must pass")
    val overCap = intercept[Exception] {
      graft.operators.Temporal.rangeJoin(
        pts, col("ts"), Seq((9L, 0L, 1000L)).toDF("wid", "f", "t"),
        col("f"), col("t"), bucketWidth = 100L,
        maxBucketsPerInterval = 10L).count() // buckets 0..10 = 11
    }
    assert(msgs(overCap).exists(_.contains("maxBucketsPerInterval")))

    // NULL bounds behave like the plain join (row silently dropped, no
    // raise) — even though Catalyst collapses the from<=to filter and
    // the guard into one And that evaluates the guard on a NULL left leg
    val nulls = Seq(
      (1L, java.lang.Long.valueOf(0L), java.lang.Long.valueOf(100L)),
      (7L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(50L)),
      (8L, java.lang.Long.valueOf(10L), null.asInstanceOf[java.lang.Long]))
      .toDF("wid", "f", "t")
    val gotNulls = graft.operators.Temporal.rangeJoin(
        pts, col("ts"), nulls, col("f"), col("t"), bucketWidth = 100L)
      .select(col("wid")).distinct().collect().map(_.getLong(0)).toSet
    assert(gotNulls === Set(1L),
      "NULL-bound intervals must drop exactly like the plain join")
  }

  test("intervalOverlapJoin: exactly-once vs brute force, guards hold") {
    import spark.implicits._
    // spans of wildly different lengths so pairs share MANY buckets (the
    // ownership rule must still count each pair once), touching cases
    // (lt == rf), degenerate (from > to, dropped), disjoint
    val as = Seq(
      (1L, 0L, 100L), (2L, 950L, 1050L), (3L, 0L, 5000L),
      (4L, 700L, 600L),          // degenerate: drops
      (5L, 4999L, 4999L))        // point interval
      .toDF("aid", "af", "at")
    val bs = Seq(
      (10L, 50L, 60L), (11L, 100L, 100L),   // touches a1 at the boundary
      (12L, 0L, 9999L),                      // covers everything
      (13L, 5001L, 6000L),                   // disjoint from a3/a5
      (14L, 2000L, 1000L))                   // degenerate: drops
      .toDF("bid", "bf", "bt")
    val got = graft.operators.Temporal.intervalOverlapJoin(
        as, col("af"), col("at"), bs, col("bf"), col("bt"),
        bucketWidth = 100L)
      .select(col("aid"), col("bid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = (for {
      (aid, af, at) <- Seq((1L, 0L, 100L), (2L, 950L, 1050L),
        (3L, 0L, 5000L), (4L, 700L, 600L), (5L, 4999L, 4999L))
      (bid, bf, bt) <- Seq((10L, 50L, 60L), (11L, 100L, 100L),
        (12L, 0L, 9999L), (13L, 5001L, 6000L), (14L, 2000L, 1000L))
      if af <= at && bf <= bt && af <= bt && bf <= at
    } yield (aid, bid)).sorted
    assert(got === want)
    // duplicates anywhere would break === (the exactly-once claim)

    // sentinel interval fails by name, not by array allocation
    val wide = intercept[Exception] {
      graft.operators.Temporal.intervalOverlapJoin(
        as, col("af"), col("at"),
        Seq((9L, 0L, Long.MaxValue - 1)).toDF("bid", "bf", "bt"),
        col("bf"), col("bt"), bucketWidth = 100L).count()
    }
    def ms(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ ms(x.getCause)
    assert(ms(wide).exists(_.contains("maxBucketsPerInterval")))

    // NULL bounds drop like the plain join, never raise
    val nulls = Seq(
      (20L, java.lang.Long.valueOf(0L), java.lang.Long.valueOf(100L)),
      (21L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(50L)))
      .toDF("bid", "bf", "bt")
    val gotN = graft.operators.Temporal.intervalOverlapJoin(
        as, col("af"), col("at"), nulls, col("bf"), col("bt"),
        bucketWidth = 100L)
      .select(col("bid")).distinct().collect().map(_.getLong(0)).toSet
    assert(gotN === Set(20L))
  }

  test("deriveBucketWidth: median span, cap floor dominates heavy tails, " +
    "derived width always clears the guard it pairs with") {
    import spark.implicits._
    // uniform spans: width = the span (the hand-pick a careful operator
    // makes); derivation replaces trust with data
    val uniform = (1 to 50).map(i => (i.toLong, i * 1000L, i * 1000L + 3600L))
      .toDF("id", "f", "t")
    assert(Temporal.deriveBucketWidth(uniform, col("f"), col("t")) === 3600L)

    // heavy tail + tight cap: the floor term must lift the width so the
    // widest interval clears the STRICT span guard
    val tailed = ((1 to 40).map(i => (i.toLong, 0L, 10L)) :+ (99L, 0L, 1000L))
      .toDF("id", "f", "t")
    val w = Temporal.deriveBucketWidth(tailed, col("f"), col("t"),
      maxBucketsPerInterval = 5L)
    assert(w >= 1000L / 3 + 1, s"cap floor must dominate the 10s median: $w")
    // the pairing holds end-to-end: rangeJoin with (w, cap) must not raise
    // and must match the brute-force inequality join
    val pts = (0L to 1000L by 50L).map(ts => (ts, s"p$ts")).toDF("ts", "pid")
    val got = Temporal.rangeJoin(pts, col("ts"), tailed, col("f"), col("t"),
      bucketWidth = w, maxBucketsPerInterval = 5L).count()
    val brute = pts.join(tailed,
      col("ts") >= col("f") && col("ts") <= col("t")).count()
    assert(got === brute)

    // degenerate spans excluded; empty side defaults to 1
    val junk = Seq[(Long, java.lang.Long, java.lang.Long)](
      (1L, 10L, 5L), (2L, null, 5L)).toDF("id", "f", "t")
    assert(Temporal.deriveBucketWidth(
      junk, col("f").cast("long"), col("t").cast("long")) === 1L)

    // two-sided derivation covers both exploding sides
    val a = (1 to 30).map(i => (i.toLong, 0L, 100L)).toDF("aid", "af", "at")
    val b = (1 to 5).map(i => (i.toLong, 0L, 900L)).toDF("bid", "bf", "bt")
    val w2 = Temporal.deriveBucketWidth2(
      a, col("af"), col("at"), b, col("bf"), col("bt"))
    assert(w2 === 100L, s"median of the pooled spans: $w2")
  }

  test("gapFillInterpolate: hand-computed fills, edges observed, multi-key") {
    import spark.implicits._
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    // key A: hours 0,1 observed, 2-3 gap, 4 observed (two values in h0 →
    // mean); key B: single observation (degenerate span, no gaps)
    val df = Seq(
      ("A", ts(0), 10.0), ("A", ts(0), 20.0), ("A", ts(1), 30.0),
      ("A", ts(4), 90.0),
      ("B", ts(7), 5.5)
    ).toDF("k", "t", "v")
    val got = graft.operators.Temporal.gapFillInterpolate(
        df, col("k"), col("t"), col("v"))
      .select(col("key"), date_format(col("bucket_ts"), "HH").as("h"),
        col("v_filled"), col("interpolated"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getBoolean(3))).sortBy(x => (x._1, x._2)).toSeq
    assert(got === Seq(
      ("A", "00", 15.0, false), // mean of 10,20
      ("A", "01", 30.0, false),
      ("A", "02", 50.0, true),  // 30 + (90-30)*(1/3)
      ("A", "03", 70.0, true),  // 30 + (90-30)*(2/3)
      ("A", "04", 90.0, false),
      ("B", "07", 5.5, false)))
  }
}
