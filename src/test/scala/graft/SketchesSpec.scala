package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Ground-truth pins for the relational HLL sketch (q126/q127). */
class SketchesSpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def longs(xs: Seq[java.lang.Long]) = spark.createDataFrame(
    spark.sparkContext.parallelize(xs.map(Row(_)), 4),
    StructType(Seq(StructField("v", LongType, nullable = true))))

  test("register table: full 2^p rows, rho consistent with the hash bits") {
    val df = longs((1L to 100L).map(java.lang.Long.valueOf))
    val reg = Sketches.hllRegisters(df, col("v"), p = 4).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(reg.length === 16, "one row per register, touched or not")
    assert(reg.map(_._1).sorted.toSeq === (0 until 16))
    // re-derive each register from the raw hashes
    val expected = df.select(xxhash64(col("v")).as("h")).collect()
      .map(_.getLong(0)).groupBy(h => (h & 15L).toInt)
      .map { case (j, hs) =>
        j -> hs.map { h =>
          val w = h >>> 4
          if (w == 0L) 61 else 61 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        }.max
      }
    for ((j, rho) <- reg)
      assert(rho === expected.getOrElse(j, 0), s"register $j")
  }

  test("NULL values do not register (approx_count_distinct parity)") {
    val withNulls = longs(Seq[java.lang.Long](1L, 2L, null, 3L, null))
    val without = longs(Seq[java.lang.Long](1L, 2L, 3L))
    val a = Sketches.hllRegisters(withNulls, col("v"), p = 5)
      .orderBy("j").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val b = Sketches.hllRegisters(without, col("v"), p = 5)
      .orderBy("j").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(a === b)
  }

  test("sketches merge relationally: union splits + re-max == whole corpus") {
    val all = longs((1L to 500L).map(java.lang.Long.valueOf))
    val odd = all.filter(col("v") % 2 === 1)
    val even = all.filter(col("v") % 2 === 0)
    val merged = Sketches.hllRegisters(odd, col("v"), p = 6)
      .union(Sketches.hllRegisters(even, col("v"), p = 6))
      .groupBy("j").agg(max("rho").as("rho"))
      .orderBy("j").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val whole = Sketches.hllRegisters(all, col("v"), p = 6)
      .orderBy("j").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(merged === whole)
  }

  test("corrected estimate lands within 3 standard errors of the truth") {
    for ((n, p) <- Seq((2000, 9), (5000, 11))) {
      val df = longs((1L to n.toLong).map(java.lang.Long.valueOf))
      val est = Sketches.hllEstimateCorrected(
        Sketches.hllRegisters(df, col("v"), p), p)
        .collect()(0).getAs[Double]("est")
      val m = 1 << p
      val bound = 3.0 * 1.04 / math.sqrt(m.toDouble)
      assert(math.abs(est - n) / n <= bound,
        s"n=$n p=$p est=$est relerr=${math.abs(est - n) / n} bound=$bound")
    }
  }

  test("small-m alpha constants are the exact Flajolet values") {
    assert(Sketches.alphaM(16) === 0.673)
    assert(Sketches.alphaM(32) === 0.697)
    assert(Sketches.alphaM(64) === 0.709)
    assert(Sketches.alphaM(512) === 0.7213 / (1.0 + 1.079 / 512))
    // and the raw estimator actually uses them: recompute p=4 by hand
    val df = longs((1L to 40L).map(java.lang.Long.valueOf))
    val reg = Sketches.hllRegisters(df, col("v"), p = 4)
    val row = Sketches.hllEstimateRaw(reg, p = 4).collect()(0)
    val regs = reg.orderBy("j").collect().map(_.getInt(1))
    val sd = regs.foldLeft(0.0)((acc, rho) =>
      acc + java.lang.Math.scalb(1.0, 61 - rho))
    val want = BigDecimal(0.673 * 16.0 * 16.0
      * java.lang.Math.scalb(1.0, 61) / sd)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("est_raw") === want)
  }

  test("small-range linear counting kicks in below 2.5m with empty registers") {
    val df = longs((1L to 20L).map(java.lang.Long.valueOf))
    val out = Sketches.hllEstimateCorrected(
      Sketches.hllRegisters(df, col("v"), p = 9), 9).collect()(0)
    val v = out.getAs[Long]("v_zeros")
    assert(v > 0, "20 values cannot touch all 512 registers")
    val m = 512.0
    val want = BigDecimal(m * math.log(m / v))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getAs[Double]("est") === want)
    assert(math.abs(out.getAs[Double]("est") - 20.0) < 3.0,
      "linear counting is near-exact at tiny cardinality")
  }

  test("GK quantiles: every cut's exact rank is within relErr·N of p·N " +
      "on a skewed frame (the q132 oracle's verdict, pinned in-engine)") {
    // heavy-tailed: 0.9·N small values + a long geometric tail — the
    // shape where a naive equi-width cut would miss badly
    val xs = ((1 to 900).map(_.toDouble) ++
      (1 to 100).map(i => 1000.0 * math.pow(1.05, i))).map(java.lang.Double.valueOf)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(xs.map(Row(_)), 8),
      StructType(Seq(StructField("x", DoubleType, nullable = false))))
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    val eps = 0.05
    val out = Sketches.gkQuantiles(df, "x", probs, eps)
      .orderBy("p").collect()
    assert(out.length === probs.length)
    val n = xs.length
    val sorted = xs.map(_.doubleValue).sorted
    for (r <- out) {
      val (p, cut, ok) = (r.getDouble(0), r.getDouble(1), r.getBoolean(2))
      assert(ok, "engine asserts its own contract column")
      val rankLo = sorted.count(_ < cut)   // exact rank window of cut
      val rankHi = sorted.count(_ <= cut)
      assert(rankHi >= math.floor((p - eps) * n) &&
        rankLo <= math.ceil((p + eps) * n),
        s"p=$p cut=$cut rank window [$rankLo,$rankHi] outside ±${eps}·${n}")
    }
  }

  test("hllRegistersGrouped: each group block equals the per-slice registers") {
    val ev = graft.sources.Tables(spark, sfDir).events
    val grouped = Sketches.hllRegistersGrouped(
        ev, col("event_type"), col("user_id"), p = 5)
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) =>
        g -> rs.map(r => (r.getInt(1), r.getInt(2))).toMap }
    assert(grouped.nonEmpty)
    grouped.keys.foreach { t =>
      val slice = Sketches.hllRegisters(
          ev.filter(col("event_type") === t), col("user_id"), p = 5)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
      assert(grouped(t) === slice, s"group $t diverged from its own sketch")
      assert(grouped(t).size === 32, s"group $t register block not dense")
    }
  }

  test("hllRegistersGrouped: a group seen only with null values emits no block") {
    // an all-zero register block would linear-count to ~0.36m, not 0 —
    // the group universe must come from (group, value) both non-null
    import spark.implicits._
    val df = Seq(
      ("a", Some(1L)), ("a", Some(2L)), ("a", None),
      ("ghost", None), ("ghost", None)).toDF("g", "v")
    val out = Sketches.hllRegistersGrouped(df, col("g"), col("v"), p = 5)
      .collect()
    val groups = out.map(_.getString(0)).distinct.toSet
    assert(groups === Set("a"), s"got blocks for $groups")
    assert(out.length === 32, "group a must still be a dense block")
  }

  // ---- KMV (k minimum values) ----

  private def kmvOf(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
    df.agg(graft.plans.Kmv.kmvMinima(xxhash64(col("v")), k).as("m"))
      .collect()(0).getSeq[Long](0)

  test("kmv: the k smallest distinct hashes, ascending; dupes occupy one slot") {
    val base = (1L to 200L).map(java.lang.Long.valueOf)
    val dup = longs(base ++ base ++ base)
    val expected = (1L to 200L)
      .map(v => longs(Seq(java.lang.Long.valueOf(v)))
        .select(xxhash64(col("v"))).collect()(0).getLong(0))
      .sorted.take(16)
    assert(kmvOf(dup, 16) === expected)
    assert(kmvOf(longs(base), 16) === expected, "duplicates changed the sketch")
  }

  test("kmv: merge of split sketches equals the whole-frame sketch") {
    val xs = (1L to 500L).map(java.lang.Long.valueOf)
    val whole = kmvOf(longs(xs), 32)
    // shard by parity, sketch each, merge relationally (the map-side path
    // exercises TreeSet merge; this pins the same algebra end to end)
    val parts = longs(xs).withColumn("p", pmod(col("v"), lit(2L)))
      .groupBy("p").agg(graft.plans.Kmv.kmvMinima(xxhash64(col("v")), 32).as("m"))
      .agg(slice(array_sort(flatten(collect_list(col("m")))), 1, 32).as("m"))
      .collect()(0).getSeq[Long](0)
    assert(parts === whole)
  }

  test("kmv: under k distinct inputs the sketch is the complete value set") {
    val xs = (1L to 10L).map(java.lang.Long.valueOf)
    val m = kmvOf(longs(xs), 64)
    assert(m.length === 10)
    assert(m === m.sorted)
  }

  test("kmvOverlap: estimates within 20% of truth; exact path when under k") {
    import spark.implicits._
    // A = [0, 4000), B = [2000, 6000): |A|=|B|=4000, ∩=2000, ∪=6000, J=1/3
    val df = (0L until 6000L).toDF("v")
    val r = Sketches.kmvOverlap(df,
      inA = col("v") < 4000L, inB = col("v") >= 2000L,
      value = col("v"), k = 256).collect()(0)
    assert(r.getAs[Int]("n_a") === 256 && r.getAs[Int]("n_union") === 256)
    assert(math.abs(r.getAs[Double]("est_a") - 4000) / 4000.0 < 0.2)
    assert(math.abs(r.getAs[Double]("est_union") - 6000) / 6000.0 < 0.2)
    assert(math.abs(r.getAs[Double]("jaccard") - 1.0 / 3) < 0.1)
    assert(math.abs(r.getAs[Double]("est_intersect") - 2000) / 2000.0 < 0.35)
    // under-k regime: every figure exact
    val small = (0L until 60L).toDF("v")
    val e = Sketches.kmvOverlap(small,
      inA = col("v") < 40L, inB = col("v") >= 20L,
      value = col("v"), k = 256).collect()(0)
    assert(e.getAs[Double]("est_a") === 40.0)
    assert(e.getAs[Double]("est_b") === 40.0)
    assert(e.getAs[Double]("est_union") === 60.0)
    assert(e.getAs[Int]("shared") === 20)
    assert(e.getAs[Double]("est_intersect") === 20.0)
  }

  test("kmvOverlapMatrix: pair rows agree with the two-cohort operator") {
    import spark.implicits._
    val df = (0L until 3000L).map(v => (v, if (v < 2000) "a" else "zz"))
      .toDF("v", "g")
      // overlap: the middle 1000 belongs to both groups
      .union((1000L until 2000L).map(v => (v, "zz")).toDF("v", "g"))
    val m = Sketches.kmvOverlapMatrix(df, col("g"), col("v"), k = 64)
      .collect()
    assert(m.length === 1)
    val pair = m(0)
    assert(pair.getAs[String]("grp_a") === "a")
    val two = Sketches.kmvOverlap(df, inA = col("g") === "a",
      inB = col("g") === "zz", value = col("v"), k = 64).collect()(0)
    for (c <- Seq("n_a", "n_b", "n_union", "shared"))
      assert(pair.getAs[Int](c) === two.getAs[Int](c), c)
    for (c <- Seq("est_a", "est_b", "est_union", "jaccard", "est_intersect"))
      assert(pair.getAs[Double](c) === two.getAs[Double](c), c)
  }

  test("kmv: plans as ObjectHashAggregate with a partial stage (map-side combine)") {
    val df = longs((1L to 100L).map(java.lang.Long.valueOf))
    val plan = df.agg(graft.plans.Kmv.kmvMinima(xxhash64(col("v")), 8))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
    assert(plan.toLowerCase.contains("partial_kmv_minima"), plan.take(500))
  }
}
