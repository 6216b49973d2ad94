package graft

import org.apache.spark.sql.functions._

/** Scratch main (local dev only): r17 verdict #6 — where is the
  * wall/bytes crossover between the DECOMPOSED+SALTED full outer
  * (AdvisedJoinRule.fullOuterSaltRewrite: A⟗B = (A⟕B) ∪all
  * null-pad(B▷A), each leg targeted-salted) and the single-pass
  * SortMergeJoin, as the hot key's share of the join output grows?
  * The decomposition's cost is structural — each input scans TWICE,
  * one scan per leg — while its win is the straggler it removes: the
  * single reducer that owns the hot key's entire output in the
  * one-pass plan. AQE's skew split is NOT a contender here: Spark's
  * OptimizeSkewedJoin cannot split either side of a FullOuter (both
  * sides' unmatched rows emit, so neither side may be partially
  * replicated), which is exactly why the decomposition exists.
  *
  * Fixture: sf0.1 substrate (the q235 shape at scale). LEFT =
  * lineitem's keys with every (l_orderkey % K == 0) row remapped to
  * the single hot key 1 — K sweeps the hot INPUT share 1/K ∈
  * {1/300, 1/100, 1/30, 1/10, 1/3}; RIGHT = odd orders keys (so even
  * keys exercise unmatched-left) plus `rightMult` copies of key 1
  * (so the hot key's output = hotRows·rightMult dominates at high
  * share) plus a disjoint unmatched-right block. Output aggregated in
  * place so the measured shuffle is the join input + result rows.
  *
  * Contenders per share point (identical SQL text, count-verified):
  *   salt  — GRAFT_ADVISE with thresholds forcing the salt verdict and
  *           maxHotShare lifted, so the decomposition engages at EVERY
  *           probed share (the probe measures past any ceiling);
  *   plain — the same statement unhinted: Catalyst's one-pass SMJ.
  *
  * Run: sbt "Test/runMain graft.FullOuterSaltProbe"
  * The measured table goes into NOTES (r18); the gate decision
  * (whether fullOuterSaltRewrite needs a stricter engagement bar than
  * the generic salt verdict) follows the table.
  */
object FullOuterSaltProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    val bytes = new TaskBytesListener
    spark.sparkContext.addSparkListener(bytes)
    def ledger(tag: String)(body: => Long): (Double, Double, Long) = {
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      val (r0, w0, _) = bytes.snapshot
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      val (r1, w1, _) = bytes.snapshot
      val mb = (r1 - r0 + w1 - w0) / 1e6
      println(f"== $tag%-22s $sec%6.2f s  shuffle $mb%8.1f MB  $n rows")
      (sec, mb, n)
    }
    def setConf(kvs: (String, String)*): Unit =
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }

    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"))
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"))
    val rightMult = 64

    val sql = """SELECT /*+ GRAFT_ADVISE */
      CAST(count(*) AS BIGINT) AS n,
      CAST(count(l.k) AS BIGINT) AS n_l, CAST(count(r.k2) AS BIGINT) AS n_r
      FROM fosalt_l l FULL OUTER JOIN fosalt_r r ON l.k = r.k2"""
    val sqlPlain = sql.replace("/*+ GRAFT_ADVISE */", "")

    Seq(300, 100, 30, 10, 3).foreach { k =>
      val left = lineitem.select(
        when(col("l_orderkey") % k === 0, 1L)
          .otherwise(col("l_orderkey")).as("k"))
        .localCheckpoint(true)
      // odd orders keys (evens → unmatched LEFT rows), the hot block
      // (key 1 × rightMult), and a disjoint unmatched-RIGHT block
      val right = orders.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey").as("k2"))
        .union(spark.range(rightMult).select(lit(1L).as("k2")))
        .union(spark.range(50000)
          .select((col("id") + 2000000000L).as("k2")))
        .localCheckpoint(true)
      left.createOrReplaceTempView("fosalt_l")
      right.createOrReplaceTempView("fosalt_r")
      val hotRows = left.filter(col("k") === 1L).count()
      println(f"---- hot input share 1/$k (hot rows $hotRows, " +
        f"hot output ~${hotRows * rightMult}) ----")

      setConf("spark.graft.advisor.broadcastMaxRows" -> "0",
        "spark.graft.advisor.skewFactor" -> "1.5",
        "spark.graft.advisor.minSaltOutputRows" -> "100",
        "spark.graft.advisor.maxSaltBuckets" -> "32",
        "spark.graft.advisor.targetPartitions" -> "200000",
        "spark.graft.advisor.maxHotShare" -> "1.0",
        "spark.graft.advisor.cacheSize" -> "0",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      ledger("warmup")(spark.sql(sql).collect().head.getLong(0))
      ledger(f"salt 1/$k r1")(spark.sql(sql).collect().head.getLong(0))
      val (_, _, nSalt) =
        ledger(f"salt 1/$k r2")(spark.sql(sql).collect().head.getLong(0))
      val p = spark.sql(sql).queryExecution.executedPlan.toString
      require(p.contains("__gsalt") && !p.contains("FullOuter"),
        s"salt contender must execute the decomposed shape:\n${p.take(800)}")

      ledger(f"plain 1/$k r1")(
        spark.sql(sqlPlain).collect().head.getLong(0))
      val (_, _, nPlain) =
        ledger(f"plain 1/$k r2")(
          spark.sql(sqlPlain).collect().head.getLong(0))
      val pp = spark.sql(sqlPlain).queryExecution.executedPlan.toString
      require(pp.contains("FullOuter"),
        s"plain contender must stay a one-pass full outer:\n${pp.take(800)}")
      require(nSalt == nPlain, s"contenders disagree: $nSalt vs $nPlain")
    }
    spark.stop()
  }
}
