package graft

import org.apache.spark.sql.functions._

/** Scratch main (local dev only): r15 verdict #6 — where is the
  * wall/bytes crossover between TARGETED salting and AQE's runtime
  * skew-split as the REPLICATED side's hot-row share grows? Targeted
  * salt's advantage is |hot rows|×buckets ≪ |frame|×buckets; as the
  * hot share → 1 it degenerates to full replication, while AQE's
  * post-shuffle split costs the same at every share. The measured
  * crossover becomes [[graft.plans.JoinAdvisor.DefaultMaxHotShare]]:
  * past it a salt verdict DEMOTES to shuffle (+AQE), and
  * JoinAdvisorSpec pins the demotion.
  *
  * Fixture: a SELF-join (q224's operating shape — the variant
  * self-join is the engine's canonical salt consumer, and a self-join
  * makes "the replicated side's share" unambiguous): N=100k rows,
  * hot keys at 500 rows each (past the MG floor N/1025), cold keys
  * unique; the number of hot keys sets the share s ∈ {10%, 50%, 90%}.
  * Join output = s·N·500 + (1−s)·N rows, aggregated immediately so
  * the measured shuffle is the JOIN INPUT — the quantity the two
  * placements actually move.
  *
  * Contenders per share point (identical SQL text, count-verified):
  *   salt — the shipped GRAFT_ADVISE path, maxHotShare lifted to 1.0
  *          so the probe can measure PAST the ceiling it calibrates;
  *   aqe  — the same static join under AQE skew-split with thresholds
  *          scaled to probe scale (the SaltVsAqeProbe convention).
  *
  * Run: sbt "Test/runMain graft.SaltShareProbe"
  */
object SaltShareProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

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

    val n = 100000
    val hotMult = 500
    val sql = """SELECT /*+ GRAFT_ADVISE */ CAST(count(*) AS BIGINT) AS n
      FROM salt_share_t a JOIN salt_share_t b ON a.k = b.k"""
    val sqlPlain = sql.replace("/*+ GRAFT_ADVISE */ ", "")

    Seq(0.1, 0.2, 0.3, 0.5, 0.9).foreach { share =>
      val hotKeys = (share * n / hotMult).toInt
      val df = ((0 until hotKeys).flatMap(k => Seq.fill(hotMult)(k.toLong))
        ++ (0 until (n - hotKeys * hotMult))
          .map(i => 1000000L + i))
        .zipWithIndex.map { case (k, id) => (k, id.toLong) }
        .toDF("k", "id").localCheckpoint(true)
      df.createOrReplaceTempView("salt_share_t")
      println(f"---- hot share $share%.1f (${hotKeys} hot keys) ----")

      // shipped targeted-salt path, ceiling lifted for the measurement
      setConf("spark.graft.advisor.broadcastMaxRows" -> "0",
        "spark.graft.advisor.skewFactor" -> "1.5",
        "spark.graft.advisor.minSaltOutputRows" -> "100",
        "spark.graft.advisor.maxSaltBuckets" -> "8",
        "spark.graft.advisor.targetPartitions" -> "200000",
        "spark.graft.advisor.maxHotShare" -> "1.0",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      ledger(f"warmup")(spark.sql(sql).collect().head.getLong(0))
      // min-of-2 per contender: single readings at this fixture size
      // swing ±30% from scheduling jitter
      ledger(f"salt@$share%.1f r1")(
        spark.sql(sql).collect().head.getLong(0))
      val (_, _, nSalt) =
        ledger(f"salt@$share%.1f r2")(
          spark.sql(sql).collect().head.getLong(0))
      val p = spark.sql(sql).queryExecution.executedPlan.toString
      require(p.contains("__gsalt"),
        s"salt contender must execute the salted shape:\n${p.take(800)}")

      // AQE skew-split at probe scale over the same static join
      setConf("spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1m",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
      ledger(f"aqe@$share%.1f r1")(
        spark.sql(sqlPlain).collect().head.getLong(0))
      val (_, _, nAqe) =
        ledger(f"aqe@$share%.1f r2")(
          spark.sql(sqlPlain).collect().head.getLong(0))
      require(nSalt == nAqe, s"contenders disagree: $nSalt vs $nAqe")
      setConf("spark.sql.adaptive.coalescePartitions.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "5.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
          -> "256m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m")
    }
    spark.stop()
  }
}
