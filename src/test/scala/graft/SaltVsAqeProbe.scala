package graft

import org.apache.spark.sql.functions._

/** Scratch main (local dev only): r14 verdict #8 — at q224's salt
  * operating point, is the advisory's TARGETED salt cheaper or dearer
  * than letting AQE's runtime skew-split handle the same hot variant
  * blocks? Three contenders over the identical variant self-join
  * (customer c_name, k=1 deletion neighborhood, sf0.1):
  *
  *   1. `advised-salt` — the shipped path: MG-named hot keys replicate
  *      saltBuckets×, cold keys join plain, shuffle_hash pinned.
  *   2. `plain-smj`    — static sort-merge join, no AQE, broadcast
  *      disabled (the "do nothing" baseline a salt verdict replaces).
  *   3. `aqe-skew`     — the same static join under AQE with
  *      skewJoin enabled and its thresholds scaled DOWN to probe scale
  *      (1 MiB where a cluster default is 256 MiB) so the runtime
  *      split fires here the way it would on real 100 TB partitions.
  *
  * The ledger is (wall sec, shuffle read+write bytes) per contender —
  * the verdict cares about BYTES (the 100×-scale early warning), with
  * seconds as the local tiebreak. Row counts are required identical.
  * Run: sbt "Test/runMain graft.SaltVsAqeProbe"
  */
object SaltVsAqeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_name")).localCheckpoint(true)

    val bytes = new TaskBytesListener
    spark.sparkContext.addSparkListener(bytes)
    def ledger[A](tag: String)(body: => org.apache.spark.sql.DataFrame)
        : Long = {
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      val (r0, w0, _) = bytes.snapshot
      val t0 = System.nanoTime()
      val df = body
      df.write.format("noop").mode("overwrite").save()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      val (r1, w1, _) = bytes.snapshot
      val mb = (r1 - r0 + w1 - w0) / 1e6
      println(f"== $tag%-12s $sec%6.2f s  shuffle ${mb}%8.1f MB  $n pairs")
      n
    }

    def setConf(kvs: (String, String)*): Unit =
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }

    // q224's exact operating point: broadcast disallowed, fair share at
    // a 200k-partition deployment, buckets capped at 8
    def advised() = graft.operators.Dedup.editDistancePairsAdvised(
      customer, col("c_name"), col("c_custkey"), k = 1,
      broadcastMaxRows = 0L, skewFactor = 1.5, minSaltOutputRows = 100L,
      maxSaltBuckets = 8, targetPartitions = Some(200000))

    // warm-up (codegen/JIT of the variant pipeline — the q208 lesson)
    ledger("warmup")(advised()._2)

    // contender 1: the shipped targeted salt, under the session's
    // DEFAULT conf (AQE on, default thresholds) — exactly what the
    // bench times as q224
    val (advice, steered) = advised()
    println(s"== advice: $advice")
    val nSalt = ledger("advised-salt")(steered)

    // contender 2: static SMJ, no AQE, no broadcast (what a salt verdict
    // replaces at deployment scale, where neither side fits broadcast)
    setConf("spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val nPlain = ledger("plain-smj")(graft.operators.Dedup
      .editDistancePairs(customer, col("c_name"), col("c_custkey"), k = 1))

    // contender 3: same static join, AQE skew-split live at probe scale
    setConf("spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1m",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val nAqe = ledger("aqe-skew")(graft.operators.Dedup
      .editDistancePairs(customer, col("c_name"), col("c_custkey"), k = 1))

    require(nSalt == nPlain && nPlain == nAqe,
      s"contenders disagree: salt=$nSalt plain=$nPlain aqe=$nAqe")
    // restore session defaults so a shared session cannot leak the caps
    setConf("spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760")
    spark.stop()
  }
}
