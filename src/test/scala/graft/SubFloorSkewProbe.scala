package graft

import org.apache.spark.sql.functions._

/** Scratch main (local dev only): attack the advisory's documented
  * blind spot — MG only GUARANTEES surfacing keys with
  * f > N/(hhCapacity+1) — and measure the claimed AQE backstop for
  * whatever slips through. The attack: a self-join hot key at ~0.97×
  * the floor (f=1900 vs N/1025≈1951), drowned by 600k distinct cold
  * keys of eviction churn.
  *
  * MEASURED OUTCOME (the interesting part): the attack FAILS to blind
  * the sketch — the floor is a worst-case bound, and in a non-adversarial
  * stream a key 576× the mean frequency survives MG eviction easily
  * (corrected estimate 3.33M vs real 3.61M output rows, 8% under). The
  * quadratic-vs-linear tension makes true blindness structurally hard:
  * a single key dangerous enough to matter (output ∝ f²) tends to clear
  * detection (∝ f), and splitting the mass across many near-equal
  * medium keys de-concentrates the reducers by itself. What remains is
  * the ECONOMIC gap: the verdict here is shuffle because the hot output
  * (3.6M) sits under minSaltOutputRows (10M default — salting overhead
  * is not worth buying below that at deployment scale), so the probe
  * then measures the backstop NOTES claims for exactly this window:
  * AQE's runtime skew-split ON vs OFF on the same static join
  * (AQE itself on in both runs; thresholds scaled to probe size the
  * way the 256 MiB default relates to real partitions), identical
  * output row count required.
  *
  * Run: sbt "Test/runMain graft.SubFloorSkewProbe"
  */
object SubFloorSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val n = 2000000L
    val hot = 1900L // MG floor at capacity 1024 is N/1025 ≈ 1951 > 1900
    val docs = spark.range(n).select(col("id"),
        when(col("id") < hot, lit("H"))
          .otherwise(concat(lit("K"), pmod(col("id"), lit(600000L))))
          .as("k"))
      .localCheckpoint(true)

    // 1. what the sketch pass sees at 0.97× its worst-case floor — the
    // measured answer is "nearly everything" (see object doc); the
    // shuffle verdict is the ECONOMIC one (hot output under
    // minSaltOutputRows), not a detection failure
    val advice = graft.plans.JoinAdvisor.adviseSelf(
      docs, col("k"), broadcastMaxRows = 0L)
    val realHotOut = hot * hot
    println(s"== advice: $advice")
    println(s"== real hot output $realHotOut vs advisory's corrected " +
      s"estimate ${advice.hotKeyOutputCorrected} " +
      s"(floor N/(1024+1) = ${n / 1025}, hot f = $hot)")
    require(advice.strategy == "shuffle",
      s"hot output under minSaltOutputRows must stay shuffle: $advice")
    require(advice.hotKeyOutputCorrected < 10000000L,
      s"the verdict's reason must be economics, not blindness: $advice")

    // 2. output concentration: the hot key's quadratic share is a lower
    // bound on what one reducer carries under any hash placement
    val tot = docs.groupBy(col("k")).count()
      .agg(sum(col("count") * col("count"))).head().getLong(0)
    println(f"== join output $tot%,d rows; the sub-floor key alone is " +
      f"$realHotOut%,d (${realHotOut * 100.0 / tot}%.0f%% on ONE reducer; " +
      f"fair share over 32 = ${tot / 32}%,d)")

    def time(tag: String)(skewSplit: Boolean): Long = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        skewSplit.toString)
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t0 = System.nanoTime()
      val c = docs.as("a").join(docs.as("b"), "k").count()
      println(f"== $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, $c pairs")
      c
    }
    val cOff = time("static join, AQE skew-split OFF")(false)
    val cOn = time("static join, AQE skew-split ON ")(true)
    require(cOff == cOn, s"backstop changed semantics: $cOff vs $cOn")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.stop()
  }
}
