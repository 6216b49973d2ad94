package graft

import org.apache.spark.sql.functions._

/** Scratch main (local dev only): the advisor-steered fuzzy join at its
  * SKEW operating point, measured on the exact hazard the operator's
  * scaladoc names — a mass-duplicate string cluster, where every
  * deletion variant of the hot string becomes one reducer-killing join
  * key. Reports:
  *   1. the sketch pass cost and the advisory's verdict,
  *   2. the hot block's reducer-key concentration before/after salting
  *      (max rows per (v) key vs per (v, __salt) key — the quantity
  *      that decides a straggler at 100 TB),
  *   3. wall time of the static vs the steered join at this scale
  *      (local[32] shares one machine, so the wall gap understates the
  *      cluster gap — the concentration ratio is the portable number).
  * Run: sbt "Test/runMain graft.AdvisedJoinProbe"
  */
object AdvisedJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    // operating point: a 1200-row mass-duplicate cluster in a 50k-row
    // corpus — hot-variant output (1200²/2 per variant key) genuinely
    // dominates the true fair share 5×+, AND f clears the MG detection
    // floor N/(hhCapacity+1) ≈ 0.9M/1025 ≈ 880 (the probe's first
    // finding: at the advisory's raw cap 16 the floor is ~N/17, so an
    // 800-count key among 3.4M variant rows is structurally invisible
    // no matter how the estimator is corrected)
    val n = 50000L
    val hot = 1200L // mass-duplicate cluster sharing ONE string
    val docs = spark.range(n).select(col("id"),
        when(col("id") < hot, lit("Entity#DUPLICATE"))
          .otherwise(format_string("Entity#%09d", col("id"))).as("s"))
      .localCheckpoint(true)

    val t0 = System.nanoTime()
    val (advice, steered) = graft.operators.Dedup.editDistancePairsAdvised(
      docs, col("s"), col("id"), k = 1,
      broadcastMaxRows = 0, skewFactor = 3.0, minSaltOutputRows = 100000,
      maxSaltBuckets = 64, hhCapacity = 1024, targetPartitions = Some(96))
    println(f"== advice (sketch pass ${(System.nanoTime() - t0) / 1e9}%.2f s): $advice")

    // reducer-key concentration: the hot string's variants before/after
    // the advisory's salt (salt = pmod(xxhash64(id), buckets), exactly
    // the operator's rule)
    val keys = docs.select(col("id"),
      explode(concat(array(col("s")), transform(sequence(lit(1), length(col("s"))),
        i => concat(col("s").substr(lit(1), i - 1),
          col("s").substr(i + 1, length(col("s")) - i))))).as("v"))
    val maxPlain = keys.groupBy(col("v")).count()
      .agg(max(col("count"))).head().getLong(0)
    val maxSalted = keys
      .withColumn("__salt",
        pmod(xxhash64(col("id")), lit(advice.saltBuckets)).cast("int"))
      .groupBy(col("v"), col("__salt")).count()
      .agg(max(col("count"))).head().getLong(0)
    println(s"== max rows per reducer key: plain(v)=$maxPlain " +
      s"salted(v,salt)=$maxSalted " +
      f"(spread x${maxPlain.toDouble / maxSalted}%.1f at " +
      s"${advice.saltBuckets} buckets)")

    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Long = {
      val t = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val n = df.count()
      println(f"== $tag: $n pairs, ${(System.nanoTime() - t) / 1e9}%.2f s")
      n
    }
    val nSteered = time("steered (salted)")(steered)
    val nStatic = time("static editDistancePairs")(
      graft.operators.Dedup.editDistancePairs(docs, col("s"), col("id"), 1))
    require(nSteered == nStatic, s"steering changed semantics: $nSteered vs $nStatic")
    spark.stop()
  }
}
