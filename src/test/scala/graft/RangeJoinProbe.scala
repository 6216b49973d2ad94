package graft

import org.apache.spark.sql.functions._

/** Test-scope scaling probe (not part of the API): times the NAIVE
  * inequality join (BroadcastNestedLoopJoin — quadratic) against the same
  * query under plans.RangeJoinRewrite (bucketed equi-join — linear) on a
  * synthetic points × intervals workload, so NOTES can carry a MEASURED
  * speedup instead of a plan-shape claim alone. Both paths must return
  * identical aggregates (asserted).
  * Run: sbt "Test/runMain graft.RangeJoinProbe [nPoints] [nIntervals]"
  */
object RangeJoinProbe {
  def main(args: Array[String]): Unit = {
    val nPoints = args.headOption.map(_.toInt).getOrElse(200000)
    val nIv = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // points on [0, 1e7); intervals ~1000 long, deterministic placement
    val pts = spark.range(nPoints.toLong)
      .select((pmod(xxhash64(col("id")), lit(10000000L))).as("ts"))
      .localCheckpoint(true)
    val ivs = spark.range(nIv.toLong)
      .select(col("id").as("wid"),
        pmod(xxhash64(col("id"), lit(7L)), lit(10000000L)).as("f"))
      .select(col("wid"), col("f"), (col("f") + 1000L).as("t"))
      .localCheckpoint(true)
    def run(): (Long, Double, Double) = {
      val j = pts.join(ivs, col("ts") >= col("f") && col("ts") <= col("t"))
        .agg(count(lit(1)), round(sum(col("ts") - col("f")), 2))
      val t0 = System.nanoTime()
      val r = j.collect()(0)
      val p = j.queryExecution.executedPlan.toString
      val naivePlan = p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct")
      ((System.nanoTime() - t0) / 1000000L, r.getLong(0).toDouble,
        if (naivePlan) 1.0 else 0.0)
    }
    run() // warm
    val (tNaive, nNaive, wasNaive) = run()
    require(wasNaive == 1.0, "baseline should be the quadratic plan")
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf, "1000")
    try {
      run() // warm under rewrite
      val (tFast, nFast, wasNaive2) = run()
      require(wasNaive2 == 0.0, "rewrite did not fire")
      require(nNaive == nFast, s"result mismatch: $nNaive vs $nFast")
      println(f"[rangejoin-probe] points=$nPoints intervals=$nIv " +
        f"matches=${nNaive.toLong} naive=${tNaive}ms rewritten=${tFast}ms " +
        f"speedup=${tNaive.toDouble / tFast}%.1fx")
    } finally spark.conf.unset(graft.plans.RangeJoinRewrite.WidthConf)
  }
}
