package graft

import org.apache.spark.sql.functions._

/** Scratch main: price the JoinAdvisor's two sketch passes against the
  * join they advise on, at sf0.1 — the NOTES row for "what does the
  * advisory cost before the join pays for itself". */
object AdviceProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.sources.Tables(spark, "/root/testdata/sf0.1").events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(when(col("user_id") % 10 < 5, lit(7L))
        .otherwise(col("user_id")).as("k"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("k"))
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $tag: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    // warm the scans so both measurements see hot parquet footers
    purchases.count(); clicks.count()
    val advice = time("advise (2 sketch passes + decision)") {
      graft.plans.JoinAdvisor.advise(
        purchases, col("k"), clicks, col("k"),
        broadcastMaxRows = 100L, skewFactor = 3.0,
        minSaltOutputRows = 1000L, hhCapacity = 4096,
        targetPartitions = Some(32))
    }
    println(s"== advice: $advice")
    val exact = time("the advised join (count)") {
      purchases.join(clicks, "k").count()
    }
    println(s"== exact output rows: $exact (advice est ${advice.estOutputRows})")
    // memoization row (r16 verdict #6): the SAME advised statement
    // planned twice — the second must serve its verdict from the LRU
    // (zero sketch jobs), pricing what an interactive session re-running
    // one join shape saves per statement
    purchases.createOrReplaceTempView("advprobe_p")
    clicks.createOrReplaceTempView("advprobe_c")
    val stmt = """SELECT /*+ GRAFT_ADVISE */ k, count(*) AS n
      FROM advprobe_p JOIN advprobe_c USING (k) GROUP BY k"""
    graft.plans.AdvisedEquiJoinRewrite.clearAdviceCache()
    val s0 = graft.plans.AdvisedEquiJoinRewrite.sketchPassCount.get
    time("advised SQL planning, cold (sketch pass)") {
      spark.sql(stmt).queryExecution.executedPlan
    }
    time("advised SQL planning, memoized (cache hit)") {
      spark.sql(stmt).queryExecution.executedPlan
    }
    println(s"== sketch passes across both plannings: " +
      s"${graft.plans.AdvisedEquiJoinRewrite.sketchPassCount.get - s0} " +
      "(must be 1)")
    spark.stop()
  }
}
