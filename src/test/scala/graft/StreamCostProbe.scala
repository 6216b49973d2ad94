package graft

/** Scratch main: q5a/q59 bench-mode cost, isolated vs after the round-15
  * neighbor queries (q229/q230/q231) that now precede them in the sweep.
  * Distinguishes session-state pollution from a real code regression.
  * Run: sbt "Test/runMain graft.StreamCostProbe [withNeighbors]" */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val withNeighbors = args.headOption.contains("withNeighbors")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up comparable to the sweep (one cheap query)
    run("q01_pricing_summary")
    if (withNeighbors) {
      for (n <- Seq("q229_advised_range_salted", "q230_advised_knn_broadcast",
        "q231_advised_knn_salted")) println(f"== $n: ${run(n)}%.2f s")
    }
    for (n <- Seq("q5a_sessionization_agg", "q59_stream_session_agg");
         if SparkEntry.queries.contains(n)) ()
    val names = SparkEntry.queries.keys.filter(k =>
      k.startsWith("q5a") || k.startsWith("q59")).toSeq.sorted
    for (n <- names; i <- 1 to 2) println(f"== $n rep$i: ${run(n)}%.2f s")
    spark.stop()
  }
}
