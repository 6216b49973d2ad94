package graft

/** Scratch main: adjudicate the q121 two-window flag (r15: 1.39× noisy
  * on a 1.71-disk window; r16-open: 1.32× on a 2.4×-degraded-start
  * window — both exonerated by canaries, neither confirmed/cleared on
  * a healthy window). Five warm reps of the exact registered query at
  * sf0.1 with a single-thread CPU canary before each: if the warm
  * floor sits near the 2.195 anchor the flags were window noise; a
  * floor near 2.9 on a healthy canary is a real drift to root-cause.
  * Run: sbt "Test/runMain graft.Q121FloorProbe" */
object Q121FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var sink = 0L
    def canaryMs(): Double = {
      val t0 = System.nanoTime()
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < 30000000) {
        h = java.lang.Long.rotateLeft(h * 0x9E3779B97F4A7C15L, 31) ^ i
        i += 1
      }
      sink ^= h
      (System.nanoTime() - t0) / 1e6
    }
    (1 to 6).foreach { i =>
      val c = canaryMs()
      val t0 = System.nanoTime()
      SparkEntry.queries("q121_knn_graph_dedup")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"== q121 rep $i: $sec%6.3f s   canary $c%5.1f ms  " +
        f"(anchor 2.195; healthy canary ~46 ms)")
    }
    System.err.println(s"[probe] sink $sink")
    spark.stop()
  }
}
