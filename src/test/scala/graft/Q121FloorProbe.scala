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
    // fixed all-core reference (the bench's canaryParSec): q121 is a
    // PARALLEL query, so its floor moves with effective parallel
    // capacity, which a healthy single-thread canary cannot see
    def canaryParSec(): Double = {
      import org.apache.spark.sql.functions.{bit_xor, xxhash64, col}
      val t0 = System.nanoTime()
      sink ^= spark.range(500000000L).agg(bit_xor(xxhash64(col("id"))))
        .collect()(0).getLong(0)
      (System.nanoTime() - t0) / 1e9
    }
    // controls with committed anchors: a uniform inflation across all
    // three reads as host capacity; q121-only inflation is q121 drift
    val controls = Seq(
      "q121_knn_graph_dedup" -> 2.195,
      "q120_knn_graph" -> 0.124,
      "q138_pagerank" -> 1.184)
    (1 to 4).foreach { i =>
      controls.foreach { case (name, anchor) =>
        val c = canaryMs(); val cp = canaryParSec()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"== rep $i $name%-24s $sec%6.3f s (${sec / anchor}%4.2fx " +
          f"anchor $anchor%5.3f)  canary $c%5.1f ms  par $cp%5.2f s " +
          "(healthy ~46 ms / ~0.28 s)")
      }
    }
    System.err.println(s"[probe] sink $sink")
    spark.stop()
  }
}
