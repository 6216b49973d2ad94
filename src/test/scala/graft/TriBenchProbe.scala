package graft

/** Scratch main: q184 exactly as the bench times it (noop sink), 4 reps
  * in one fresh JVM — the cold/warm profile behind the envelope flags.
  * Run: sbt "Test/runMain graft.TriBenchProbe" */
object TriBenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q184_triangle_counts")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"== rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
