package graft

/** Scratch plan/timing probe (local dev only; the driver never runs it):
  * for each query name given, run it twice against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) and print cold/warm wall times
  * plus the formatted physical plan — the `.explain`-and-iterate loop the
  * build discipline asks for, as one command. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val n = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name: $n rows in $dt%.3f s")
        dt
      }
      once(); once()
      println(s"[probe] $name plan:")
      println(fn(spark, sfDir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
