package graft
import org.apache.spark.sql.SparkSession
/** Scratch main for plan inspection while iterating; not part of the API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val cold = sys.env.contains("GRAFT_PROBE_COLD")
    for (name <- args) {
      // cold mode times construction too — operators with eager driver-side
      // steps (checkpoints, k-means, probe collection) do real work there.
      // warm mode keeps the original semantics: build once, warm the write,
      // then time ONLY the steady-state write.
      val df =
        if (cold) {
          val t0 = System.nanoTime()
          val d = SparkEntry.queries(name)(spark, dir)
          d.write.format("noop").mode("overwrite").save()
          println(s"== $name: ${(System.nanoTime()-t0)/1e9}s")
          d
        } else {
          val d = SparkEntry.queries(name)(spark, dir)
          d.write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          d.write.format("noop").mode("overwrite").save()
          println(s"== $name: ${(System.nanoTime()-t0)/1e9}s")
          d
        }
      df.explain("formatted")
    }
    spark.stop()
  }
}
