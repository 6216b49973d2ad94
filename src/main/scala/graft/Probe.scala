package graft
import org.apache.spark.sql.SparkSession
/** Scratch main for plan inspection while iterating; not part of the API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val cold = sys.env.contains("GRAFT_PROBE_COLD")
    for (name <- args) {
      // cold mode times construction too — operators with eager driver-side
      // steps (checkpoints, k-means, probe collection) do real work there
      if (!cold)
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(s"== $name: ${(System.nanoTime()-t0)/1e9}s")
      df.explain("formatted")
    }
    spark.stop()
  }
}
