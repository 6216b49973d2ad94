package graft
import org.apache.spark.sql.functions._
object Q224ShareProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16)
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_name"))
    val (advice, _) = graft.operators.Dedup.editDistancePairsAdvised(
      customer, col("c_name"), col("c_custkey"), k = 1,
      broadcastMaxRows = 0L, skewFactor = 1.5, minSaltOutputRows = 100L,
      maxSaltBuckets = 8, targetPartitions = Some(200000),
      maxHotShare = 1.0)
    println(s"== q224 advice: strategy=${advice.strategy} " +
      s"shareL=${advice.hotShareLeft} shareR=${advice.hotShareRight} " +
      s"min=${advice.hotRowShare} hotKeys=${advice.hotKeys.size}")
    spark.stop()
  }
}
