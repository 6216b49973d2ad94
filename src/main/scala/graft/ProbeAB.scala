package graft

import org.apache.spark.sql.functions._

/** Throwaway validation-dump main (deleted after use — not part of the API). */
object ProbeAB {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.01").documents
    // distinct words + their Spark xxhash64
    docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .distinct()
      .select(col("w"), xxhash64(col("w")).as("wh"))
      .coalesce(1).write.mode("overwrite").parquet("/tmp/wordhash.parquet")
    // a few docs' minhash sigs for cross-checking slot math
    docs.filter(col("doc_id") < 5)
      .select(col("doc_id"),
        graft.functions.TextFunctions.minhashSignature(
          graft.functions.TextFunctions.tokens(col("text")), 64).as("sig"),
        graft.plans.SimHashExpr.simhash64(col("text")).as("simsig"))
      .coalesce(1).write.mode("overwrite").parquet("/tmp/sigs.parquet")
    spark.stop()
  }
}
