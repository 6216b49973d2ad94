package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scope A/B probe (not part of the API): times the contamination df
  * guard's two shapes at a given SF so the NOTES numbers stay reproducible.
  *   A = round-5 shape: count().over(Window.partitionBy(gram)) per side.
  *   B = round-6 shape: lazy localCheckpoint + groupBy(gram).count() +
  *       anti-join (what operators.Dedup.contamination now does).
  * Run: sbt "Test/runMain graft.DfGuardAB [sfDir]"
  */
object DfGuardAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables(spark, dir).documents
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val eval = docs.filter(col("doc_id") % 10 === 0)
    val n = 8; val maxDf = 1000L

    def postingsWindow(df: DataFrame, as: String) =
      df.select(col("doc_id").cast("long").as(as),
          explode(array_distinct(
            graft.functions.TextFunctions.shingles(col("text"), n))).as("gram"))
        .withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("gram")))
        .filter(col("df") <= maxDf).drop("df")

    def shape(kind: String): DataFrame = kind match {
      case "window" =>
        postingsWindow(train, "train_id")
          .join(postingsWindow(eval, "eval_id"), Seq("gram"))
          .groupBy(col("train_id"))
          .agg(countDistinct(col("gram")).as("n_shared_grams"),
            countDistinct(col("eval_id")).as("n_eval_docs"))
          .filter(col("n_shared_grams") >= 1L)
      case "aggregate" =>
        graft.operators.Dedup.contamination(
          train, eval, col("text"), col("doc_id"), n = n, maxDf = maxDf)
    }

    def time(kind: String): Double = {
      val t0 = System.nanoTime()
      shape(kind).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time("aggregate") // untimed warmup (JVM/codegen/parquet footers)
    for (kind <- Seq("window", "aggregate"); rep <- 1 to 3)
      println(f"== $kind rep$rep: ${time(kind)}%.2f s")
    spark.stop()
  }
}
