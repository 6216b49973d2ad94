package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table. The reference's
  * incremental traits (SURVEY §2.10: resumable page offsets SC:17/ST:162,
  * page micro-batches SB:163-193, dedup-on-replay TP:353-373) map here:
  * source offsets+checkpoints replace --startPage, micro-batch triggers
  * replace the page loop, dropDuplicatesWithinWatermark replaces the dedup
  * probe.
  */
object EventStreams {

  /** events.parquet schema as stored (ts is TIMESTAMP(NANOS), which Spark
    * only reads as long via the legacy conf; convert with integer div). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-streaming read of the events table (micro-batched by the source). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Run a tumbling-window aggregation over the event stream to completion
    * (Trigger.AvailableNow + complete mode into a memory sink) and return
    * the result table. Batch-equivalent semantics — the oracle is the same
    * date_trunc SQL as the batch query. */
  def tumblingAggToTable(
      spark: SparkSession, dir: String, tableName: String): DataFrame = {
    val agg = readEventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total"))
    val q = agg.writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(tableName)
      .orderBy(col("window_start"), col("event_type"))
  }
}
