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

  /** Dedup-on-replay (SURVEY §2.10: --checkDuplicates TP:353-373 as a
    * streaming primitive): event-time watermark + state-store dedup on the
    * record key. Duplicate arrivals inside the watermark horizon are
    * dropped exactly once. */
  def dedupedEventStream(spark: SparkSession, dir: String): DataFrame =
    readEventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run the deduped stream to completion and return the sink table. */
  def dedupToTable(spark: SparkSession, dir: String, tableName: String): DataFrame = {
    val q = dedupedEventStream(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .writeStream.format("memory").queryName(tableName)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(tableName)
  }

  /** Custom keyed state via mapGroupsWithState (§2.10 "custom state"
    * surface): a running per-user event count held in the state store,
    * emitted in Update mode each micro-batch. */
  def statefulUserCounts(spark: SparkSession, dir: String, tableName: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val counts = readEventStream(spark, dir)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[(Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + events.size
          state.update(total)
          (user, total)
      }
      .toDF("user_id", "n_events")
    val q = counts.writeStream.format("memory").queryName(tableName)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // in Update mode each batch appends its latest value; keep the final
    // state per user
    spark.table(tableName)
      .groupBy(col("user_id"))
      .agg(org.apache.spark.sql.functions.max(col("n_events")).as("n_events"))
  }
}
