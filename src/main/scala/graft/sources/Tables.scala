package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed accessors for the driver-generated TPC-H-ish parquet tables
  * (TESTDATA.md). Reads are plain columnar parquet scans so Catalyst pushes
  * filters down and prunes columns at the file source — at 100 TB the scan
  * cost is dominated by `PushedFilters`/`ReadSchema`, so every query in
  * `graft.queries` selects only the columns it needs.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read nanos as long (legacy conf) and truncate to microseconds
    * with integer `div` (double division would lose precision at 1e18 ns).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
