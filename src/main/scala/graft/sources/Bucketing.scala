package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location — the shuffle-elimination path for big-big
  * joins the 100 TB design leans on (SURVEY §2.5: at scale Catalyst picks
  * SMJ for large-large joins; bucketing both sides on the join key removes
  * the per-query exchange entirely and pre-sorts the merge input).
  *
  * A fact table bucketed once at ingest amortizes its shuffle across every
  * subsequent join on that key: the join plan becomes
  * FileScan(bucketed) -> SortMergeJoin with NO Exchange on either side.
  * Bucket counts should divide evenly into executor cores and keep each
  * bucket's partition under the executor memory budget (at 100 TB:
  * thousands of buckets, not 8 — the number is the test scale).
  */
object Bucketing {

  /** Persist `df` as a parquet-backed bucketed external table (bucketed +
    * sorted by `key`), replacing any prior registration. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int, path: String): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Bucket count for a co-bucketed table FAMILY, derived from the
    * family's LARGEST member and the cluster width
    * ([[graft.GraftSession.defaultBuckets]]) instead of caller-picked.
    * One count for the whole family: a shuffle-free sort-merge join
    * needs both sides on the SAME bucket count (differing power-of-two
    * counts survive only behind `coalesceBucketsInJoin`, which coalesces
    * — i.e. under-parallelizes — the wider side), so the biggest table
    * sets the count and every smaller co-joined table rides it. The one
    * extra `count()` pass runs at ingest, amortized against every later
    * join on the layout. */
  def derivedBuckets(largest: DataFrame, clusterCores: Int): Int =
    graft.GraftSession.defaultBuckets(largest.count(), clusterCores)

  /** Equi-join two tables bucketed on their join keys — co-located, so the
    * plan carries no Exchange (verify with .explain). */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
