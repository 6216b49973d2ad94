package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every query pack; each pack row is one operator line from
  * SURVEY.md §2 (or a north-star LLM-pipeline extension).
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    RelationalQueries, TextQueries, VectorQueries, EventQueries,
    MigrationQueries, MultimodalQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. The
    * literal token `__VERIFY_OUT__` (used by the q38/q39 signature-fixture
    * oracles) is replaced by graft.Verify with the absolute dump dir, so
    * an oracle can read a sibling query's parquet output. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
