package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus, when the
  * semantics are ANSI-SQL-expressible, a DuckDB oracle query used by the
  * driver's correctness gate. Oracle-less queries get a rows-only check.
  *
  * Conventions that keep the oracle hash-compare stable:
  *  - every output column is explicitly aliased, identically on both sides;
  *  - every query ends in a total deterministic ORDER BY;
  *  - floating aggregates are rounded (2dp money, 4dp ratios) on both sides;
  *  - timestamps/dates are emitted as formatted strings, never raw temporal
  *    types (parquet logical-type annotations differ between writers);
  *  - DuckDB `sum(INTEGER)` returns HUGEINT, so integer sums are CAST to
  *    BIGINT in the oracle to match Spark's LongType.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def all: Seq[Q]

  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  final def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
