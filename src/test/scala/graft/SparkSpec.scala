package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test harness: one local SparkSession per JVM (getOrCreate) built
  * through GraftSession so specs run under the same conventions as the
  * driver's Verify/Bench sessions (extensions, UTC, AQE). Tests run
  * against sf0.001 for speed; the DuckDB oracle gate covers sf0.01.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.GraftSession.builder(shufflePartitions = 4)
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
}
