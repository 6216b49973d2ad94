package graft

import org.apache.spark.sql.SparkSession

/** The library's session entry point: one place that encodes the engine's
  * deployment conventions, so a user of the reference switching to graft
  * starts from a correctly-configured session.
  *
  *  - `spark.sql.extensions=graft.plans.GraftExtensions`: the native
  *    expressions are SQL functions from the first query;
  *  - UTC session timezone (the engine's documented divergence from the
  *    reference's America/Toronto, SyncTickets.php:38);
  *  - AQE on (runtime re-planning, skew-join handling);
  *  - shuffle partitioning defaulted for the local harness — a cluster
  *    deployment overrides it to ~2-3x total executor cores.
  */
object GraftSession {

  /** A builder pre-loaded with the engine's conventions; callers chain
    * master/appName/conf overrides as usual and getOrCreate(). */
  def builder(shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)

  /** The local test/bench shape (local[n] with matching partitioning). */
  def local(cores: Int = 32): SparkSession =
    builder(shufflePartitions = cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
