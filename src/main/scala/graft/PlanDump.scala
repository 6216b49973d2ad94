package graft

/** Scratch plan exporter (local dev only; the driver never runs it):
  * writes each named query's `.explain("formatted")` output to
  * `<outDir>/<name>_<tag>.txt` against `SPARK_GRAFT_SF_DIR` (default
  * sf0.1) — the optimization rounds' before/after plan artifacts
  * (plans/rNN/<query>_before.txt) in one command.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <query_name>...
  *
  * Building a query's DataFrame EXECUTES any run-to-completion lifecycle
  * inside it (the streaming `*ToTable` runners); for those the dumped
  * plan is the final read-back — the per-batch plans live in the
  * operators and are discussed in OPTIMIZATION notes instead. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val short = name.takeWhile(_ != '_')
      java.nio.file.Files.write(
        outDir.resolve(s"${short}_$tag.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] $name -> ${short}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
