package graft

import org.apache.spark.sql.functions._

/** Scratch main: phase-timed repeats of q208's exact body, hunting the
  * bimodal wall-clock the r13/r14 bench gates flagged (3.5 s in some
  * windows, 6.2 s in others, shuffle bytes bit-identical). Splits the
  * query into its serial jobs — edge-closure build+checkpoint, labels
  * checkpoint+count, each vote round, the final global sort — so the
  * slow mode names the phase that owns it. Runs N iterations in ONE
  * JVM (bench conditions: warm codegen, accumulated block-manager
  * state) and prints a per-phase table. */
object LpaModeProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(6)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def phase[A](tag: String, buf: StringBuilder)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      buf ++= f"$tag=${(System.nanoTime() - t0) / 1e9}%.2f "
      r
    }

    for (it <- 1 to iters) {
      val buf = new StringBuilder(f"iter $it%2d: ")
      val t0 = System.nanoTime()
      val li = graft.sources.Tables(spark, dir).lineitem
        .select(col("l_orderkey"), col("l_partkey"))
      val a = li.select(col("l_orderkey"), col("l_partkey").as("u"))
      val b = li.select(col("l_orderkey"), col("l_partkey").as("v"))
      val edges = a.join(b, Seq("l_orderkey")).filter(col("u") < col("v"))
        .select(col("u"), col("v"))
      val e = edges.select(
        col("u").cast("long").as("a"), col("v").cast("long").as("b"))
      val und = phase("closure", buf) {
        val norm = e.filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("a"),
            greatest(col("a"), col("b")).as("b"))
          .distinct()
        norm.unionAll(norm.select(col("b").as("a"), col("a").as("b")))
          .localCheckpoint(true)
      }
      var labels = phase("labels", buf) {
        und.select(col("a").as("node")).distinct()
          .withColumn("lab", col("node")).localCheckpoint(true)
      }
      val nNodes = phase("count", buf)(labels.count())
      for (r <- 1 to 2) {
        val next = phase(s"round$r", buf) {
          val labSide = labels.select(col("node").as("b"), col("lab"))
          und.join(broadcast(labSide), Seq("b"))
            .groupBy(col("a").as("node"), col("lab"))
            .agg(count(lit(1)).as("cnt"))
            .groupBy(col("node"))
            .agg(max(struct(col("cnt"), (-col("lab")).as("neg"))).as("w"))
            .select(col("node"), (-col("w.neg")).as("lab"))
            .localCheckpoint(true)
        }
        labels.unpersist()
        labels = next
      }
      phase("sort+noop", buf) {
        labels.select(col("node"), col("lab").as("label"))
          .orderBy(col("node"))
          .write.format("noop").mode("overwrite").save()
      }
      und.unpersist(); labels.unpersist()
      buf ++= f"TOTAL=${(System.nanoTime() - t0) / 1e9}%.2f nodes=$nNodes"
      println(buf.result())
    }
    spark.stop()
  }
}
