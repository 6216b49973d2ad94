package graft

import org.apache.spark.sql.functions._

/** Scratch main: inspect ONE label-propagation round's executed plan at
  * sf0.1 (the Bench top-shuffle mover) — the question is whether the
  * edges ⋈ labels join broadcasts the model-sized labels frame (round
  * cost = one partial-agg shuffle of (node, lab) pairs) or degrades to
  * a sort-merge join that re-shuffles the 6M-row edge closure per
  * round. Mirrors Graph.labelPropagation's round body expression by
  * expression. */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.sources.Tables(spark, "/root/testdata/sf0.1").lineitem
      .select(col("l_orderkey"), col("l_partkey"))
    val a = li.select(col("l_orderkey"), col("l_partkey").as("u"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("v"))
    val edges = a.join(b, Seq("l_orderkey")).filter(col("u") < col("v"))
      .select(col("u"), col("v")).distinct()
    val e = edges.select(col("u").cast("long").as("a"), col("v").cast("long").as("b"))
    val und = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint(true)
    val labels = und.select(col("a").as("node")).distinct()
      .withColumn("lab", col("node")).localCheckpoint(true)
    println(s"== edges=${und.count()} nodes=${labels.count()}")
    val votes = und
      .join(broadcast(labels.select(col("node").as("b"), col("lab"))),
        Seq("b"))
      .groupBy(col("a").as("node"), col("lab"))
      .agg(count(lit(1)).as("cnt"))
    val next = votes.groupBy(col("node"))
      .agg(max(struct(col("cnt"), (-col("lab")).as("neg"))).as("w"))
      .select(col("node"), (-col("w.neg")).as("lab"))
    val t0 = System.nanoTime()
    next.write.format("noop").mode("overwrite").save()
    println(s"== one round: ${(System.nanoTime() - t0) / 1e9}s")
    next.explain("formatted")
    spark.stop()
  }
}
