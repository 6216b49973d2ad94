package graft

import org.apache.spark.sql.functions._

/** Scratch main (local dev only): per-partition cost balance of q184's
  * wedge stage. The adjacency joins are broadcast-hash, so the
  * array_intersect stage is map-side over `oriented`'s partitioning —
  * wall time is the heaviest partition's sum of |N(u)|+|N(v)|. Prints
  * that distribution for the co-purchase graph at SPARK_GRAFT_SF_DIR.
  * Run: sbt "Test/runMain graft.WedgeBalanceProbe"
  */
object WedgeBalanceProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val a = li.select(col("l_orderkey"), col("l_partkey").as("u"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("v"))
    val edges = a.join(b, Seq("l_orderkey"))
      .filter(col("u") < col("v"))
      .select(col("u"), col("v")).distinct()
      .localCheckpoint(true)
    val deg = edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("node").as("u"), col("deg").as("da")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("db")), Seq("v"))
    val oriented = withDeg.select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst")))
          .as("o"))
      .select(col("o.src"), col("o.dst"))
      .localCheckpoint(true)
    val adj = oriented.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("nbrs")).localCheckpoint(true)
    val cost = oriented
      .join(adj.select(col("src"), size(col("nbrs")).as("cu")), Seq("src"))
      .join(adj.select(col("src").as("dst"), size(col("nbrs")).as("cv")),
        Seq("dst"))
      .select(spark_partition_id().as("pid"),
        (col("cu") + col("cv")).as("c"))
      .groupBy(col("pid")).agg(sum(col("c")).as("cost"),
        count(lit(1)).as("rows"))
      .orderBy(col("cost").desc)
    cost.show(8, false)
    val st = cost.agg(max(col("cost")), sum(col("cost")),
      count(lit(1))).head()
    println(f"== max-partition cost ${st.getLong(0)}%,d of ${st.getLong(1)}%,d " +
      f"across ${st.getLong(2)} partitions (balance x${st.getLong(0) * st.getLong(2).toDouble / st.getLong(1)}%.1f)")
    spark.stop()
  }
}
