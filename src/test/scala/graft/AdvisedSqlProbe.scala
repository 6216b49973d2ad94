package graft

import org.apache.spark.sql.functions._

/** Scratch main: drive the GRAFT_ADVISE hint through plain spark.sql at
  * a broadcast and a salt operating point and print the executed plans —
  * the measurement harness behind the q232/q233 plan pins.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *   sbt "Test/runMain graft.AdvisedSqlProbe" */
object AdvisedSqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark.read.parquet(s"$dir/orders.parquet")
      .createOrReplaceTempView("orders")
    spark.read.parquet(s"$dir/customer.parquet")
      .createOrReplaceTempView("customer")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .createOrReplaceTempView("lineitem")

    // ---- broadcast point: dimension-sized customer, auto-broadcast OFF
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val bq = spark.sql("""
      SELECT /*+ GRAFT_ADVISE */ c_mktsegment,
        CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    println("=== broadcast point: executed plan ===")
    bq.collect().foreach(println)
    println(bq.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Join")).mkString("\n"))

    // un-advised control: same SQL, no hint — must NOT broadcast at -1
    val cq = spark.sql("""
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        round(sum(o_totalprice), 2) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    cq.collect()
    println("=== control (no hint): executed plan ===")
    println(cq.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Join")).mkString("\n"))

    // ---- salt point: manufactured hot key (10% of lineitem folds to
    // orderkey 1), thresholds at the q224 operating shape
    spark.conf.set("spark.graft.advisor.broadcastMaxRows", "0")
    spark.conf.set("spark.graft.advisor.skewFactor", "1.5")
    spark.conf.set("spark.graft.advisor.minSaltOutputRows", "100")
    spark.conf.set("spark.graft.advisor.maxSaltBuckets", "8")
    spark.conf.set("spark.graft.advisor.targetPartitions", "200000")
    val sq = spark.sql("""
      SELECT /*+ GRAFT_ADVISE */ k, CAST(count(*) AS BIGINT) AS n,
        round(sum(l_extendedprice), 2) AS amt
      FROM (SELECT CASE WHEN l_orderkey % 10 = 0 THEN 1 ELSE l_orderkey END
              AS k, l_extendedprice FROM lineitem) l
      JOIN (SELECT o_orderkey AS k, o_totalprice FROM orders) o USING (k)
      GROUP BY k ORDER BY n DESC LIMIT 5""")
    println("=== salt point: rows ===")
    sq.collect().foreach(println)
    println("=== salt point: executed joins/unions ===")
    println(sq.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Union") ||
        l.contains("__gsalt")).mkString("\n"))
    spark.stop()
  }
}
