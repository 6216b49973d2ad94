package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventStreams
import graft.operators.Skew

class StreamingSpec extends SparkSpec {

  test("streaming dedup-on-replay drops nothing on unique keys, all on replay") {
    val got = EventStreams.dedupToTable(spark, sfDir, "spec_dedup_out")
    val batch = Tables(spark, sfDir).events
    assert(got.count() === batch.count()) // event_id unique -> nothing dropped
    assert(got.select("event_id").distinct().count() === got.count())
  }

  test("stateful per-user counts match the batch groupBy") {
    val got = EventStreams.statefulUserCounts(spark, sfDir, "spec_state_out")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables(spark, sfDir).events
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("salted equi-join returns exactly the plain join's rows") {
    val t = Tables(spark, sfDir)
    val (li, pt) = (t.lineitem, t.part)
    val plain = li.join(pt, li("l_partkey") === pt("p_partkey"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedEquiJoin(li, pt,
        "l_partkey", "p_partkey",
        saltSource = col("l_orderkey") * lit(8) + col("l_linenumber"), buckets = 8)
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === plain)
  }
}
