package graft

import org.apache.spark.sql.functions._

/** Test-scope scaling probe (not part of the API): times
  * operators.Graph.triangleCounts (degree-oriented edge-iterator) against
  * the naive wedge-join enumeration on a synthetic power-law-ish graph
  * with one heavy hub — the shape where id-ordered wedge joins blow up —
  * so NOTES can carry a MEASURED speedup instead of a plan-shape claim
  * alone. Both paths must return identical per-node counts (asserted via
  * total, which is 3× the triangle count).
  * Run: sbt "Test/runMain graft.TriangleProbe [nNodes] [avgDeg]"
  */
object TriangleProbe {
  def main(args: Array[String]): Unit = {
    val nNodes = args.headOption.map(_.toInt).getOrElse(20000)
    val avgDeg = args.lift(1).map(_.toInt).getOrElse(40)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    // random-ish canonical edges over [0, nNodes) plus a MID-ID hub
    // connected to every 4th node: id-ordered enumeration splits a hub's
    // edges by id into in/out halves and generates in×out ≈ (d/2)²
    // wedges through it — quadratic in hub degree. (A hub at id 0 would
    // be the naive plan's BEST case: all edges point out, zero wedges
    // through it. Real graphs don't let you pick the hub's id.) Degree
    // orientation is immune: the hub sorts LAST, out-degree ~0.
    val nEdges = nNodes.toLong * avgDeg / 2
    val hubId = nNodes.toLong / 2 + 1
    val rand = spark.range(nEdges)
      .select(
        pmod(xxhash64(col("id")), lit(nNodes.toLong)).as("x"),
        pmod(xxhash64(col("id"), lit(13L)), lit(nNodes.toLong)).as("y"))
      .select(least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
      .filter(col("u") < col("v"))
    val hub = spark.range(0L, nNodes.toLong / 4)
      .select((col("id") * 4L).as("o"))
      .filter(col("o") =!= hubId)
      .select(least(col("o"), lit(hubId)).as("u"),
        greatest(col("o"), lit(hubId)).as("v"))
    val edges = rand.unionAll(hub).distinct().localCheckpoint(true)

    def timeTotal(df: => org.apache.spark.sql.DataFrame): (Long, Long) = {
      val t0 = System.nanoTime()
      val total = df.agg(sum(col("n_triangles"))).collect()(0).getLong(0)
      ((System.nanoTime() - t0) / 1000000L, total)
    }
    def naive(): org.apache.spark.sql.DataFrame = {
      // id-ordered wedge join: u<v<w via two self-joins, no degree
      // orientation, wedges materialized through the closing shuffle
      val e1 = edges.select(col("u"), col("v"))
      val e2 = edges.select(col("u").as("v"), col("v").as("w"))
      val e3 = edges.select(col("u").as("u3"), col("v").as("w3"))
      e1.join(e2, Seq("v"))
        .join(e3, col("u") === col("u3") && col("w") === col("w3"))
        .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    }
    def fast(): org.apache.spark.sql.DataFrame =
      graft.operators.Graph.triangleCounts(edges, "u", "v")

    timeTotal(naive()); timeTotal(fast()) // warm both
    val (tNaive, totNaive) = timeTotal(naive())
    val (tFast, totFast) = timeTotal(fast())
    require(totNaive == totFast, s"result mismatch: $totNaive vs $totFast")
    println(f"[triangle-probe] nodes=$nNodes avgdeg=$avgDeg " +
      f"edges=${edges.count()} triangles=${totFast / 3} " +
      f"naive=${tNaive}ms edge-iterator=${tFast}ms " +
      f"speedup=${tNaive.toDouble / tFast}%.1fx")
    spark.stop()
  }
}
