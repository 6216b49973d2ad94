package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.OrderedFold.orderedSum

/** Graph centrality over corpus-derived similarity graphs. PageRank on
  * the kNN graph is the standard centrality-based curation device: rank
  * documents by how "representative" their neighborhood is, then keep
  * high-centrality exemplars (or drop low-centrality outliers) when
  * subsampling a 100 TB corpus. Complements the connected-components
  * dedup pass ([[Dedup]]): CC finds duplicate clusters, PageRank orders
  * what remains.
  *
  * Scale shape:
  *  - the edge list is the unit of distribution; every iteration is one
  *    shuffle-join on `src` (edges ⋈ ranks) plus one aggregation shuffle
  *    on `dst` — the Pregel plan, O(iterations) rounds with partitioning
  *    reusable across rounds (edges are checkpointed once, ranks stay
  *    keyed by node);
  *  - driver state is O(1): the node count and the per-iteration
  *    dangling-mass scalar — never a rank vector;
  *  - determinism: in-neighbor contributions fold in pinned `src` order
  *    ([[graft.plans.OrderedSumAgg]]) and each iteration's ranks snap to
  *    `snapDp` decimals, so repeated runs — and a fold-order-pinned
  *    re-derivation in another engine — are bit-identical. All rank
  *    arithmetic is +,·,/ (no libm), so cross-engine exactness holds
  *    without tolerance bands. The snap is `floor(x·10^dp + 0.5)/10^dp`
  *    in plain IEEE ops — deliberately NOT Spark's `round()`, whose
  *    double path rounds the SHORTEST DECIMAL REPRESENTATION
  *    (BigDecimal.valueOf) and so disagrees with numeric-rounding
  *    engines by one final digit exactly at repr half-boundaries
  *    (observed once in 500 ranks at 9dp).
  */
object Graph {

  /** Damped PageRank with a fixed iteration count over a directed edge
    * list. Returns `(node, pr)` for every node appearing as source or
    * destination. Dangling nodes (no out-edges) redistribute their mass
    * uniformly each iteration — the scalar ride-along keeps the operator
    * correct on general graphs while costing one model-sized aggregate.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      iterations: Int = 5,
      damping: Double = 0.85,
      snapDp: Int = 9): DataFrame = {
    val e = edges.select(srcCol.as("src"), dstCol.as("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count().toDouble
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val teleport = (1.0 - damping) / n

    // The dangling NODE SET is iteration-invariant (only its mass
    // changes); detect it once, and skip the per-iteration scalar job
    // entirely on graphs where every node has out-edges (kNN graphs by
    // construction) — `+ 0.0` below is then a bit-exact no-op.
    val danglingNodes = nodes
      .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
      .localCheckpoint()
    val hasDangling = danglingNodes.limit(1).count() > 0

    var ranks = nodes.select(col("node"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to iterations) {
      // Dangling mass: global scalar (pinned node-order fold).
      val dmShare =
        if (!hasDangling) 0.0
        else {
          val dmRow = ranks.join(danglingNodes, Seq("node"), "left_semi")
            .agg(orderedSum(col("node"), col("pr")).as("dm"))
            .collect()(0)
          (if (dmRow.isNullAt(0)) 0.0 else dmRow.getDouble(0)) / n
        }

      val summed = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"), col("src"),
          (col("pr") / col("outdeg").cast("double")).as("contrib"))
        .groupBy(col("node"))
        .agg(orderedSum(col("src"), col("contrib")).as("insum"))

      val scale = math.pow(10.0, snapDp)
      val raw = lit(teleport) + lit(damping) *
        (coalesce(col("insum"), lit(0.0)) + lit(dmShare))
      ranks = nodes.join(summed, Seq("node"), "left")
        .select(col("node"),
          (floor(raw * lit(scale) + lit(0.5)).cast("double") / lit(scale))
            .as("pr"))
        .localCheckpoint()
    }
    ranks
  }
}
