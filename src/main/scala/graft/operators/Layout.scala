package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time data layout for scan pruning. At 100 TB the cheapest query
  * is the one that never opens the file: parquet row-group min/max stats
  * (and partition-level ranges) prune scans only if the writer clustered
  * rows so each file covers a NARROW range of the filtered columns. A
  * single-column sort buys pruning on that column and destroys it for
  * every other; Z-ordering (Morton-interleaving the bits of two key
  * columns) bounds BOTH dimensions per file — the standard multi-column
  * clustering device (the same trick Delta/Iceberg expose as `ZORDER BY` /
  * sort-order transforms, built here from first principles).
  *
  * Everything is map-side: the z-value is pure bit algebra inside
  * whole-stage codegen, and the layout itself is one
  * `repartitionByRange` (a single range-exchange — the shuffle any
  * clustered write pays) plus an in-partition sort that feeds the
  * writer's stats.
  */
object Layout {

  /** Morton (Z-curve) interleave of two non-negative integer columns:
    * bit i of `x` lands at position 2i+1, bit i of `y` at 2i. `bits` = 21
    * covers keys up to 2^21 per dimension inside one signed long. Pure
    * +/shift/mask algebra — exactly restatable in ANSI SQL, so layouts
    * are cross-engine verifiable. */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** Cluster `df` into `numPartitions` write units by the Z-curve over
    * `(x, y)`: one range exchange on the z-value, rows sorted by it
    * within each partition so parquet row-group stats stay tight on both
    * dimensions. Drop-in before `.write` — the output carries no helper
    * columns. */
  def zorderLayout(
      df: DataFrame,
      x: Column,
      y: Column,
      numPartitions: Int,
      bits: Int = 21): DataFrame =
    df.withColumn("__graft_z", zValue(x, y, bits))
      .repartitionByRange(numPartitions, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")

  /** Rendezvous (highest-random-weight) shard assignment — the
    * placement rule with MINIMAL disruption under membership change
    * (Thaler & Ravishankar 1998; what Ceph/Riak-style placement and
    * cache routing use where modulo hashing reshuffles almost every
    * key): each key's owner is `argmax over nodes of XXH64(nodeId,
    * seed = XXH64(key, 42))`. Because per-node scores are independent
    * of the member SET, removing a node reassigns EXACTLY that node's
    * keys and adding one steals only the keys it now wins — ~1/n of
    * them (pinned in LayoutSpec); `pmod(hash, n)` would move (n−1)/n
    * of the corpus. Node ids are the caller's STABLE identities (never
    * renumber survivors — the identity IS the score stream).
    *
    * Map-only codegen'd column algebra (one chained-hash + one
    * array_max per row, no shuffle); the argmax tie-breaks to the
    * LOWEST node id via the negated-id struct max (ties are
    * 2⁻⁶⁴-improbable but the rule must still be total for
    * restatability — the hash chain is the q200/q207 closed-formula
    * XXH64, so a SQL oracle re-derives every assignment). */
  def rendezvousAssign(
      df: DataFrame, key: Column, nodeIds: Seq[Long],
      ownerCol: String = "owner"): DataFrame = {
    require(nodeIds.nonEmpty, "rendezvousAssign needs at least one node")
    require(nodeIds.distinct.size == nodeIds.size,
      s"duplicate node ids: $nodeIds")
    val scored = array(nodeIds.map(n =>
      struct(xxhash64(key, lit(n)).as("h"), lit(-n).as("negId"))): _*)
    df.withColumn(ownerCol,
      (-array_max(scored).getField("negId")).cast("long"))
  }
}
