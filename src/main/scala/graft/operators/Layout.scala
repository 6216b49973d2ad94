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
}
