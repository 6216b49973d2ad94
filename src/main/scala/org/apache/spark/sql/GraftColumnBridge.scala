package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` Column⇄Expression converters. Spark 4 moved
  * the conversion into `classic.ExpressionUtils` when Column became a
  * ColumnNode wrapper; third-party Catalyst expressions (graft.plans.*)
  * need exactly these two hops and nothing else from the internals.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Canonical float/double normalization (`-0.0` → `0.0`, all NaN bit
    * patterns → the canonical NaN), recursively through structs/arrays —
    * the SAME [[catalyst.optimizer.NormalizeFloatingNumbers]] pass Spark
    * applies to join/group keys before hashing. The advisory's hot-key
    * routing renders keys AS STRINGS (`'-0.0'` ≠ `'0.0'`), so without
    * this hop a mixed-sign-zero matching pair could route to different
    * salt legs and be dropped; normalizing with Spark's own expression
    * keeps the rendering aligned with join equality. No-op on types
    * that need no normalization (the pass checks first). */
  def normalizeFloats(e: Expression): Expression =
    catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** Wrap an already-analyzed logical subtree as a DataFrame — the hop
    * [[graft.plans.AdvisedEquiJoinRewrite]] needs to run its bounded
    * sketch pass over a join child from INSIDE the optimizer (the same
    * eager-planning move AQE makes with query stages, scoped to one
    * aggregate per join side). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
