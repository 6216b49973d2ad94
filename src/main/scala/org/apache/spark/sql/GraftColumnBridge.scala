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

  /** Wrap an already-analyzed logical subtree as a DataFrame — the hop
    * [[graft.plans.AdvisedEquiJoinRewrite]] needs to run its bounded
    * sketch pass over a join child from INSIDE the optimizer (the same
    * eager-planning move AQE makes with query stages, scoped to one
    * aggregate per join side). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
