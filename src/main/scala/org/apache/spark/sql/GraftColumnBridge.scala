package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column⇄Expression converters. Spark 4 moved
  * the conversion into `classic.ExpressionUtils` when Column became a
  * ColumnNode wrapper; third-party Catalyst expressions (graft.plans.*)
  * need exactly these two hops and nothing else from the internals.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
