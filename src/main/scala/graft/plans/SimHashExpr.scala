package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of a text column.
  *
  * Semantics: distinct non-empty whitespace tokens; per token the xxhash64
  * (seed 42, identical to `functions.xxhash64`); per bit a majority vote;
  * vote majorities compose the signature bit-for-bit like the
  * composed-Column reference implementation (TextFunctions.simhash64ViaColumns,
  * kept for the parity test).
  *
  * Why a custom Expression: the composed version needs 64 interpreted
  * higher-order-function passes over the token array per row — Spark's
  * lambda expressions don't join whole-stage codegen. This one is a single
  * tight JVM loop per row (`NativeExprKernels.simhash64`), and `doGenCode`
  * emits a static kernel call so the expression participates in
  * whole-stage codegen instead of forcing a fallback boundary.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(NativeExprKernels.simhash64(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NativeExprKernels.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHashExpr {
  /** Column wrapper for the native simhash. */
  def simhash64(c: Column): Column =
    GraftColumnBridge.toColumn(SimHash64Expr(GraftColumnBridge.toExpression(c)))
}
