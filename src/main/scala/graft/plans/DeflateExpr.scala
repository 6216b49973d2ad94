package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native DEFLATE-compressed length of a text column — the input to the
  * compression-ratio quality heuristic (highly repetitive or templated
  * documents compress far below natural prose; both tails of the ratio
  * distribution are curation signals, the same device Dolma/CCNet-style
  * pipelines run with gzip).
  *
  * Why a custom Expression: there is no built-in compressed-size
  * function, and a Scala UDF would box every row and fence whole-stage
  * codegen. This is one static-kernel call per row (`doGenCode` emits
  * it directly into the generated code), map-only and shuffle-free.
  *
  * Determinism: fixed Deflater level (6), fixed strategy, no preset
  * dictionary, raw deflate (`nowrap = true`) — byte-deterministic for a
  * given zlib implementation. The JDK ships its own zlib, so results
  * are stable across a deployment pinned to one JDK; the value is a
  * heuristic SIGNAL, not portable content identity — exact lengths are
  * never baked into oracles, only ratio algebra over the exported
  * column (ScalaTest pins structure: determinism, repetition
  * monotonicity, bounds).
  */
case class DeflateLenExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(NativeExprKernels.deflateLen(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NativeExprKernels.deflateLen($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLenExpr =
    copy(child = newChild)
}

object DeflateExpr {
  /** DEFLATE(level 6, raw) output size in bytes of the UTF-8 text. */
  def deflateLen(c: Column): Column =
    GraftColumnBridge.toColumn(DeflateLenExpr(GraftColumnBridge.toExpression(c)))
}
