package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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
  * tight JVM loop per row (one virtual call per ROW, not per token), the
  * "custom Catalyst Expression" tier of the build guidance. CodegenFallback
  * costs one boundary per row, negligible next to the per-token work.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val tokens = ws.split(input.asInstanceOf[UTF8String].toString.trim)
    val seen = new java.util.HashSet[String](math.max(16, tokens.length * 2))
    val counts = new Array[Int](64)
    var n = 0
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (t.nonEmpty && seen.add(t)) {
        n += 1
        val h = XXH64.hashUTF8String(UTF8String.fromString(t), 42L)
        var b = 0
        while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) * 2 > n) sig |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHashExpr {
  /** Column wrapper for the native simhash. */
  def simhash64(c: Column): Column =
    GraftColumnBridge.toColumn(SimHash64Expr(GraftColumnBridge.toExpression(c)))
}
