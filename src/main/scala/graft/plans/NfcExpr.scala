package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a text column — the canonical-composition
  * pass a multilingual curation pipeline runs before ANY hash-based
  * operator: "é" as U+00E9 and as e + U+0301 are the same text to a
  * reader but different bytes to every fingerprint, shingle, and join
  * key in this library, so un-normalized corpora silently under-dedup
  * and split their n-gram statistics across byte variants.
  *
  * Why a custom Expression: Spark has no built-in Unicode normalizer,
  * and a Scala UDF would box every row and fence whole-stage codegen;
  * this is one static-kernel call per row (java.text.Normalizer is in
  * the JDK). NFC (not NFKC): canonical equivalence only — compatibility
  * folding (ﬁ → fi, ² → 2) changes content and belongs to a separate,
  * opt-in policy decision.
  *
  * Determinism: Normalizer.NFC implements the Unicode canonical
  * composition algorithm, stable for a deployment pinned to one JDK;
  * DuckDB's nfc_normalize implements the same standard, which is what
  * lets q153's oracle re-derive normalized lengths exactly. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NativeExprKernels.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NativeExprKernels.nfcNormalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcExpr {
  /** Unicode NFC (canonical composition) of the text. */
  def nfcNormalize(c: Column): Column =
    GraftColumnBridge.toColumn(NfcNormalizeExpr(GraftColumnBridge.toExpression(c)))
}
