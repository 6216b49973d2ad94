package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the signature/vector hot paths.
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) evaluate
  * their lambdas interpreted, outside whole-stage codegen; for per-element
  * work like 64-slot minhash signatures or 64-dim dot products that costs
  * an interpreted dispatch + allocation per element. Each expression here
  * is one tight JVM loop per row (in `NativeExprKernels`, shared by the
  * interpreted path and `doGenCode`), parity-tested bit-for-bit against its
  * composed-Column reference (see *ViaColumns in Text/VectorFunctions).
  * All of them participate in whole-stage codegen: the generated code is a
  * single static kernel call per row, so the surrounding operators stay in
  * one WholeStageCodegen span.
  */

private object Kernel {
  /** fully-qualified callee for generated Java */
  val fq = "graft.plans.NativeExprKernels"
}

/** MinHash signature from pre-hashed elements (array<long>): slot k =
  * min over elements of xxhash64(h, k) — identical hash chaining to
  * functions.xxhash64(h, lit(k)) (seed 42, then Int k folded in). */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    NativeExprKernels.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${Kernel.fq}.minhashSig($c, $numHashes);")

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
}

/** Shingle statistics over whitespace tokens: (n_shingles, n_distinct) for
  * word n-grams joined with single spaces — one pass, one HashSet. */
case class ShingleStatsExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_shingles", LongType, nullable = false),
    StructField("n_distinct_shingles", LongType, nullable = false)))
  override def prettyName: String = "shingle_stats"

  override def nullSafeEval(input: Any): Any =
    NativeExprKernels.shingleStats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${Kernel.fq}.shingleStats($c, $n);")

  override protected def withNewChildInternal(c: Expression): ShingleStatsExpr =
    copy(child = c)
}

/** Repetition profile for quality filtering (Gopher/FineWeb-style rules):
  * duplicate-line counts + the chars their copies occupy, and the top word
  * n-gram's dominance — raw counts in one pass, one HashMap each. */
case class RepetitionStatsExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_dup_lines", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("top_ngram_count", LongType, nullable = false),
    StructField("n_ngrams", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    NativeExprKernels.repetitionStats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${Kernel.fq}.repetitionStats($c, $n);")

  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
}

/** Cosine similarity of two numeric arrays: elements widened to double,
  * sequential accumulation — the same IEEE op order as the composed
  * cast-then-zip_with-then-aggregate reference, so results are bitwise
  * identical. Element access is specialized by a type code resolved at
  * plan time (double/float/long/int). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def code(dt: DataType): Int =
    dt.asInstanceOf[ArrayType].elementType match {
      case DoubleType  => NativeExprKernels.ElemDouble
      case FloatType   => NativeExprKernels.ElemFloat
      case LongType    => NativeExprKernels.ElemLong
      case IntegerType => NativeExprKernels.ElemInt
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }
  @transient private lazy val leftCode = code(left.dataType)
  @transient private lazy val rightCode = code(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    NativeExprKernels.cosineSim(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftCode, rightCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = ${Kernel.fq}.cosineSim($a, $b, $leftCode, $rightCode);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

/** Set Jaccard of two SORTED long arrays via a two-pointer merge walk —
  * no per-row hash sets, no materialized intersect/union arrays (the
  * array_intersect+array_union form allocates both per pair; at 1.4M
  * candidate pairs that was the dedup verify bottleneck). Inputs MUST be
  * sorted ascending and distinct (Dedup sorts once at hashing time). */
case class JaccardSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    NativeExprKernels.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = ${Kernel.fq}.jaccardSorted($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedExpr =
    copy(left = l, right = r)
}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): rolling
  * hashes of character k-grams over the normalized text, keeping the
  * minimum hash of each sliding window (rightmost on ties) and deduping
  * consecutive picks. Guarantees any shared substring of length
  * >= k + window - 1 contributes at least one common fingerprint — the
  * containment-dedup primitive exact/MinHash dedup can't provide. */
case class WinnowFingerprintsExpr(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    NativeExprKernels.winnowFingerprints(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Kernel.fq}.winnowFingerprints($c, $k, $window);")

  override protected def withNewChildInternal(c: Expression): WinnowFingerprintsExpr =
    copy(child = c)
}

/** Random-hyperplane LSH signature (see NativeExprKernels.lshSignature).
  * `planes` is the flattened row-major nbits x dim matrix; generated code
  * receives it as a double[] reference object, so the whole signature is
  * one static call per row inside whole-stage codegen. */
case class LshSignatureExpr(child: Expression, planes: Seq[Double], nbits: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_signature"

  @transient private lazy val planesArr: Array[Double] = planes.toArray
  @transient private lazy val elemCode: Int =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType  => NativeExprKernels.ElemDouble
      case FloatType   => NativeExprKernels.ElemFloat
      case LongType    => NativeExprKernels.ElemLong
      case IntegerType => NativeExprKernels.ElemInt
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }

  override def nullSafeEval(input: Any): Any =
    NativeExprKernels.lshSignature(input.asInstanceOf[ArrayData], planesArr, nbits, elemCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planesArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Kernel.fq}.lshSignature($c, $ref, $nbits, $elemCode);")
  }

  override protected def withNewChildInternal(c: Expression): LshSignatureExpr =
    copy(child = c)
}

/** Product-quantization encode (see NativeExprKernels.pqEncode): all m
  * nearest-codeword searches in one loop per row, codebook shipped as a
  * flattened double[] reference object — the composed form ran m×ksub
  * interpreted aggregate() lambdas per row and its codegen alone dwarfed
  * the fixture-scale compute. */
/** Max-cosine scan against a driver-collected eval matrix (flattened
  * row-major, ids ascending): one tight loop per corpus row — the
  * decontamination hot path. (best_cos, best_id) as a struct; cosines
  * 4dp HALF_UP inside the loop so argmax ties resolve on the ROUNDED
  * value (smallest id wins), matching the SQL-restatable semantics. */
case class BestCosineExpr(
    child: Expression, evals: Seq[Double], ids: Seq[Long],
    norms: Seq[Double], dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("bc", DoubleType, nullable = false),
    StructField("bid", LongType, nullable = false)))
  override def prettyName: String = "best_cosine"

  @transient private lazy val evalsArr: Array[Double] = evals.toArray
  @transient private lazy val idsArr: Array[Long] = ids.toArray
  @transient private lazy val normsArr: Array[Double] = norms.toArray
  @transient private lazy val elemCode: Int =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType  => NativeExprKernels.ElemDouble
      case FloatType   => NativeExprKernels.ElemFloat
      case LongType    => NativeExprKernels.ElemLong
      case IntegerType => NativeExprKernels.ElemInt
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }

  override def nullSafeEval(input: Any): Any =
    NativeExprKernels.bestCosine(
      input.asInstanceOf[ArrayData], evalsArr, idsArr, normsArr, dim, elemCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evRef = ctx.addReferenceObj("bcEvals", evalsArr, "double[]")
    val idRef = ctx.addReferenceObj("bcIds", idsArr, "long[]")
    val nmRef = ctx.addReferenceObj("bcNorms", normsArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Kernel.fq}.bestCosine($c, $evRef, $idRef, $nmRef, $dim, $elemCode);")
  }

  override protected def withNewChildInternal(c: Expression): BestCosineExpr =
    copy(child = c)
}

case class PqEncodeExpr(
    child: Expression, books: Seq[Double], m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_encode"

  @transient private lazy val booksArr: Array[Double] = books.toArray
  @transient private lazy val elemCode: Int =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType  => NativeExprKernels.ElemDouble
      case FloatType   => NativeExprKernels.ElemFloat
      case LongType    => NativeExprKernels.ElemLong
      case IntegerType => NativeExprKernels.ElemInt
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }

  override def nullSafeEval(input: Any): Any =
    NativeExprKernels.pqEncode(
      input.asInstanceOf[ArrayData], booksArr, m, ksub, dsub, elemCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", booksArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Kernel.fq}.pqEncode($c, $ref, $m, $ksub, $dsub, $elemCode);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** Word n-gram shingles as one tight loop per row (see
  * NativeExprKernels.shingles) — the tokenization hot path of the whole
  * gram family (MinHash, winnowing, spans, decontamination, Jaccard,
  * heavy hitters). Null propagates; the Column wrapper coalesces to []
  * to preserve the composed form's null contract. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any =
    NativeExprKernels.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Kernel.fq}.shingles($c, $n);")

  override protected def withNewChildInternal(c: Expression): ShinglesExpr =
    copy(child = c)
}

/** Decontamination scan prefilter (see NativeExprKernels.containsEvalGram):
  * one codegen'd pass per document against a driver-collected, sorted
  * eval-gram hash set — no corpus-side explode, no shuffle. The 100 TB
  * shape: the full corpus meets only this map-only filter; only the
  * (tiny) candidate set ever shuffles into the exact confirm join. */
case class ContainsEvalGramExpr(child: Expression, hashes: Seq[Long], n: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "contains_eval_gram"

  @transient private lazy val sortedArr: Array[Long] = {
    val a = hashes.toArray
    java.util.Arrays.sort(a)
    a
  }

  override def nullSafeEval(input: Any): Any =
    NativeExprKernels.containsEvalGram(input.asInstanceOf[UTF8String], n, sortedArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("evalGramHashes", sortedArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Kernel.fq}.containsEvalGram($c, $n, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): ContainsEvalGramExpr =
    copy(child = c)
}

/** [[ContainsEvalGramExpr]] with a Bloom filter in place of the exact
  * sorted hash set (see NativeExprKernels.containsEvalGramBloom): the
  * broadcast state shrinks from 64 bits/gram to `bitsPerGram` (~12), which
  * is what keeps a billion-gram eval suite's prefilter executor-resident
  * at 100 TB. One-sided by construction — a Bloom can only ADD candidates,
  * and the downstream confirm join is string-equal. */
case class ContainsEvalGramBloomExpr(
    child: Expression, bits: Seq[Long], k: Int, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "contains_eval_gram_bloom"

  @transient private lazy val bitsArr: Array[Long] = bits.toArray

  override def nullSafeEval(input: Any): Any =
    NativeExprKernels.containsEvalGramBloom(
      input.asInstanceOf[UTF8String], n, bitsArr, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("evalGramBloomBits", bitsArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${Kernel.fq}.containsEvalGramBloom($c, $n, $ref, $k);")
  }

  override protected def withNewChildInternal(c: Expression): ContainsEvalGramBloomExpr =
    copy(child = c)
}

object NativeExprs {
  def minhashSignature(hashes: Column, numHashes: Int): Column =
    toColumn(MinHashSigExpr(toExpression(hashes), numHashes))
  def shingleStats(text: Column, n: Int): Column =
    toColumn(ShingleStatsExpr(toExpression(text), n))

  def repetitionStats(text: Column, n: Int): Column =
    toColumn(RepetitionStatsExpr(toExpression(text), n))
  def cosineSim(a: Column, b: Column): Column =
    toColumn(CosineSimExpr(toExpression(a), toExpression(b)))
  def jaccardSorted(a: Column, b: Column): Column =
    toColumn(JaccardSortedExpr(toExpression(a), toExpression(b)))
  def winnowFingerprints(text: Column, k: Int, window: Int): Column =
    toColumn(WinnowFingerprintsExpr(toExpression(text), k, window))
  def lshSignature(emb: Column, planes: Seq[Seq[Double]]): Column =
    toColumn(LshSignatureExpr(toExpression(emb), planes.flatten, planes.size))
  def pqEncode(emb: Column, books: Seq[Double], m: Int, ksub: Int, dsub: Int): Column =
    toColumn(PqEncodeExpr(toExpression(emb), books, m, ksub, dsub))
  def shingles(text: Column, n: Int): Column = {
    require(n > 0, "shingle width must be positive")
    toColumn(ShinglesExpr(toExpression(text), n))
  }
  def containsEvalGram(text: Column, hashes: Seq[Long], n: Int): Column = {
    require(hashes.nonEmpty, "containsEvalGram needs a non-empty eval-gram set")
    toColumn(ContainsEvalGramExpr(toExpression(text), hashes, n))
  }
  def containsEvalGramBloom(text: Column, bits: Seq[Long], k: Int, n: Int): Column = {
    require(bits.nonEmpty && k > 0, "bloom prefilter needs bits and k > 0")
    toColumn(ContainsEvalGramBloomExpr(toExpression(text), bits, k, n))
  }
  def bestCosine(emb: Column, evals: Seq[Double], ids: Seq[Long],
      norms: Seq[Double], dim: Int): Column = {
    require(ids.nonEmpty, "bestCosine needs a non-empty eval set")
    require(evals.size == ids.size * dim && norms.size == ids.size,
      "eval matrix shape mismatch")
    toColumn(BestCosineExpr(toExpression(emb), evals, ids, norms, dim))
  }
}
