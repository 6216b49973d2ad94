package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the signature/vector hot paths.
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) evaluate
  * their lambdas interpreted, outside whole-stage codegen; for per-element
  * work like 64-slot minhash signatures or 64-dim dot products that costs
  * an interpreted dispatch + allocation per element. Each expression here
  * is one tight JVM loop per row, parity-tested bit-for-bit against its
  * composed-Column reference (see *ViaColumns in Text/VectorFunctions).
  */

/** MinHash signature from pre-hashed elements (array<long>): slot k =
  * min over elements of xxhash64(h, k) — identical hash chaining to
  * functions.xxhash64(h, lit(k)) (seed 42, then Int k folded in). */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // static primitive XXH64 calls — the boxed XxHash64Function.hash
      // costs an allocation per call (~30M/query at sf0.1)
      val base = XXH64.hashLong(arr.getLong(i), 42L)
      var k = 0
      while (k < numHashes) {
        val v = XXH64.hashInt(k, base)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
}

/** Shingle statistics over whitespace tokens: (n_shingles, n_distinct) for
  * word n-grams joined with single spaces — one pass, one HashSet. */
case class ShingleStatsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_shingles", LongType, nullable = false),
    StructField("n_distinct_shingles", LongType, nullable = false)))
  override def prettyName: String = "shingle_stats"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val tokens = ws.split(input.asInstanceOf[UTF8String].toString.trim)
      .filter(_.nonEmpty)
    val total = math.max(tokens.length - n + 1, 0)
    val seen = new java.util.HashSet[String](math.max(16, total * 2))
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j)); j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    InternalRow(total.toLong, seen.size.toLong)
  }

  override protected def withNewChildInternal(c: Expression): ShingleStatsExpr =
    copy(child = c)
}

/** Cosine similarity of two numeric arrays: elements widened to double,
  * sequential accumulation — the same IEEE op order as the composed
  * cast-then-zip_with-then-aggregate reference, so results are bitwise
  * identical. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  @transient private lazy val leftElem =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rightElem =
    right.dataType.asInstanceOf[ArrayType].elementType

  private def elemAt(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case DoubleType => arr.getDouble(i)
    case FloatType  => arr.getFloat(i).toDouble
    case LongType   => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = elemAt(x, leftElem, i)
      val yi = elemAt(y, rightElem, i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

/** Set Jaccard of two SORTED long arrays via a two-pointer merge walk —
  * no per-row hash sets, no materialized intersect/union arrays (the
  * array_intersect+array_union form allocates both per pair; at 1.4M
  * candidate pairs that was the dedup verify bottleneck). Inputs MUST be
  * sorted ascending and distinct (Dedup sorts once at hashing time). */
case class JaccardSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    if (nx == 0 && ny == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    inter.toDouble / (nx + ny - inter)
  }

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
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
  private val Base = 1000003L

  override def nullSafeEval(input: Any): Any = {
    val text = ws.matcher(
      input.asInstanceOf[UTF8String].toString.toLowerCase.trim).replaceAll(" ")
    val n = text.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // rolling polynomial hashes of all k-grams (wrapping 64-bit)
    val grams = new Array[Long](n - k + 1)
    var h = 0L; var pow = 1L
    var i = 0
    while (i < k) { h = h * Base + text.charAt(i); if (i < k - 1) pow *= Base; i += 1 }
    grams(0) = h
    i = k
    while (i < n) {
      h = (h - text.charAt(i - k) * pow) * Base + text.charAt(i)
      grams(i - k + 1) = h
      i += 1
    }
    if (grams.length <= window) {
      var m = 0
      var j = 1
      while (j < grams.length) { if (grams(j) <= grams(m)) m = j; j += 1 }
      return new GenericArrayData(Array(grams(m)))
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long](grams.length / window + 1)
    var lastPick = -1
    var w = 0
    while (w <= grams.length - window) {
      var m = w
      var j = w + 1
      while (j < w + window) { if (grams(j) <= grams(m)) m = j; j += 1 }
      if (m != lastPick) { out += grams(m); lastPick = m }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFingerprintsExpr =
    copy(child = c)
}

object NativeExprs {
  def minhashSignature(hashes: Column, numHashes: Int): Column =
    toColumn(MinHashSigExpr(toExpression(hashes), numHashes))
  def shingleStats(text: Column, n: Int): Column =
    toColumn(ShingleStatsExpr(toExpression(text), n))
  def cosineSim(a: Column, b: Column): Column =
    toColumn(CosineSimExpr(toExpression(a), toExpression(b)))
  def jaccardSorted(a: Column, b: Column): Column =
    toColumn(JaccardSortedExpr(toExpression(a), toExpression(b)))
  def winnowFingerprints(text: Column, k: Int, window: Int): Column =
    toColumn(WinnowFingerprintsExpr(toExpression(text), k, window))
}
