package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Row kernels for the native expressions, shared between interpreted
  * `nullSafeEval` and generated code. A top-level Scala object gets static
  * forwarders, so whole-stage-codegen'd Java can call
  * `graft.plans.NativeExprKernels.minhashSig(...)` directly — one static
  * call per row with no boxing, which is what lets the expressions drop
  * `CodegenFallback` (a fallback splits the WholeStageCodegen span and
  * re-materializes an InternalRow per row on either side of the boundary).
  */
object NativeExprKernels {

  // element-type codes for cosineSim's codegen-time specialization
  final val ElemDouble = 0
  final val ElemFloat = 1
  final val ElemLong = 2
  final val ElemInt = 3

  private val ws = java.util.regex.Pattern.compile("\\s+")
  private val WinnowBase = 1000003L

  def minhashSig(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
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

  def shingleStats(input: UTF8String, n: Int): InternalRow = {
    val tokens = ws.split(input.toString.trim).filter(_.nonEmpty)
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

  /** Gopher/FineWeb-style repetition profile in one pass: lines split on
    * '\n' (split limit -1 keeps trailing empties — DuckDB string_split
    * parity), duplicate-line counts and the characters those duplicate
    * COPIES occupy (copies beyond the first occurrence; lengths in Unicode
    * code points — DuckDB length() parity), plus the dominance of the most
    * frequent word n-gram. Returned as raw counts; the query layer forms
    * the fractions so rounding stays in the engine's round(). */
  def repetitionStats(input: UTF8String, n: Int): InternalRow = {
    val s = input.toString
    val lines = s.split("\n", -1)
    val lineCount = new java.util.HashMap[String, Integer](math.max(16, lines.length * 2))
    var lineChars = 0L
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      val prev = lineCount.get(l)
      lineCount.put(l, if (prev == null) 1 else prev + 1)
      lineChars += l.codePointCount(0, l.length)
      i += 1
    }
    var nDup = 0L
    var dupChars = 0L
    val it = lineCount.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val extra = e.getValue - 1
      if (extra > 0) {
        nDup += extra
        dupChars += extra.toLong * e.getKey.codePointCount(0, e.getKey.length)
      }
    }
    val tokens = ws.split(s.trim).filter(_.nonEmpty)
    val total = math.max(tokens.length - n + 1, 0)
    val gramCount = new java.util.HashMap[String, Integer](math.max(16, total * 2))
    var top = 0
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j)); j += 1
      }
      val key = sb.toString
      val prev = gramCount.get(key)
      val c = if (prev == null) 1 else prev + 1
      gramCount.put(key, c)
      if (c > top) top = c
      i += 1
    }
    InternalRow(lines.length.toLong, nDup, dupChars, lineChars,
      top.toLong, total.toLong)
  }

  private def elemAt(arr: ArrayData, code: Int, i: Int): Double = code match {
    case ElemDouble => arr.getDouble(i)
    case ElemFloat  => arr.getFloat(i).toDouble
    case ElemLong   => arr.getLong(i).toDouble
    case ElemInt    => arr.getInt(i).toDouble
  }

  def cosineSim(x: ArrayData, y: ArrayData, lt: Int, rt: Int): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = elemAt(x, lt, i)
      val yi = elemAt(y, rt, i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  def jaccardSorted(x: ArrayData, y: ArrayData): Double = {
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

  def winnowFingerprints(input: UTF8String, k: Int, window: Int): ArrayData = {
    val text = ws.matcher(input.toString.toLowerCase.trim).replaceAll(" ")
    val n = text.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val grams = new Array[Long](n - k + 1)
    var h = 0L; var pow = 1L
    var i = 0
    while (i < k) { h = h * WinnowBase + text.charAt(i); if (i < k - 1) pow *= WinnowBase; i += 1 }
    grams(0) = h
    i = k
    while (i < n) {
      h = (h - text.charAt(i - k) * pow) * WinnowBase + text.charAt(i)
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

  /** nbits-bit random-hyperplane LSH signature: bit b = sign of the dot
    * product with plane b. `planes` is the row-major nbits x dim matrix;
    * one pass computes every bit (the composed-Column form runs nbits
    * interpreted aggregate() lambdas per row). */
  def lshSignature(arr: ArrayData, planes: Array[Double], nbits: Int, elemCode: Int): Int = {
    val dim = planes.length / nbits
    val n = math.min(arr.numElements(), dim)
    var sig = 0
    var b = 0
    while (b < nbits) {
      val off = b * dim
      var dot = 0.0
      var i = 0
      while (i < n) { dot += elemAt(arr, elemCode, i) * planes(off + i); i += 1 }
      if (dot >= 0.0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  /** PQ encode: per subspace s, the 0-based index of the nearest codeword
    * by 9dp-snapped L2² (BigDecimal.valueOf HALF_UP — the exact rounding
    * the Catalyst `round` expression applies, so this loop is bit-for-bit
    * the composed slice→zip_with→aggregate→round→array_position form it
    * replaces; strict `<` keeps the FIRST min ⇒ smallest code). Codes
    * pack into bits [8s, 8s+8) of one long. `books` is the flattened
    * (sub, code, dim)-major m×ksub×dsub codeword tensor. */
  def pqEncode(arr: ArrayData, books: Array[Double], m: Int, ksub: Int,
      dsub: Int, elemCode: Int): Long = {
    var code = 0L
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = elemAt(arr, elemCode, s * dsub + i) - books(base + i)
          d += diff * diff
          i += 1
        }
        // non-finite guard matches Catalyst Round (BigDecimal.valueOf
        // throws on NaN/Infinity; Catalyst passes them through) — a NaN
        // distance then never wins the strict < and the code stays valid
        val snapped =
          if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
          else java.math.BigDecimal.valueOf(d)
            .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
        if (snapped < bestD) { bestD = snapped; best = c }
        c += 1
      }
      code |= best.toLong << (8 * s)
      s += 1
    }
    code
  }

  def simhash64(input: UTF8String): Long = {
    val tokens = ws.split(input.toString.trim)
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
    sig
  }

  /** Best cosine of one corpus vector against a flattened eval matrix
    * (`evals` row-major, `norms(e)` the eval row's L2 norm summed in
    * array order): the decontamination scan's inner loop. Cosines are
    * 4dp HALF_UP (BigDecimal — Catalyst Round parity, same as pqEncode's
    * snap); the strict `>` over evals in ascending-id order keeps the
    * SMALLEST eval id on rounded ties; NaN/Inf cosines (zero-norm
    * vectors) never win. Returns (best_cos, best_id); best_cos −2.0
    * means "no finite cosine" and the caller nulls the pair out. */
  def bestCosine(arr: ArrayData, evals: Array[Double], ids: Array[Long],
      norms: Array[Double], dim: Int, elemCode: Int): InternalRow = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var nv2 = 0.0
    var i = 0
    while (i < n) {
      val x = elemAt(arr, elemCode, i)
      v(i) = x; nv2 += x * x; i += 1
    }
    val nv = math.sqrt(nv2)
    val m = math.min(n, dim)
    var bestC = -2.0
    var bestId = 0L
    var e = 0
    while (e < ids.length) {
      val base = e * dim
      var dot = 0.0
      var j = 0
      while (j < m) { dot += v(j) * evals(base + j); j += 1 }
      val raw = dot / (nv * norms(e))
      val c =
        if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
        else java.math.BigDecimal.valueOf(raw)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      if (c > bestC) { bestC = c; bestId = ids(e) }
      e += 1
    }
    InternalRow(bestC, bestId)
  }

  /** Word tokens with Spark `split(trim(c), "\s+")` BIT-PARITY: trim
    * ASCII spaces only (Spark `trim`), then Java-regex `\s+` split with
    * limit -1 — empty edge tokens from non-space whitespace KEPT, like
    * Spark `split`. Shared by every gram kernel so their tokenization
    * can never drift from the composed-column forms. */
  private def sparkTokens(s: String): Array[String] = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    ws.split(s.substring(b, e), -1)
  }

  /** Word n-gram shingles in one loop per row (the composed form runs a
    * `transform` lambda interpreted per gram with a slice+concat_ws
    * allocation each — this is the hot tokenization path of the whole
    * gram family). Order and content bit-parity with
    * TextFunctions.shinglesViaColumns; < n tokens → empty array. */
  def shingles(input: UTF8String, n: Int): ArrayData = {
    val toks = sparkTokens(input.toString)
    val total = toks.length - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](total)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** True iff any word n-gram of the text hashes into the sorted
    * eval-gram hash set (binary search per gram) — the decontamination
    * scan prefilter. Tokenization via [[sparkTokens]] (shingles()
    * parity); hash is xxhash64 seed 42 over the gram's UTF-8 bytes —
    * identical to the `xxhash64(gram)` column the eval set is collected
    * with, so equal strings always hash equal: the filter can
    * false-positive (2⁻⁶⁴ collisions, removed by the exact confirm join
    * downstream) but never false-negative. */
  /** SplitMix64 finalizer — the second hash for Kirsch–Mitzenmacher
    * double hashing. Forced odd so the k strides h1 + i·h2 walk distinct
    * residues even when mBits is a power of two. */
  private def bloomStride(h: Long): Long = {
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) | 1L
  }

  /** Set the k Bloom bits for one 64-bit key (driver-side build path).
    * Shares the position derivation with [[bloomMightContain]] so insert
    * and probe can never drift. */
  def bloomSet(bits: Array[Long], h: Long, k: Int): Unit = {
    val mBits = bits.length.toLong * 64L
    val h2 = bloomStride(h)
    var i = 0
    while (i < k) {
      val pos = ((h + i.toLong * h2) & Long.MaxValue) % mBits
      bits((pos >>> 6).toInt) |= 1L << (pos & 63L)
      i += 1
    }
  }

  /** Bloom membership for one 64-bit key. Never false-negative for an
    * inserted key (identical derivation as [[bloomSet]]); false-positive
    * rate ≈ (1 − e^(−kn/m))^k, ~0.3% at 12 bits/key. */
  def bloomMightContain(bits: Array[Long], h: Long, k: Int): Boolean = {
    val mBits = bits.length.toLong * 64L
    val h2 = bloomStride(h)
    var i = 0
    while (i < k) {
      val pos = ((h + i.toLong * h2) & Long.MaxValue) % mBits
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** [[containsEvalGram]] with the sorted-array membership test replaced
    * by a Bloom filter — the decontamination prefilter when the eval gram
    * set is too large to broadcast exactly (12 bits/gram vs 64, and the
    * filter size is FIXED at build time regardless of how the probe-side
    * corpus grows). Same tokenization ([[sparkTokens]]), same xxhash64
    * seed-42 gram hash, so a true eval gram can never be missed; extra
    * false positives only admit candidates the downstream string-equal
    * confirm join discards. */
  def containsEvalGramBloom(input: UTF8String, n: Int, bits: Array[Long], k: Int): Boolean = {
    val toks = sparkTokens(input.toString)
    val total = toks.length - n + 1
    if (total <= 0) return false
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        UTF8String.fromString(sb.toString),
        org.apache.spark.sql.types.StringType, 42L)
      if (bloomMightContain(bits, h, k)) return true
      i += 1
    }
    false
  }

  def containsEvalGram(input: UTF8String, n: Int, sorted: Array[Long]): Boolean = {
    val toks = sparkTokens(input.toString)
    val total = toks.length - n + 1
    if (total <= 0) return false
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        UTF8String.fromString(sb.toString),
        org.apache.spark.sql.types.StringType, 42L)
      if (java.util.Arrays.binarySearch(sorted, h) >= 0) return true
      i += 1
    }
    false
  }

  private val deflateBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  /** DEFLATE(level 6, default strategy, raw stream) output length in
    * bytes for the UTF-8 bytes of `input`. A fresh Deflater per row would
    * churn native zlib streams; `reset()` on a thread-local instance is
    * the documented reuse path. Only the LENGTH is accumulated — the
    * compressed bytes never leave the scratch buffer. */
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  /** Unicode NFC canonical composition (see plans.NfcNormalizeExpr).
    * Fast path: Normalizer.isNormalized avoids the rebuild for the
    * overwhelmingly-common already-NFC document. */
  def nfcNormalize(input: UTF8String): UTF8String = {
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  def deflateLen(input: UTF8String): Long = {
    val bytes = input.getBytes
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = deflateBuf.get()
    var total = 0L
    while (!d.finished()) {
      total += d.deflate(buf)
    }
    total
  }
}
