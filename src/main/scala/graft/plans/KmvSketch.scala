package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k minimum values) distinct sketch (Bar-Yossef et al. 2002;
  * Beyer et al., "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations", SIGMOD'07) as a native typed imperative
  * aggregate: the buffer is the set of the k smallest DISTINCT hash
  * values seen so far (signed long order), and the sketch supports the
  * multiset algebra HLL cannot: union AND intersection estimates from
  * two independently-built summaries — the "how much do two crawl
  * snapshots overlap" question answered from 2·k·8 bytes instead of a
  * distinct-join over both corpora.
  *
  * Semantics: duplicates never occupy two slots (the buffer is a set);
  * the k-min set of distinct values is ORDER-INDEPENDENT, so the eval
  * result is deterministic regardless of partitioning, and a DuckDB
  * oracle re-derives it as `SELECT DISTINCT h ORDER BY h LIMIT k` over
  * the closed-formula XXH64 chain. With fewer than k distinct inputs the
  * sketch holds ALL of them and every downstream estimate is exact.
  *
  * Estimator contract (applied relationally downstream, not here): with
  * u(h) = (toDouble(h) + 2^63) / 2^64 mapping the signed hash to (0,1),
  * distinct-count ≈ (k-1)/u(k-th min); for two sketches A, B the k-min
  * set of A∪B is the k smallest of the merged arrays, Jaccard ≈
  * |{x ∈ kmin(A∪B) : x ∈ A ∧ x ∈ B}| / k, and |A∩B| ≈ J · est(A∪B) —
  * all array-function algebra over the two ≤k-element results.
  *
  * Spark-native posture: TypedImperativeAggregate plans as
  * ObjectHashAggregate with a partial stage — each map task ships one
  * ≤k-entry summary, never the input (the same summary-sized-shuffle
  * posture as the Misra-Gries/CMS/HLL aggregates). Merge = set-union +
  * trim, associative and commutative (pinned in SketchesSpec). NULL
  * inputs are skipped, which also makes `kmv(when(pred, h))` a
  * one-pass multi-shard device: several gated sketches build in a
  * single aggregation over one scan.
  *
  * Output: array<long> of the ≤k minima in ascending signed order.
  */
case class KmvMinimaAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "kmv_minima"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val h = v.asInstanceOf[Long]
    // reject without mutating when already full of smaller values: the
    // common case on a big scan is a no-op comparison, not an insert+trim
    if (buf.size < k) buf.add(h)
    else if (h < buf.last()) { if (buf.add(h)) buf.pollLast() }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { if (buf.add(h)) buf.pollLast() }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(java.lang.Long.valueOf(in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): KmvMinimaAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KmvMinimaAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(c: Expression): KmvMinimaAgg =
    copy(child = c)
}

object Kmv {
  /** k-minimum-values summary column over a LONG hash column:
    * array<long> of the ≤k smallest distinct values, ascending. NULLs
    * are skipped — gate with `when(pred, h)` to build several shard
    * sketches in one aggregation pass. */
  def kmvMinima(c: Column, k: Int): Column =
    toColumn(KmvMinimaAgg(toExpression(c), k).toAggregateExpression())
}
