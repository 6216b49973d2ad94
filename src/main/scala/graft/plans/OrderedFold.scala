package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Mutable (pos, value) pair buffer for [[OrderedSumAgg]]. Grows by
  * doubling; `sawNull` latches a null value input (the composed fold's
  * `x + null` null-propagation). */
final class OrderedSumBuf(
    var n: Int,
    var pos: Array[Long],
    var value: Array[Double],
    var sawNull: Boolean) {
  def append(p: Long, v: Double): Unit = {
    if (n == pos.length) {
      val cap = math.max(8, pos.length * 2)
      pos = java.util.Arrays.copyOf(pos, cap)
      value = java.util.Arrays.copyOf(value, cap)
    }
    pos(n) = p; value(n) = v; n += 1
  }
}

/** Σ value in `pos` order, as ONE native typed imperative aggregate —
  * the engine's ordered-fold device (q89): floating-point addition is
  * not associative, so a cross-engine-exact per-group sum must fix the
  * operand order; `pos` (token position) is that order, and DuckDB
  * restates the fold as `list_sum(list(v ORDER BY pos))`.
  *
  * The composed form this replaces —
  * `aggregate(transform(array_sort(collect_list(struct(pos, v)))), 0.0, _+_)`
  * — runs three interpreted lambda HOFs over every element of every
  * group (the hot path of LM/DSIR/NB scoring, which folds corpus×classes
  * rows). This aggregate keeps bit-parity by construction: pairs sorted
  * by (pos, then java.lang.Double.compare on value — Spark's struct
  * ordering), left-fold of IEEE adds seeded 0.0, empty group → 0.0, any
  * null value → null (collect_list keeps the struct; the fold's `+ null`
  * then nulls the sum). Null `pos` is rejected loudly — every call site
  * derives pos from posexplode, so a null there is a caller bug, and
  * silently ordering it would drift from the composed form.
  *
  * Spark-native posture: plans as ObjectHashAggregate with a partial
  * stage (same plan shape as the collect_list it replaces, same shuffled
  * bytes — the win is per-element interpretation, not volume); merge
  * concatenates buffers and the final (pos, value) sort makes the result
  * merge-order-independent.
  */
case class OrderedSumAgg(
    posChild: Expression,
    valueChild: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[OrderedSumBuf]
    with BinaryLike[Expression] {

  override def left: Expression = posChild
  override def right: Expression = valueChild
  override def prettyName: String = "ordered_sum"
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): OrderedSumBuf =
    new OrderedSumBuf(0, new Array[Long](8), new Array[Double](8), false)

  override def update(buf: OrderedSumBuf, input: InternalRow): OrderedSumBuf = {
    val v = valueChild.eval(input)
    if (v == null) { buf.sawNull = true; return buf }
    val p = posChild.eval(input)
    if (p == null) throw new IllegalStateException(
      "ordered_sum: null pos (the fold order key must be non-null)")
    val pl = p match {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long    => l.longValue
      case s: java.lang.Short   => s.longValue
      case b: java.lang.Byte    => b.longValue
      case other => throw new IllegalStateException(
        s"ordered_sum: integral pos required, got ${other.getClass.getName}")
    }
    buf.append(pl, v.asInstanceOf[java.lang.Double].doubleValue)
    buf
  }

  override def merge(buf: OrderedSumBuf, other: OrderedSumBuf): OrderedSumBuf = {
    if (other.sawNull) buf.sawNull = true
    var i = 0
    while (i < other.n) { buf.append(other.pos(i), other.value(i)); i += 1 }
    buf
  }

  override def eval(buf: OrderedSumBuf): Any = {
    if (buf.sawNull) return null
    val n = buf.n
    if (n == 0) return java.lang.Double.valueOf(0.0)
    val order = new Array[java.lang.Integer](n)
    var i = 0
    while (i < n) { order(i) = java.lang.Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(order, new java.util.Comparator[java.lang.Integer] {
      override def compare(a: java.lang.Integer, b: java.lang.Integer): Int = {
        val c = java.lang.Long.compare(buf.pos(a), buf.pos(b))
        if (c != 0) c else java.lang.Double.compare(buf.value(a), buf.value(b))
      }
    })
    var s = 0.0
    i = 0
    while (i < n) { s += buf.value(order(i)); i += 1 }
    java.lang.Double.valueOf(s)
  }

  override def serialize(buf: OrderedSumBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.sawNull)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) {
      out.writeLong(buf.pos(i)); out.writeDouble(buf.value(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): OrderedSumBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sawNull = in.readBoolean()
    val n = in.readInt()
    val pos = new Array[Long](math.max(8, n))
    val value = new Array[Double](math.max(8, n))
    var i = 0
    while (i < n) { pos(i) = in.readLong(); value(i) = in.readDouble(); i += 1 }
    new OrderedSumBuf(n, pos, value, sawNull)
  }

  override def withNewMutableAggBufferOffset(off: Int): OrderedSumAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): OrderedSumAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): OrderedSumAgg =
    copy(posChild = l, valueChild = r)
}

object OrderedFold {
  /** Position-ordered IEEE sum of `value` — see [[OrderedSumAgg]]. */
  def orderedSum(pos: Column, value: Column): Column =
    toColumn(OrderedSumAgg(toExpression(pos), toExpression(value))
      .toAggregateExpression())
}
