package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a native typed imperative
  * aggregate — the streaming frequent-items sketch (Misra & Gries 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * The buffer holds at most `capacity` (item, count) pairs:
  *  - update on a tracked item increments it; on an untracked item with
  *    room, inserts at 1; otherwise decrements EVERY tracked count and
  *    drops zeros (the classic k-way cancellation).
  *  - merge sums the two maps, and if over capacity subtracts the
  *    (capacity+1)-th largest combined count from every entry, dropping
  *    non-positive remainders.
  *
  * Guarantees: each reported count underestimates the true frequency by
  * at most N/(capacity+1) (N = stream length), and every item with true
  * frequency above that bound is present. With capacity ≥ the number of
  * distinct items no decrement can ever fire, so every count is EXACT
  * and merge-order-independent — the regime the registered query runs
  * in (full DuckDB oracle); the lossy bound is pinned in ScalaTest.
  *
  * Spark-native posture: TypedImperativeAggregate plans as
  * ObjectHashAggregate with a partial stage, so each map task ships one
  * ≤ capacity-entry summary — map-side combine at 100 TB, never a
  * per-item shuffle. Output is array<struct<item,est>> sorted by
  * (est desc, item asc binary) — the query layer explodes it to scalar
  * rows (driver-sortability contract).
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
    with UnaryLike[Expression] {

  require(capacity > 0, "capacity must be positive")

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(
      buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    val cur = buf.get(item)
    if (cur != null) buf.put(item, cur + 1L)
    else if (buf.size < capacity) buf.put(item, 1L)
    else {
      // full + untracked: cancel one occurrence of every tracked item
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    other.forEach { (item, c) =>
      val cur = buf.get(item)
      buf.put(item, if (cur == null) c else java.lang.Long.valueOf(cur + c))
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positives
      val counts = new Array[Long](buf.size)
      var i = 0
      buf.forEach { (_, c) => counts(i) = c; i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(buf.size - capacity - 1)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size)
    var i = 0
    buf.forEach { (item, c) =>
      entries(i) = (UTF8String.fromString(item), c.longValue); i += 1
    }
    val sorted = entries.sortWith((a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1.compareTo(b._1) < 0))
    new GenericArrayData(sorted.map(e => InternalRow(e._1, e._2): Any))
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c.longValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, java.lang.Long](math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, "UTF-8"), java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
}

object HeavyHitters {
  /** Heavy-hitters summary column: array<struct<item,est>> sorted by
    * (est desc, item asc); explode for scalar rows. */
  def misraGries(c: Column, capacity: Int): Column =
    toColumn(MisraGriesAgg(toExpression(c), capacity).toAggregateExpression())
}
