package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native typed
  * imperative aggregate — the mergeable point-frequency estimator that
  * complements [[MisraGriesAgg]]: Misra-Gries names the heavy hitters,
  * Count-Min answers "how often did THIS key occur" for any key, from
  * fixed depth×width state.
  *
  * Bucket rule: `bucket_j(item) = floorMod(XXH64(j, seed = XXH64(item,
  * 42)), width)` — exactly what the builtin column chain
  * `pmod(xxhash64(item, lit(j)), width)` computes for a LONG item. The
  * family is chosen for RESTATABILITY, not novelty: the estimate side
  * re-derives buckets with stock codegen'd expressions (no collected
  * sketch ever re-enters a kernel), and the DuckDB oracle re-derives
  * them with the closed-formula HUGEINT chain (the q69/q75 device), so
  * every counter and every estimate is hash-checkable end to end.
  * XXH64 finalization avalanches per (item, j), giving the per-row
  * near-independence the CMS error bound (est ≤ true + e/width · N with
  * prob 1 − e^−depth) assumes.
  *
  * Guarantees (pinned in CountMinSpec): estimates NEVER undercount —
  * est(x) ≥ true(x) always, collisions only inflate; each row's
  * counters sum to the stream length N; merge is elementwise sum, so
  * the sketch of a union is the sum of sketches and the result is
  * partitioning-independent. With depth·width longs of state per map
  * task (the default 4×512 = 16 KiB), the aggregate plans as
  * ObjectHashAggregate with a partial stage — one bounded summary per
  * task reaches the exchange at any corpus scale, never per-item rows.
  *
  * Input child must be LongType (hash string items with `xxhash64`
  * first); null inputs are skipped. Output is the NON-ZERO cells as
  * array<struct<row,col,cnt>> ordered by (row, col) — the query layer
  * explodes it to scalar rows (driver-sortability contract).
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  // LongType enforced at resolution (hash string items with xxhash64
  // first) — constructor-time child.dataType is unavailable on an
  // unresolved column, so the check rides checkInputDataTypes
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"count_min input must be LongType (hash items first), got ${child.dataType}")
    }

  override def prettyName: String = "count_min"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("row", IntegerType, nullable = false),
    StructField("col", IntegerType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val seed = XxHash64Function.hash(v, LongType, 42L)
    var j = 0
    while (j < depth) {
      val b = java.lang.Math.floorMod(
        XxHash64Function.hash(j.toLong, LongType, seed), width.toLong).toInt
      buf(j * width + b) += 1L
      j += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val cells = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < buf.length) {
      if (buf(i) != 0L) cells += InternalRow(i / width, i % width, buf(i))
      i += 1
    }
    new GenericArrayData(cells.toArray)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    // sparse (idx, cnt) pairs: early map-side partials touch few cells
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var nz = 0
    var i = 0
    while (i < buf.length) { if (buf(i) != 0L) nz += 1; i += 1 }
    out.writeInt(nz)
    i = 0
    while (i < buf.length) {
      if (buf(i) != 0L) { out.writeInt(i); out.writeLong(buf(i)) }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    val nz = in.readInt()
    var i = 0
    while (i < nz) { buf(in.readInt()) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): CountMinAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CountMinAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
}

object CountMin {
  import org.apache.spark.sql.functions._

  /** Count-Min sketch column over a LongType item column: non-zero cells
    * as array<struct<row,col,cnt>>; explode for scalar rows. */
  def sketch(c: Column, depth: Int, width: Int): Column =
    toColumn(CountMinAgg(toExpression(c), depth, width).toAggregateExpression())

  /** Point estimate for `item` (LongType) against COLLECTED sketch cells
    * — min over rows of the addressed counter, buckets re-derived with
    * the stock `pmod(xxhash64(item, lit(j)), width)` chain (bit-identical
    * to the aggregate's update rule), counters as literal arrays. Pure
    * codegen'd column: the 100 TB shape is "train the sketch once, then
    * estimate any stream map-only with model-sized broadcast state". */
  def estimate(
      item: Column, cells: Map[(Int, Int), Long],
      depth: Int, width: Int): Column = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    (0 until depth).map { j =>
      val row = (0 until width).map(c => cells.getOrElse((j, c), 0L))
      val bucket = pmod(xxhash64(item, lit(j.toLong)), lit(width.toLong))
      element_at(typedlit(row), (bucket + lit(1L)).cast("int"))
    }.reduce(least(_, _))
  }
}
