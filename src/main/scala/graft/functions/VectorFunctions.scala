package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * Spark's higher-order functions (`zip_with`/`aggregate`/`transform`) so
  * the arithmetic is codegen'd and runs columnar — no UDF boxing per row.
  * Elements are cast to double before any multiply so results match a
  * double-precision oracle bit-for-bit up to summation order.
  */
object VectorFunctions {

  private def asD(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asD(a), asD(b), _ * _), lit(0.0), _ + _)

  def normSq(a: Column): Column =
    aggregate(transform(asD(a), x => x * x), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity — native expression (one loop/row); the composed
    * form is kept as the parity oracle. Both widen to double before any
    * multiply and accumulate sequentially, so they agree bitwise. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.NativeExprs.cosineSim(a, b)

  def cosineViaColumns(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance — sequential in-index fold like the cosine
    * kernel, so a same-order SQL restatement agrees bit-for-bit. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(asD(a), asD(b), (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  def l2Dist(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** L2-normalize a vector (zero vectors pass through unchanged). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, asD(a)).otherwise(transform(asD(a), x => x / n))
  }

  /** Sign bit of the dot product against a fixed hyperplane — one bit of a
    * random-hyperplane LSH signature. Hyperplanes are generated driver-side
    * from a fixed seed (Similarity.hyperplanes). */
  def hyperplaneBit(v: Column, plane: Seq[Double]): Column = {
    val planeCol = array(plane.map(lit): _*)
    when(dot(v, planeCol) >= 0.0, lit(1)).otherwise(lit(0))
  }
}
