package graft

import org.apache.spark.sql.functions._
import graft.plans.{DeflateExpr, NativeExprKernels}
import org.apache.spark.unsafe.types.UTF8String

class DeflateSpec extends SparkSpec {

  /** Reference: a fresh Deflater per call with the kernel's settings. */
  private def refLen(s: String): Long = {
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(s.getBytes("UTF-8"))
    d.finish()
    val buf = new Array[Byte](1 << 16)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  test("kernel equals a fresh reference Deflater (reset-reuse is sound)") {
    val inputs = Seq("", "a", "ab" * 500, "the quick brown fox",
      (1 to 400).map(i => s"tok${i * 7919 % 1000}").mkString(" "))
    for (s <- inputs) {
      assert(NativeExprKernels.deflateLen(UTF8String.fromString(s)) === refLen(s),
        s"input of length ${s.length}")
    }
    // interleaved calls must not leak state between rows
    val again = inputs.map(s =>
      NativeExprKernels.deflateLen(UTF8String.fromString(s)))
    assert(again === inputs.map(refLen))
  }

  test("repetitive text compresses far below shuffled-vocab text; bounds hold") {
    import spark.implicits._
    val rep = "spam ham " * 300
    val varied = (1 to 600).map(i => s"w${(i * 2654435761L) % 100000}").mkString(" ")
    val out = Seq((1L, rep), (2L, varied)).toDF("id", "text")
      .select(col("id"),
        octet_length(col("text")).cast("long").as("n"),
        DeflateExpr.deflateLen(col("text")).as("z"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (nRep, zRep) = out(1L)
    val (nVar, zVar) = out(2L)
    assert(zRep.toDouble / nRep < 0.05, s"repetitive ratio ${zRep.toDouble / nRep}")
    assert(zVar.toDouble / nVar > 3.0 * zRep / nRep)
    for ((n, z) <- Seq((nRep, zRep), (nVar, zVar))) {
      assert(z > 0 && z <= n + 11 + 5 * (n / 16383 + 1))
    }
  }

  test("null text yields null; expression is deterministic across plans") {
    import spark.implicits._
    val df = Seq((1L, Some("hello world")), (2L, None)).toDF("id", "text")
    val a = df.select(DeflateExpr.deflateLen(col("text"))).collect()
    assert(a(1).isNullAt(0))
    val b = df.select(DeflateExpr.deflateLen(col("text"))).collect()
    assert(a(0).getLong(0) === b(0).getLong(0))
  }
}
