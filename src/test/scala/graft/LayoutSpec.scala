package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  test("zValue interleaves bits: x at odd lanes, y at even lanes") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (2047L, 2047L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x=5 (101b) -> lanes 1,3,5 = 2+0+32 = 34; y=3 (011b) -> lanes 0,2 = 5
    assert(got === Seq(0L, 2L, 1L, 39L, (1L << 22) - 1))
  }

  test("zValue is unique over a dense 2-D grid (bijectivity on 6+6 bits)") {
    import spark.implicits._
    val grid = spark.range(0, 4096)
      .select((col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    val n = grid.select(Layout.zValue(col("x"), col("y")).as("z"))
      .distinct().count()
    assert(n === 4096L)
  }

  test("z-order layout bounds BOTH dimensions per partition; x-sort does not") {
    import spark.implicits._
    val grid = spark.range(0, 4096)
      .select((col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))

    def meanSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = df
        .withColumn("pid", spark_partition_id())
        .groupBy(col("pid"))
        .agg((max(col("x")) - min(col("x"))).as("sx"),
          (max(col("y")) - min(col("y"))).as("sy"))
        .agg(avg(col("sx")), avg(col("sy")))
        .collect()(0)
      (spans.getDouble(0), spans.getDouble(1))
    }

    val (zx, zy) = meanSpans(Layout.zorderLayout(grid, col("x"), col("y"), 16))
    val (lx, ly) = meanSpans(grid.repartitionByRange(16, col("x"), col("y")))

    // 16 z-range partitions fix the top 2 bits of each dimension:
    // ideal span 15 per dim; range-sampling blur stays well under 32.
    assert(zx <= 32.0, s"z-order x-span $zx")
    assert(zy <= 32.0, s"z-order y-span $zy")
    // lexicographic range partitioning serves only the leading column:
    // x is tightly bounded but y spans nearly its whole domain.
    assert(lx <= 8.0, s"lex x-span $lx")
    assert(ly >= 48.0, s"lex y-span $ly")
  }
}
