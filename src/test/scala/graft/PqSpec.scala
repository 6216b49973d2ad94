package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Pq, Similarity}
import graft.functions.VectorFunctions._

class PqSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sfDir).embeddings.cache()
  private lazy val queries = emb.filter(col("vec_id").isin(0L, 100L, 250L))
  private lazy val books = Pq.pqCodebooks(emb, m = 8, ksub = 16, iters = 3)

  test("codebook training is deterministic and fully shaped") {
    val again = Pq.pqCodebooks(emb, m = 8, ksub = 16, iters = 3)
    assert(books === again, "re-training must reproduce codebooks bit-for-bit")
    assert(books.length === 8 * 16)
    assert(books.map(b => (b._1, b._2)).toSet ===
      (for (s <- 0 until 8; c <- 0 until 16) yield (s, c)).toSet)
    assert(books.forall(_._3.length === 8), "every codeword spans dsub=8 dims")
  }

  test("encode packs one valid byte per subspace into one BIGINT") {
    val codes = Pq.pqEncode(emb, books).cache()
    val n = emb.count()
    assert(codes.count() === n)
    assert(codes.select("vec_id").distinct().count() === n)
    val bad = codes.filter((0 until 8).map(s =>
      shiftright(col("code"), 8 * s).bitwiseAND(lit(255)) >= 16).reduce(_ || _))
    assert(bad.count() === 0, "every subspace byte must be a valid code < ksub")
    codes.unpersist()
  }

  test("native encode kernel matches the composed-Column form bit-for-bit") {
    val mismatches = emb.select(
        Pq.encodeExpr(col("embedding"), books, dsub = 8).as("native"),
        Pq.encodeExprViaColumns(col("embedding"), books, dsub = 8).as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(mismatches.count() === 0)
  }

  test("codebook table export matches the trained model bit-for-bit") {
    val fromTable = Pq.pqCodebookTable(emb, m = 8, ksub = 16, iters = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(fromTable === books.sortBy(t => (t._1, t._2)))
  }

  test("persisted IVF×PQ index: pruned-scan search; all-lists probe = flat PQ") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pqivf-index").toString
    Pq.writePqIvfIndex(emb, dir, nlist = 8, iters = 3, m = 8, ksub = 16)
    // probing EVERY list must reproduce the flat (un-partitioned) ADC
    // search exactly — the partitioning is a pure re-layout of the codes
    val full = Pq.pqIvfTopKFromIndex(
        spark, dir, emb, queries, k = 5, nprobe = 8, refine = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val flat = Pq.pqAdcTopK(emb, queries, k = 5, books, refine = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full === flat, s"all-lists probe diverged: ${(full diff flat) ++ (flat diff full)}")
    // a narrow probe still answers k rows per query off a PRUNED scan
    val probed = Pq.pqIvfTopKFromIndex(
      spark, dir, emb, queries, k = 5, nprobe = 3, refine = 50)
    assert(probed.count() === 15)
    // per-query nprobe semantics: a query scores ONLY its own probed
    // lists, so its result cannot depend on what else is in the batch
    val alone = Pq.pqIvfTopKFromIndex(
        spark, dir, emb, emb.filter(col("vec_id") === 0L), k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inBatch = probed.collect().filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(alone === inBatch, "batch membership changed a query's result")
    val planStr = probed.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: ["), planStr.take(1500))
    assert(planStr.contains("cid"), "partition filter should constrain cid")
    // empty query set returns empty, not an empty-reduce/empty-isin crash
    assert(Pq.pqIvfTopKFromIndex(
      spark, dir, emb, queries.limit(0), k = 5, nprobe = 3).count() === 0L)
    // write-side list assignment agrees with an independent driver-side
    // recomputation of the nearest centroid (the all-lists parity above
    // cannot see a wrong assignment — every list is probed there)
    val centroids = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    val embMap = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def nearest(v: Seq[Double]): Int = centroids.map { case (cid, ctr) =>
      var d = 0.0
      var i = 0
      while (i < v.length) { val df = v(i) - ctr(i); d += df * df; i += 1 }
      (BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble, cid)
    }.min._2
    val misassigned = spark.read.parquet(s"$dir/lists")
      .select(col("vec_id"), col("cid")).collect()
      .count(r => nearest(embMap(r.getLong(0))) != r.getInt(1))
    assert(misassigned === 0, s"$misassigned vectors on the wrong list")
  }

  test("residual IVF×PQ index: per-list residual LUTs, recall at least matches absolute") {
    def truthTopK: Set[(Long, Long)] = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
        .orderBy(col("d"), col("vec_id"))
      emb.select(col("vec_id"), col("embedding"))
        .join(broadcast(queries.select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb"))), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          round(l2Dist(col("embedding"), col("q_emb")), 4).as("d"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val truth = truthTopK
    // the index is self-describing: the search reads residual-vs-absolute
    // from the meta table, no caller flag to mismatch
    def recallOf(dir: String): Double = {
      val got = Pq.pqIvfTopKFromIndex(
          spark, dir, emb, queries, k = 5, nprobe = 3, refine = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.size === 15)
      (got intersect truth).size.toDouble / truth.size
    }
    val dirAbs = java.nio.file.Files.createTempDirectory("graft-pqivf-abs").toString
    val dirRes = java.nio.file.Files.createTempDirectory("graft-pqivf-res").toString
    Pq.writePqIvfIndex(emb, dirAbs, nlist = 8, iters = 3, m = 8, ksub = 16)
    Pq.writePqIvfIndex(emb, dirRes, nlist = 8, iters = 3, m = 8, ksub = 16,
      residual = true)
    val (rAbs, rRes) = (recallOf(dirAbs), recallOf(dirRes))
    // residual codes quantize smaller-norm vectors with the same ksub
    // codewords — fidelity must not DROP vs absolute encoding at the
    // same probe/refine budget (typically it rises)
    assert(rRes >= rAbs - 1e-9, s"residual recall $rRes < absolute $rAbs")
    assert(rRes >= 0.4, s"residual recall too low: $rRes")
    // the INLINE residual search (q84's operator — trains in-query) must
    // reproduce the persisted residual index's answer exactly: same
    // deterministic model, same probe/ADC/refine algebra, different layout
    val inline = Pq.pqIvfResidualTopK(
        emb, queries, k = 5, nlist = 8, nprobe = 3, m = 8, ksub = 16,
        iters = 3, refine = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val persisted = Pq.pqIvfTopKFromIndex(
        spark, dirRes, emb, queries, k = 5, nprobe = 3, refine = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inline === persisted,
      s"inline residual search diverged from the persisted index: " +
        s"${(inline diff persisted) ++ (persisted diff inline)}")
  }

  test("q83 model export matches the persisted residual index bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pqivf-exp").toString
    Pq.writePqIvfIndex(emb, dir, nlist = 8, iters = 3, m = 8, ksub = 16,
      residual = true)
    val table = Pq.ivfPqResidualModelTable(
        emb, nlist = 8, m = 8, ksub = 16, iters = 3)
      .collect().map(r =>
        (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
    val fromCentroids = spark.read.parquet(s"$dir/centroids")
      .collect().flatMap { r =>
        r.getSeq[Double](1).zipWithIndex.map { case (v, pos) =>
          ("c", r.getInt(0), 0, pos, v)
        }
      }
    val fromBooks = spark.read.parquet(s"$dir/books")
      .collect().flatMap { r =>
        r.getSeq[Double](2).zipWithIndex.map { case (v, pos) =>
          ("b", r.getInt(0), r.getInt(1), pos, v)
        }
      }
    assert(table.sorted === (fromCentroids ++ fromBooks).sorted,
      "scalar model export must carry exactly the persisted model state")
  }

  test("degenerate corpora: identical and all-zero vectors still train, encode, search") {
    import spark.implicits._
    // identical embeddings: every seed ties, codewords collapse, encode
    // must still emit a valid code and search must still answer k rows
    val same = (1L to 40L).map(i => (i, Seq.fill(64)(0.5f))).toDF("vec_id", "embedding")
    val sameBooks = Pq.pqCodebooks(same, m = 8, ksub = 4, iters = 2)
    val sameCodes = Pq.pqEncode(same, sameBooks).collect()
    assert(sameCodes.length === 40)
    assert(sameCodes.map(_.getLong(1)).distinct.length === 1, "identical vectors, one code")
    val sameTop = Pq.pqAdcTopK(same, same.filter(col("vec_id") === 1L),
      k = 3, sameBooks, refine = 10)
    assert(sameTop.collect().map(_.getLong(1)).toSeq === Seq(2L, 3L, 4L),
      "ADC ties must break by vec_id")
    // all-zero vectors: cosine is NaN for the kmeans path — assignment
    // must still produce a non-negative cid for every row, never -1/null
    val zeros = (1L to 20L).map(i => (i, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val zTop = Similarity.ivfTopK(zeros, zeros.filter(col("vec_id") === 1L),
      k = 2, nlist = 4, nprobe = 2, iters = 1)
    assert(zTop.count() === 2, "zero vectors must still be indexed and found")
    val zBooks = Pq.pqCodebooks(zeros, m = 8, ksub = 4, iters = 1)
    assert(Pq.pqEncode(zeros, zBooks).filter(col("code") < 0).count() === 0)
    // NaN elements: encode must not throw (BigDecimal.valueOf rejects
    // non-finite — the kernel guards like Catalyst Round) and must stay
    // bit-identical to the composed form
    val nans = Seq((1L, Seq.fill(64)(Float.NaN)), (2L, Seq.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val nanRows = nans.select(
        Pq.encodeExpr(col("embedding"), sameBooks, dsub = 8).as("native"),
        Pq.encodeExprViaColumns(col("embedding"), sameBooks, dsub = 8).as("composed"))
      .collect()
    nanRows.foreach { r =>
      assert(!r.isNullAt(0) && r.getLong(0) >= 0L, s"native NaN encode invalid: $r")
      assert(r.getLong(0) === r.getLong(1), s"NaN parity broke: $r")
    }
    // a null embedding must land on list 0 of the written index (not the
    // invisible default partition) with a null code that never surfaces
    val withNull = Seq((1L, Option(Seq.fill(64)(0.5f))), (2L, None))
      .toDF("vec_id", "embedding")
    val nd = java.nio.file.Files.createTempDirectory("graft-pq-null").toString
    Pq.writePqIvfIndex(withNull, nd, nlist = 2, iters = 1, m = 8, ksub = 2)
    val listed = spark.read.parquet(s"$nd/lists")
      .select(col("vec_id"), col("cid"), col("code")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.isNullAt(2))).toMap
    assert(listed.keySet === Set(1L, 2L), "every row, null embedding included, is listed")
    assert(listed(2L) === ((0, true)), "null embedding: list 0, null code")
  }

  test("ADC + refine recall@5 vs exact L2 brute force") {
    val truth = emb.select(col("vec_id"), col("embedding"))
      .join(broadcast(queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"))), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(l2Dist(col("embedding"), col("q_emb")), 4).as("d"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("d"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Pq.pqAdcTopK(emb, queries, k = 5, books, refine = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.size === 15)
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.6, s"PQ refine recall too low: $recall")
  }
}
