package graft

import org.apache.spark.sql.functions._
import graft.operators.Projection

/** JL ±1 random projection (operators.Projection) and embedding
  * decontamination (operators.Similarity.embeddingDecontamination). */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.sources.Tables(spark, sfDir).embeddings

  test("sign matrix is seed-deterministic and seed-sensitive") {
    val a = Projection.signMatrix(64, 16, 7L)
    val b = Projection.signMatrix(64, 16, 7L)
    val c = Projection.signMatrix(64, 16, 8L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
    // signs are balanced-ish (a degenerate all-+1 matrix would project
    // every vector onto one line)
    val plus = a.flatten.count(_ > 0)
    assert(plus > 64 * 16 / 4 && plus < 64 * 16 * 3 / 4)
  }

  test("long and wide forms agree") {
    val long = Projection.jlProject(emb, col("embedding"), col("vec_id"),
      64, 16, 7L)
    val wide = Projection.jlProjectVec(emb, col("embedding"), col("vec_id"),
      64, 16, 7L)
      .filter(col("proj").isNotNull)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("odim", "value")))
      .select(col("vec_id"), col("odim"),
        (round(col("value"), 9) + lit(0.0)).as("value"))
    assert(long.filter(col("value").isNotNull).except(wide).count() == 0)
    assert(wide.except(long.filter(col("value").isNotNull)).count() == 0)
  }

  test("JL projection preserves pairwise squared distance in expectation") {
    // JL with k=16: per-pair distortion is loose, but the MEAN relative
    // error over many pairs concentrates — pin the statistical contract
    // (mean |d_proj²/d² − 1| well under 1) without flaky per-pair bounds.
    val vecs = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(40).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val sm = Projection.signMatrix(64, 16, 7L)
    def proj(x: Array[Double]): Array[Double] =
      sm.map(row => row.zip(x).map { case (s, xi) => s * xi }.sum / 4.0)
    val rel = for {
      i <- vecs.indices; j <- vecs.indices if i < j
      d2 = vecs(i)._2.zip(vecs(j)._2).map { case (a, b) => (a - b) * (a - b) }.sum
      if d2 > 0
      p2 = proj(vecs(i)._2).zip(proj(vecs(j)._2))
        .map { case (a, b) => (a - b) * (a - b) }.sum
    } yield math.abs(p2 / d2 - 1.0)
    assert(rel.nonEmpty)
    assert(rel.sum / rel.size < 0.5,
      s"mean distortion ${rel.sum / rel.size} too large")
  }

  test("null embeddings emit k null rows, never dropped") {
    val in = Seq((1L, Some(Array.fill(64)(1.0))), (2L, None))
      .toDF("vec_id", "embedding")
    val out = Projection.jlProject(in, col("embedding"), col("vec_id"),
      64, 4, 7L)
    assert(out.count() == 8)
    val n2 = out.filter(col("vec_id") === 2L)
    assert(n2.count() == 4 && n2.filter(col("value").isNull).count() == 4)
  }

  test("projection is map-only: no shuffle in the plan") {
    val plan = Projection.jlProject(emb, col("embedding"), col("vec_id"),
      64, 16, 7L).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("embedding decontamination: planted near-dup flagged, ties keep " +
      "smallest eval id, nulls survive unflagged") {
    val corpus = Seq(
      (1L, Some(Seq(1.0, 0.0))),
      (2L, Some(Seq(0.0, 1.0))),
      (3L, Option.empty[Seq[Double]])).toDF("vec_id", "embedding")
    val evalSet = Seq(
      (10L, Some(Seq(2.0, 0.0))),  // colinear with corpus 1 → cos 1
      (11L, Some(Seq(2.0, 0.0))),  // identical eval vector — rounded tie
      (12L, Some(Seq(-1.0, 1.0))),
      (13L, Option.empty[Seq[Double]])).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity
      .embeddingDecontamination(corpus, evalSet, minCos = 0.9)
      .orderBy("vec_id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 10L &&
      out(0).getDouble(2) == 1.0 && out(0).getLong(3) == 1L)
    assert(out(1).getLong(0) == 2L && out(1).getLong(1) == 12L &&
      out(1).getDouble(2) == 0.7071 && out(1).getLong(3) == 0L)
    assert(out(2).getLong(0) == 3L && out(2).isNullAt(1) &&
      out(2).isNullAt(2) && out(2).getLong(3) == 0L)
  }

  test("decontamination scan is pure map-only: no join, no shuffle") {
    val e = emb
    val plan = graft.operators.Similarity.embeddingDecontamination(
        e.filter(col("vec_id") % 10 =!= 0), e.filter(col("vec_id") % 10 === 0),
        minCos = 0.35)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
    assert(plan.contains("best_cosine"), plan)
  }

  test("native decontamination matches the composed-Column reference " +
      "bit-for-bit, including zero-norm vectors") {
    val corpus0 = emb.filter(col("vec_id") % 10 =!= 0)
    val eval0 = emb.filter(col("vec_id") % 10 === 0)
    val a = graft.operators.Similarity
      .embeddingDecontamination(corpus0, eval0, minCos = 0.35)
    val b = graft.operators.Similarity
      .embeddingDecontaminationViaColumns(corpus0, eval0, minCos = 0.35)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    // planted zero-norm corpus vector: its cosines are NaN everywhere —
    // both forms must agree it stays unflagged with a null score
    val corpusZ = Seq((1L, Some(Seq(0.0, 0.0))), (2L, Some(Seq(1.0, 0.0))))
      .toDF("vec_id", "embedding")
    val evalZ = Seq((10L, Some(Seq(3.0, 4.0)))).toDF("vec_id", "embedding")
    val az = graft.operators.Similarity
      .embeddingDecontamination(corpusZ, evalZ, minCos = 0.5)
      .orderBy("vec_id").collect()
    val bz = graft.operators.Similarity
      .embeddingDecontaminationViaColumns(corpusZ, evalZ, minCos = 0.5)
      .orderBy("vec_id").collect()
    assert(az.toSeq == bz.toSeq)
    assert(az(0).isNullAt(1) && az(0).isNullAt(2) && az(0).getLong(3) == 0L)
    assert(az(1).getLong(1) == 10L && az(1).getDouble(2) == 0.6 &&
      az(1).getLong(3) == 1L)
  }

  test("JL-refine ANN: recall floor at the registered operating point, " +
      "monotone in overfetch") {
    // the fixture's embeddings are near-random — cosines cluster in a
    // narrow band with no planted structure, which is JL's WORST case
    // (the true top-5 barely separates from ranks 6..100). The floors
    // below pin that worst case; clustered real embeddings do better.
    val queries = emb.filter(col("vec_id").isin(0L, 100L, 250L))
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet }
    val exact = sets(graft.operators.Similarity
      .bruteForceTopK(emb, queries, 5))
    def recallAt(of: Int): Double = {
      val jl = sets(graft.operators.Projection
        .jlRefineTopK(emb, queries, k = 5, overfetch = of,
          inDim = 64, outDim = 16, seed = 7L))
      assert(jl.values.forall(_.size == 5))
      exact.map { case (q, ex) =>
        (ex intersect jl.getOrElse(q, Set.empty)).size.toDouble / ex.size
      }.sum / exact.size
    }
    val r50 = recallAt(50)
    assert(r50 >= 0.6, s"JL recall@5 at overfetch=50 was $r50")
    assert(recallAt(100) >= r50, "recall must not degrade with overfetch")
  }
}
