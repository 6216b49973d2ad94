package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for embedding columns: the
  * ±1 "database-friendly" construction (Achlioptas 2003) that maps a
  * d-dim vector to k dims via y_j = (Σ_i s_ij·x_i)/√k with s_ij ∈ {±1}
  * drawn from a seed-derived hash. At 100 TB this is THE pre-step before
  * any ANN family: a 64→16 projection cuts every downstream distance
  * computation (brute force, LSH bucketing, IVF assignment) 4× while
  * preserving pairwise geometry to the JL distortion bound — and it is a
  * pure map-only codegen'd expression, no shuffle, no training pass, no
  * model state beyond k·d signs.
  *
  * Determinism: signs come from SplitMix64 (Steele et al. 2014 — the
  * public mixer behind java.util.SplittableRandom), evaluated driver-side
  * into literals, so the projection is replay-stable and the oracle SQL
  * (generated from the SAME sign matrix, the q98 generated-oracle device)
  * re-derives every output value with the position-ordered IEEE fold
  * (the q89 device) — bit-exact cross-engine, no RNG on either side.
  */
object Projection {

  /** SplitMix64 finalizer (public constants). */
  private def splitmix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4B9C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** signs(j)(i) ∈ {+1,−1} for output dim j, input dim i. */
  def signMatrix(inDim: Int, outDim: Int, seed: Long): Array[Array[Int]] =
    Array.tabulate(outDim, inDim) { (j, i) =>
      if ((splitmix64(seed * 0x100000001B3L + j.toLong * 65537L + i) & 1L) == 0L)
        1 else -1
    }

  /** Long-format projection table (vec_id, odim, value): one scan, one
    * posexplode — no join, no aggregate, no shuffle. value is the
    * left-fold Σ s_ij·x_i in array order divided by √k, 9dp-rounded
    * (+0.0 normalizes −0.0). Null embeddings emit k NULL-valued rows —
    * never dropped. */
  def jlProject(emb: DataFrame, vecCol: Column, idCol: Column,
      inDim: Int, outDim: Int, seed: Long): DataFrame = {
    val sm = signMatrix(inDim, outDim, seed)
    val scale = math.sqrt(outDim.toDouble)
    val projs = array((0 until outDim).map { j =>
      val signs = array(sm(j).map(s => lit(s.toDouble)): _*)
      aggregate(zip_with(vecCol.cast("array<double>"), signs, (v, s) => v * s),
        lit(0.0), _ + _) / lit(scale)
    }: _*)
    val proj = emb.filter(vecCol.isNotNull)
      .select(idCol.cast("long").as("vec_id"),
        posexplode(projs).as(Seq("odim", "value")))
      .select(col("vec_id"), col("odim"),
        (round(col("value"), 9) + lit(0.0)).as("value"))
    val nulls = emb.filter(vecCol.isNull)
      .select(idCol.cast("long").as("vec_id"),
        explode(sequence(lit(0), lit(outDim - 1))).as("odim"),
        lit(null).cast("double").as("value"))
    proj.unionByName(nulls)
  }

  /** Wide-format projection (vec_id, proj: array<double>) for feeding the
    * ANN operators directly; same fold, unrounded (the consumer rounds at
    * its own contract point). Null embeddings keep a NULL proj. */
  def jlProjectVec(emb: DataFrame, vecCol: Column, idCol: Column,
      inDim: Int, outDim: Int, seed: Long): DataFrame = {
    val sm = signMatrix(inDim, outDim, seed)
    val scale = math.sqrt(outDim.toDouble)
    val projs = array((0 until outDim).map { j =>
      val signs = array(sm(j).map(s => lit(s.toDouble)): _*)
      aggregate(zip_with(vecCol.cast("array<double>"), signs, (v, s) => v * s),
        lit(0.0), _ + _) / lit(scale)
    }: _*)
    emb.select(idCol.cast("long").as("vec_id"),
      when(vecCol.isNotNull, projs).as("proj"))
  }

  /** The oracle's sign matrix as compact per-row '+'/'-' strings —
    * embedded into generated SQL so DuckDB consumes the identical
    * geometry without restating SplitMix64. */
  def signStrings(inDim: Int, outDim: Int, seed: Long): Seq[String] =
    signMatrix(inDim, outDim, seed)
      .map(row => row.map(s => if (s > 0) '+' else '-').mkString)
      .toSeq

  /** JL-accelerated ANN: candidate top-`overfetch` by PROJECTED cosine
    * (outDim dims — 4× fewer multiplies at 64→16), exact re-rank of the
    * candidates in full dimension, cut to `k`. Both ranks are
    * deterministic on (rounded cos desc, vec_id) — the bruteForceTopK
    * contract. Null embeddings are excluded from both sides (no defined
    * similarity).
    *
    * Scale shape: this is the drop-in recall/cost dial in front of ANY
    * candidate generator — here the generator is the broadcast
    * brute-force scan (queries are model-sized), with the dominant
    * per-pair term cut outDim/inDim; feeding `jlProjectVec` output to
    * the LSH/IVF families instead composes for sublinear candidate
    * generation. The refine join touches |queries|·overfetch rows, never
    * corpus-sized. */
  def jlRefineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      overfetch: Int, inDim: Int, outDim: Int, seed: Long,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorFunctions.cosine
    val pc = jlProjectVec(corpus.filter(col(embCol).isNotNull),
      col(embCol), col(idCol), inDim, outDim, seed)
    val pq = jlProjectVec(queries.filter(col(embCol).isNotNull),
        col(embCol), col(idCol), inDim, outDim, seed)
      .select(col("vec_id").as("q_id"), col("proj").as("q_proj"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("pcos").desc, col("vec_id"))
    val cands = pc.join(broadcast(pq), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("proj"), col("q_proj")), 4).as("pcos"))
      .withColumn("rn", row_number().over(wc))
      .filter(col("rn") <= overfetch)
      .select(col("q_id"), col("vec_id"))
    val cv = corpus.select(col(idCol).as("vec_id"), col(embCol).as("c_emb"))
    val qv = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    cands.join(cv, Seq("vec_id")).join(broadcast(qv), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("c_emb"), col("q_emb")), 4).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
      .orderBy(col("q_id"), col("cos_sim").desc, col("vec_id"))
  }
}
