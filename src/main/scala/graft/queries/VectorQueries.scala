package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.VectorFunctions._
import graft.operators.Similarity

/** Similarity-search surface over the `embeddings` table (64-dim float
  * vectors): vector math via higher-order functions, brute-force cosine
  * top-k with a full DuckDB oracle, blocked near-dup pairs, and the
  * LSH-bucketed ANN scale path (rows-only, recall-checked in ScalaTest).
  */
object VectorQueries extends QueryPack {

  /** Norms via transform/aggregate — elementwise math parity with a
    * double-casting DuckDB lambda oracle. */
  private val q45 = Q(
    "q45_embedding_norms",
    (s, dir) => Tables(s, dir).embeddings
      .select(col("vec_id"), col("label"),
        round(norm(col("embedding")), 4).as("l2_norm"),
        round(aggregate(col("embedding").cast("array<double>"), lit(0.0), _ + _), 4).as("sum_elems"))
      .orderBy(col("vec_id")),
    Some("""SELECT vec_id, label,
      round(sqrt(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
      round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS sum_elems
      FROM embeddings ORDER BY vec_id"""))

  /** Brute-force cosine top-5 for three fixed query vectors — broadcast
    * queries over a streaming corpus + per-query top-k window; oracle
    * recomputes cosine in SQL via zipped unnest. */
  private val q46 = Q(
    "q46_knn_bruteforce",
    (s, dir) => {
      val t = Tables(s, dir)
      Similarity.bruteForceTopK(
        t.embeddings, t.embeddings.filter(col("vec_id").isin(0L, 100L, 250L)), 5)
    },
    Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
        WHERE vec_id IN (0, 100, 250)),
      pairs AS (SELECT q.q_id, e.vec_id,
        unnest(e.embedding) AS x, unnest(q.q_emb) AS y
        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id),
      d AS (SELECT q_id, vec_id,
        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nx,
        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS ny
        FROM pairs GROUP BY q_id, vec_id),
      s AS (SELECT q_id, vec_id,
        round(dot / (sqrt(nx) * sqrt(ny)), 4) AS cos_sim,
        row_number() OVER (PARTITION BY q_id
          ORDER BY round(dot / (sqrt(nx) * sqrt(ny)), 4) DESC, vec_id) AS rn
        FROM d)
      SELECT q_id, vec_id, cos_sim FROM s WHERE rn <= 5 ORDER BY q_id, rn"""))

  /** Label-blocked near-dup pairs by cosine — candidate pairs only within a
    * blocking key, the realistic 100 TB pattern (never all-pairs). */
  private val q47 = Q(
    "q47_blocked_cosine_pairs",
    (s, dir) => Similarity.blockedCosinePairs(
        Tables(s, dir).embeddings, col("label"), 0.4)
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH e AS (SELECT label, vec_id, embedding FROM embeddings),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        unnest(a.embedding) AS x, unnest(b.embedding) AS y
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
      d AS (SELECT id_a, id_b,
        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nx,
        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS ny
        FROM p GROUP BY id_a, id_b)
      SELECT id_a, id_b, round(dot / (sqrt(nx) * sqrt(ny)), 4) AS cos_sim
      FROM d WHERE round(dot / (sqrt(nx) * sqrt(ny)), 4) >= 0.4
      ORDER BY id_a, id_b"""))

  /** LSH-bucketed ANN (random hyperplanes, multi-probe) — the scale path;
    * rows-only, recall vs q46's ground truth asserted in ScalaTest. */
  private val q48 = Q(
    "q48_knn_lsh",
    (s, dir) => {
      val t = Tables(s, dir)
      Similarity.lshTopK(
        t.embeddings, t.embeddings.filter(col("vec_id").isin(0L, 100L, 250L)),
        k = 5, nbits = 8)
    },
    None)

  /** IVF ANN (mini-k-means coarse quantizer + nprobe inverted lists) —
    * rows-only; recall vs q46 ground truth asserted in ScalaTest. */
  private val q49 = Q(
    "q49_knn_ivf",
    (s, dir) => {
      val t = Tables(s, dir)
      Similarity.ivfTopK(
        t.embeddings, t.embeddings.filter(col("vec_id").isin(0L, 100L, 250L)),
        k = 5, nlist = 8, nprobe = 3)
    },
    None)

  /** Embedding-cosine near-dup dedup survivorship (greedy keep-min-id over
    * q47's blocked pairs) — completes the dedup family on vectors. */
  private val q57 = Q(
    "q57_embedding_dedup",
    (s, dir) => Similarity.embeddingDedupSurvivors(
        Tables(s, dir).embeddings, col("label"), 0.4)
      .orderBy(col("vec_id")),
    Some("""WITH e AS (SELECT label, vec_id, embedding FROM embeddings),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        unnest(a.embedding) AS x, unnest(b.embedding) AS y
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
      d AS (SELECT id_a, id_b,
        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nx,
        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS ny
        FROM p GROUP BY id_a, id_b),
      dropped AS (SELECT DISTINCT id_b FROM d
        WHERE round(dot / (sqrt(nx) * sqrt(ny)), 4) >= 0.4)
      SELECT vec_id FROM embeddings
      WHERE vec_id NOT IN (SELECT id_b FROM dropped)
      ORDER BY vec_id"""))

  override val all: Seq[Q] = Seq(q45, q46, q47, q48, q49, q57)
}
