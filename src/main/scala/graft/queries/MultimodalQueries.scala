package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Multimodal

/** Multimodal binary-column surface: ingestion metadata (oracle-checked —
  * byte counts and content hashes are recomputable in SQL), the batched
  * feature-extraction plumbing (rows-only; decode is a documented stub),
  * and frame-sampling window math (oracle-checked).
  *
  * Every query observes the media frame (Multimodal.observedMedia): the
  * per-stage counters (n_media, n_null_payloads, total_bytes) accumulate on
  * the SAME pass that answers the query — the A2/A5 zero-extra-scan
  * discipline applied to the media pipeline; MultimodalSpec reads them via
  * ObservedMetrics.capture. */
object MultimodalQueries extends QueryPack {

  private val q70 = Q(
    "q70_media_metadata",
    (s, dir) => Multimodal.observedMedia(
        Multimodal.ingestFromDocuments(Tables(s, dir).documents))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("content_hash")).as("n_distinct_hash"))
      .orderBy(col("kind")),
    Some("""SELECT 'media/' || lang AS kind, count(*) AS n_media,
      CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
      count(DISTINCT md5(text)) AS n_distinct_hash
      FROM documents GROUP BY 1 ORDER BY kind"""))

  /** Decode → per-kind feature stats. The fixture payloads are text bytes,
    * so every row takes the stub path (magic-number gate), and the stub is
    * DESIGNED restatable: integer per-lane byte sums normalized once in
    * double, cast to float32 — the oracle mirrors the arithmetic
    * step-for-step (s/255.0/len*8 then REAL cast) and re-derives the lane
    * membership from 1-based character positions. Docs with empty text
    * produce the stub's all-zero vector via the left-join coalesce.
    * ASSUMES ASCII fixture text: the stub lanes over UTF-8 BYTES, the
    * oracle over CHARACTERS (unicode(ch)) — identical only while every
    * char is one byte (FixtureSpec pins length == octet_length at all
    * three driver SFs, so a multi-byte fixture fails a named test
    * instead of this oracle's driver hash). */
  private val q71 = Q(
    "q71_media_features",
    (s, dir) => {
      val media = Multimodal.ingestFromDocuments(Tables(s, dir).documents)
      // featureTable inlined so ONLY the decode branch is observed — the
      // media frame forks into (features ⋈ metadata) and observing both
      // branches would double-count (see observedMedia scaladoc)
      Multimodal.extractFeatures(Multimodal.observedMedia(media))
        .toDF("media_id", "feature")
        .join(media.drop("payload"), Seq("media_id"))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          round(avg(element_at(col("feature"), 1)), 4).as("avg_f0"),
          round(avg(element_at(col("feature"), Multimodal.FeatureDim)), 4).as("avg_flast"))
        .orderBy(col("kind"))
    },
    Some("""WITH cs AS (
        SELECT doc_id, lang, unnest(string_split(text,'')) AS ch,
               generate_subscripts(string_split(text,''),1) AS i
        FROM documents),
      per_doc AS (
        SELECT doc_id, lang,
          sum(CASE WHEN (i-1)%8 = 0 THEN unicode(ch) ELSE 0 END) AS s0,
          sum(CASE WHEN (i-1)%8 = 7 THEN unicode(ch) ELSE 0 END) AS s7,
          count(*) AS len
        FROM cs GROUP BY doc_id, lang),
      feat AS (
        SELECT d.doc_id, d.lang,
          CAST(coalesce(p.s0 / 255.0 / p.len * 8, 0.0) AS REAL) AS f0,
          CAST(coalesce(p.s7 / 255.0 / p.len * 8, 0.0) AS REAL) AS f7
        FROM documents d LEFT JOIN per_doc p USING (doc_id, lang))
      SELECT 'media/' || lang AS kind, count(*) AS n,
        round(avg(f0), 4) AS avg_f0, round(avg(f7), 4) AS avg_flast
      FROM feat GROUP BY 1 ORDER BY kind"""))

  private val q72 = Q(
    "q72_frame_sampling",
    (s, dir) => {
      val media = Multimodal.observedMedia(
        Multimodal.ingestFromDocuments(Tables(s, dir).documents))
      // no global orderBy: a full sort of a map-only frame would (a) be the
      // wrong shape at 100 TB and (b) double-scan the input — the range
      // partitioner samples the unshuffled child, so the observed metrics
      // would count every row twice (driver compare sorts rows itself)
      Multimodal.frameSample(media, frameBytes = 100, maxFrames = 4)
        .select(col("media_id"), col("n_frames"),
          aggregate(col("frames"), lit(0L), (acc, f) => acc + f.getField("length"))
            .as("covered_bytes"))
    },
    Some("""SELECT doc_id AS media_id,
      CAST(least(ceil(strlen(text) / 100.0), 4) AS INTEGER) AS n_frames,
      CAST(least(strlen(text), 400) AS BIGINT) AS covered_bytes
      FROM documents ORDER BY media_id"""))

  override val all: Seq[Q] = Seq(q70, q71, q72)
}
