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

  /** Stubbed decode → per-kind feature stats; deterministic, validated in
    * MultimodalSpec, not SQL-restateable (rows-only). */
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
    None)

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
