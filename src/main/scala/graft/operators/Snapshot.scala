package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus version governance: what changed between two snapshots of the
  * same table — the audit a pipeline runs before retraining on a
  * refreshed corpus ("how much moved, and where?").
  *
  * Scale shape: one full outer join on the id (the only shuffle), with
  * row CONTENT compared as a single 64-bit xxhash of the content columns
  * computed on each side's scan — text never moves through the join, so
  * the shuffle carries (id, hash) pairs regardless of document size. A
  * hash collision (2⁻⁶⁴ per changed row) would report 'unchanged' for a
  * changed row; the oracle compares raw content, so the fixture gate
  * would catch any collision on test data.
  */
object Snapshot {

  /** Per-id change classification between two snapshots: 'added'
    * (new only), 'removed' (old only), 'changed' (both, content hash
    * differs). Unchanged rows are not emitted — at 100 TB the diff is
    * the small output, the corpus is the big input.
    *
    * @param contentCols the columns whose values define row identity;
    *                    hashed in argument order. */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame, idCol: Column,
      contentCols: Seq[Column]): DataFrame = {
    require(contentCols.nonEmpty, "snapshotDiff needs content columns")
    def slim(df: DataFrame, tag: String): DataFrame =
      df.select(idCol.cast("long").as("id"),
        xxhash64(contentCols: _*).as(s"h_$tag"))
    slim(oldDf, "old")
      .join(slim(newDf, "new").withColumnRenamed("id", "id2"),
        col("id") === col("id2"), "full_outer")
      .select(coalesce(col("id"), col("id2")).as("id"),
        when(col("id").isNull, "added")
          .when(col("id2").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("change"))
      .filter(col("change") =!= "unchanged")
  }
}
