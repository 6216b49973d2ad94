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

  /** CDC merge-apply: fold a change stream into a base snapshot — the
    * MERGE INTO of lakehouse table formats, as a pure two-shuffle plan.
    * `changes` carries (id, seq, op, payload columns); per id the
    * HIGHEST `seq` wins (a change log is at-least-once and out-of-order
    * at scale — last-writer-wins needs an explicit sequence, never
    * arrival order). Result = base rows whose id has no change, plus the
    * winning payload for ids whose last op is an upsert; ids whose last
    * op is `D` disappear.
    *
    * Plan shape: one window (or max-struct aggregate) shuffle on id over
    * the CHANGES (the small side), one anti-join shuffle against the
    * base, one zero-shuffle union — the base is never rewritten in
    * place, which is exactly how MERGE compiles on a copy-on-write
    * table. Ops other than 'U'/'D' fail loudly (a silent skip would
    * drop writes).
    *
    * @param payloadCols change columns replacing the base row's values;
    *                    must be the base's non-id columns, same names. */
  def applyCdc(
      base: DataFrame, changes: DataFrame, idCol: String, seqCol: String,
      opCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "applyCdc needs payload columns")
    val opOk = when(col(opCol).isin("U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"applyCdc: unknown op in '$opCol' (want U or D): "),
        coalesce(col(opCol), lit("NULL")))))
    // last-writer-wins via a max-struct aggregate: one shuffle on id,
    // partial map-side max — cheaper than a row_number window, which
    // must SORT every partition. struct comparison is lexicographic
    // (seq first, then op, then payload), so even a seq TIE resolves
    // deterministically instead of picking by arrival order.
    val latest = changes
      .select(col(idCol),
        struct(col(seqCol).as("seq"), opOk.as("op"),
          struct(payloadCols.map(col): _*).as("payload")).as("w"))
      .groupBy(col(idCol))
      .agg(max(col("w")).as("w"))
    val survivors = base.join(latest.select(col(idCol)), Seq(idCol),
      "left_anti")
    val upserts = latest.filter(col("w.op") === "U")
      .select(col(idCol) +: payloadCols.map(c => col(s"w.payload.$c").as(c)): _*)
    survivors.select((idCol +: payloadCols).map(col): _*)
      .unionByName(upserts)
  }

  /** Column-level diff — [[snapshotDiff]]'s row verdict sharpened to
    * WHICH columns moved: for ids present in both snapshots, the
    * null-safe per-column comparison emits the changed column names as
    * one comma-joined string in declaration order (a string, not an
    * array — the engine's driver-sortability contract). Unchanged rows
    * drop; added/removed ids are [[snapshotDiff]]'s jurisdiction. One
    * equi-join on the id; every comparison is codegen'd column algebra.
    * The audit answer "the re-crawl touched 2% of langs but 40% of
    * texts" is this frame aggregated — schema-drift triage a row-level
    * diff cannot see. */
  def columnDiff(
      old: DataFrame, newDf: DataFrame, id: Column,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "columnDiff needs at least one column")
    val o = old.select(id.as("id") +: contentCols.map(c => col(c).as(s"o_$c")): _*)
    val n = newDf.select(id.as("id") +: contentCols.map(c => col(c).as(s"n_$c")): _*)
    o.join(n, Seq("id"))
      .withColumn("changed_cols", concat_ws(",",
        contentCols.map(c =>
          when(!(col(s"o_$c") <=> col(s"n_$c")), lit(c))): _*))
      .filter(col("changed_cols") =!= "")
      .select(col("id"), col("changed_cols"))
  }

  /** SCD Type-2 history build: turn a change log into per-key validity
    * intervals — the dimension-table twin of [[applyCdc]] (which keeps
    * only the LAST state; SCD2 keeps them ALL, the shape every
    * warehouse dimension and every "what did the corpus metadata say at
    * training time" audit needs). Three window steps over one
    * (key)-partitioned sort:
    *  1. collapse runs — a change row opens a version only when its
    *     state DIFFERS from the previous row's (lag), so idempotent
    *     re-emissions of the same state never fragment the history;
    *  2. `valid_from` = the opening change's ts, `valid_to` = the next
    *     version's ts (lead; null = still current), half-open
    *     [from, to) so versions tile the timeline without overlap;
    *  3. `version` = row_number per key, `is_current` = no successor.
    *
    * Ordering must be TOTAL: `orderCols` breaks ts ties (pass the
    * change's unique id); with ties left unbroken, which duplicate-ts
    * state wins is partitioning-dependent and the history is not
    * restatable. One shuffle on the key; all three steps share the sort.
    */
  def scd2History(
      df: DataFrame, key: Column, state: Column, ts: Column,
      orderCols: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tie-breakers are carried as columns so BOTH windows (the collapse
    // lag and the validity lead/row_number) resolve the same total order
    val ties = orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }
    val base = df.select(
      Seq(key.as("key"), state.as("state"), ts.as("ts")) ++ ties: _*)
    val ord = col("ts").asc +:
      orderCols.indices.map(i => col(s"__o$i").asc)
    val w = Window.partitionBy(col("key")).orderBy(ord: _*)
    // NULL-safe change test. The first row is detected by row_number,
    // NOT by lag() returning null — lag is null both at the partition
    // head and after a genuinely-null previous STATE, and conflating
    // the two would re-open a version inside a null-state run
    val opens = base
      .withColumn("__prev", lag(col("state"), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !(col("state") <=> col("__prev")))
    opens
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("key"), col("state"), col("valid_from"),
        col("valid_to"), col("version"), col("is_current"))
  }
}
