package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §7.4: "one viral ticket =
  * many messages"). AQE's skew-join split handles most cases at runtime;
  * explicit salting is for the pathological long-tail where one key
  * dominates a partition regardless of split size.
  *
  * Pattern: the skewed (large) side gets a deterministic salt in
  * [0, buckets) derived from a high-cardinality disambiguator column; the
  * other side is replicated once per salt. The join key becomes
  * (key, salt), spreading a hot key over `buckets` reducers. Deterministic
  * (hash-derived salt, no rand()) so replays and oracles stay stable.
  */
object Skew {

  /** Equi-join `big ⋈ small` on bigKey==smallKey with the big side salted.
    * Keys are NAMES (resolved on the salted frames — passing Columns
    * captured from the input frames would carry stale expression ids).
    *
    * When the two key names coincide (the common equi-join case) the
    * small side's key column is dropped from the output, so downstream
    * `col(bigKey)` references resolve unambiguously.
    *
    * Join types are restricted to inner/left/left_semi/left_anti: the
    * small side is REPLICATED `buckets` times, so a right/full outer join
    * would emit every unmatched small row once per salt bucket — silently
    * wrong multiplicity. Salt the other input instead for those shapes.
    *
    * @param saltSource expression over `big`'s columns (plain col() refs)
    *                   with high cardinality under one key, e.g. the fact
    *                   table's line number */
  def saltedEquiJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      saltSource: Column, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedEquiJoin: joinType '$joinType' would multiply unmatched rows " +
        "of the replicated small side; only inner/left/left_semi/left_anti " +
        "are salt-safe")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(buckets)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    // resolve the keys against each frame (unqualified col(bigKey) would
    // throw AMBIGUOUS_REFERENCE whenever both sides share the key name —
    // the common case for equi-joins)
    val joined = saltedBig
      .join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"),
        joinType)
      .drop("__salt")
    // same-named keys: keep only the big side's copy (attribute-precise
    // drop; a no-op for semi/anti joins where small columns don't survive)
    if (bigKey == smallKey) joined.drop(replicatedSmall(smallKey)) else joined
  }
}
