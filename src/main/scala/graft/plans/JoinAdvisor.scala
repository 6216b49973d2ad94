package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pre-join planning advisory: decide broadcast / shuffle / salted-shuffle
  * BEFORE paying for the join, from one bounded-state aggregate pass per
  * side.
  *
  * At the 100 TB operating point the strategy decision is the whole game:
  * a broadcast that should have been a shuffle OOMs every executor, a
  * shuffle that should have been salted stalls the stage on one reducer,
  * and discovering either mid-join costs the full scan twice. Spark's own
  * machinery decides from byte-size stats (autoBroadcastJoinThreshold) and
  * runtime partition sizes (AQE skew split) — both AFTER committing to a
  * plan shape. This advisory runs the two classic mergeable sketches over
  * the join keys first:
  *
  *  - a Count-Min sketch per side ([[CountMinAgg]], Cormode &
  *    Muthukrishnan 2005, the q200 fixed-geometry estimator): the
  *    row-wise inner product of two CMS arrays upper-bounds the inner
  *    equi-join's output cardinality `Σ_k f_A(k)·f_B(k)`, and the min
  *    over depth rows is the standard tightened estimate — never an
  *    undercount, collisions only inflate;
  *  - a Misra-Gries heavy-hitters summary per side ([[MisraGriesAgg]]):
  *    names the candidate hot keys; each candidate's per-side frequency
  *    is then point-estimated from the CMS (upper bound again), giving an
  *    upper bound on the single hottest key's share of the join output —
  *    exactly the quantity that decides salting.
  *
  * Both sketches are TypedImperativeAggregates planning as
  * ObjectHashAggregate with a partial stage: each map task ships one
  * ≤ (depth·width + capacity)-entry summary, so the advisory costs one
  * map-only pass per side at any scale (the per-side count rides the same
  * pass). Everything the decision consumes is model-sized driver state.
  *
  * Decision rule (all thresholds overridable, defaults documented):
  *  1. `min(|A|, |B|) ≤ broadcastMaxRows` → BROADCAST the smaller side.
  *  2. else if the hottest key's estimated output exceeds `skewFactor ×`
  *     the fair per-reducer share (AQE's skewedPartitionFactor default 5)
  *     AND the absolute floor `minSaltOutputRows` → SALT, with the bucket
  *     count sized so the hot key's output spreads back to ≈ fair share
  *     (power of two, clamped to maxSaltBuckets), executed via
  *     [[graft.operators.Skew.saltedEquiJoin]].
  *  3. else → plain SHUFFLE (sort-merge / shuffled-hash; Catalyst's pick).
  *
  * Estimates are deliberately one-sided (over-counts only): the advisory
  * may occasionally salt a join that would have survived, never the
  * reverse. JoinAdvisorSpec pins the recommendation against Spark's
  * actually-executed strategy at both operating points (broadcast point:
  * BroadcastHashJoinExec in the executed plan; skew point: exact hot-key
  * share over the exact fair share).
  */
object JoinAdvisor {

  /** q200's fixed CMS geometry: ε ≈ e/512 per row, four rows. 16 KiB of
    * long state per map task — small enough to never matter, wide enough
    * that the min-over-rows inner product is tight in practice. */
  val Depth = 4
  val Width = 512

  /** One side's bounded-state summary: exact non-null key count, CMS
    * cells, and heavy-hitter candidates as (hashedKey, display, mgEst). */
  final case class SideStats(
      rows: Long,
      cells: Map[(Int, Int), Long],
      heavy: Seq[(Long, String, Long)])

  /** The advisory verdict. `strategy` ∈ broadcast | shuffle | salt.
    * `estOutputRows` is the CMS inner-product upper bound on the inner
    * equi-join's cardinality; `hotKeyOutputRows` the upper bound on the
    * hottest single key's contribution; `fairShareRows` the per-reducer
    * fair share `estOutputRows / shufflePartitions` the skew test
    * compares against. `saltBuckets` is 0 unless strategy == salt. */
  final case class JoinAdvice(
      strategy: String,
      broadcastSide: Option[String],
      estOutputRows: Long,
      leftRows: Long,
      rightRows: Long,
      hotKey: Option[String],
      hotKeyOutputRows: Long,
      fairShareRows: Long,
      saltBuckets: Int) {
    override def toString: String = strategy match {
      case "broadcast" =>
        s"broadcast(${broadcastSide.get}): rows L=$leftRows R=$rightRows, " +
          s"est output <= $estOutputRows"
      case "salt" =>
        s"salt($saltBuckets buckets): hot key ${hotKey.getOrElse("?")} " +
          s"<= $hotKeyOutputRows output rows vs fair share $fairShareRows; " +
          s"est output <= $estOutputRows"
      case _ =>
        s"shuffle: rows L=$leftRows R=$rightRows, est output <= " +
          s"$estOutputRows, hottest key <= $hotKeyOutputRows " +
          s"(fair share $fairShareRows)"
    }
  }

  /** One aggregate pass: exact count + CMS + Misra-Gries over the
    * non-null keys. Null keys are filtered first — an equi-join never
    * matches them, and xxhash64 SKIPS null children (yielding the seed,
    * i.e. a phantom shared key) rather than propagating null.
    *
    * The MG child is `hash ':' display` so ONE string aggregate carries
    * both the CMS-addressable hashed key (prefix, parsed back to Long)
    * and the human-readable key (suffix, may itself contain ':') —
    * distinct keys stay distinct, and no second typed aggregate or
    * driver-side re-hash of arbitrary key types is needed. */
  def sideStats(df: DataFrame, key: Column, hhCapacity: Int = 16): SideStats = {
    require(hhCapacity > 0, "hhCapacity must be positive")
    val d = df.select(key.as("__k")).filter(col("__k").isNotNull)
    val r = d.agg(
      count(lit(1)).as("n"),
      CountMin.sketch(xxhash64(col("__k")), Depth, Width).as("cells"),
      HeavyHitters.misraGries(
        concat(xxhash64(col("__k")).cast("string"), lit(":"),
          col("__k").cast("string")), hhCapacity).as("hh")).head()
    val cells = r.getSeq[Row](1)
      .map(c => (c.getInt(0), c.getInt(1)) -> c.getLong(2)).toMap
    val heavy = r.getSeq[Row](2).map { h =>
      val item = h.getString(0)
      val cut = item.indexOf(':')
      (item.substring(0, cut).toLong, item.substring(cut + 1), h.getLong(1))
    }
    SideStats(r.getLong(0), cells, heavy)
  }

  /** CMS point estimate for a hashed key — min over rows of the addressed
    * counter, buckets re-derived with the aggregate's exact update rule
    * (seed = XXH64(item, 42), bucket_j = floorMod(XXH64(j, seed), width)).
    * Never undercounts. */
  def cmsEstimate(cells: Map[(Int, Int), Long], hashedKey: Long): Long = {
    val seed = XxHash64Function.hash(hashedKey, LongType, 42L)
    var best = Long.MaxValue
    var j = 0
    while (j < Depth) {
      val b = java.lang.Math.floorMod(
        XxHash64Function.hash(j.toLong, LongType, seed), Width.toLong).toInt
      best = math.min(best, cells.getOrElse((j, b), 0L))
      j += 1
    }
    if (best == Long.MaxValue) 0L else best
  }

  /** Saturating Long product/sum: the advisory's estimates are counts of
    * join OUTPUT rows, and at its declared 100 TB operating point
    * (~1e10 rows per side) a hot key's f_A·f_B product exceeds
    * Long.MaxValue and plain `*` wraps NEGATIVE — the skew test
    * `hotOut > skewFactor·fair` then silently fails and a must-salt join
    * ships as plain shuffle. Saturation keeps the estimates one-sided
    * (over-count only), which is the advisory's whole contract: an
    * estimate pinned at Long.MaxValue still trips every threshold. */
  private[graft] def satMul(a: Long, b: Long): Long =
    try Math.multiplyExact(a, b)
    catch { case _: ArithmeticException => Long.MaxValue }
  private[graft] def satAdd(a: Long, b: Long): Long =
    try Math.addExact(a, b)
    catch { case _: ArithmeticException => Long.MaxValue }

  /** CMS inner-product join-size estimate: min over rows of
    * Σ_col cntA·cntB — upper-bounds Σ_k f_A(k)·f_B(k) (Cormode &
    * Muthukrishnan §4.2), i.e. the inner equi-join's output rows.
    * Products and the running sum saturate at Long.MaxValue (see
    * [[satMul]]) — at 1e10-row sides the true value overflows Long. */
  def innerProduct(
      a: Map[(Int, Int), Long], b: Map[(Int, Int), Long]): Long =
    (0 until Depth).map { j =>
      a.iterator.collect { case ((`j`, c), ca) =>
        satMul(ca, b.getOrElse((j, c), 0L))
      }.foldLeft(0L)(satAdd)
    }.min

  /** The advisory. See object doc for the decision rule.
    *
    * @param broadcastMaxRows broadcast the smaller side at or below this
    *   row count. Default 1M rows: at typical dim-row widths that is
    *   ~100 MB serialized — past the conservative 10 MB conf default but
    *   squarely in the range where a broadcast still beats shuffling the
    *   100 TB side, which is the comparison that matters here.
    * @param skewFactor hot-key output > skewFactor × fair share flags
    *   skew (AQE's skewedPartitionFactor default).
    * @param minSaltOutputRows absolute floor before salting is worth the
    *   small side's ×buckets replication — below it, one reducer handles
    *   the hot key fine even if relatively skewed.
    */
  def advise(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      broadcastMaxRows: Long = 1_000_000L,
      skewFactor: Double = 5.0,
      minSaltOutputRows: Long = 10_000_000L,
      maxSaltBuckets: Int = 1024,
      hhCapacity: Int = 16,
      targetPartitions: Option[Int] = None): JoinAdvice = {
    val a = sideStats(left, leftKey, hhCapacity)
    val b = sideStats(right, rightKey, hhCapacity)
    // advise for the cluster the join will RUN on — the planning session
    // is often a notebook with a different shuffle width than the target
    // deployment; None falls back to this session's conf
    val parts = math.max(1, targetPartitions.getOrElse(
      left.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt))
    decide(a, b, parts, broadcastMaxRows, skewFactor, minSaltOutputRows,
      maxSaltBuckets)
  }

  /** [[advise]] for a SELF-join (both inputs one frame, one key): the
    * sketch pass runs ONCE and serves both sides — a fuzzy join or
    * near-dup pair generator pays one map-only scan for its strategy
    * decision instead of two. */
  def adviseSelf(
      df: DataFrame, key: Column,
      broadcastMaxRows: Long = 1_000_000L,
      skewFactor: Double = 5.0,
      minSaltOutputRows: Long = 10_000_000L,
      maxSaltBuckets: Int = 1024,
      hhCapacity: Int = 16,
      targetPartitions: Option[Int] = None): JoinAdvice = {
    val a = sideStats(df, key, hhCapacity)
    val parts = math.max(1, targetPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt))
    decide(a, a, parts, broadcastMaxRows, skewFactor, minSaltOutputRows,
      maxSaltBuckets)
  }

  /** The decision rule over two computed side summaries (see object doc);
    * extracted so [[advise]] and [[adviseSelf]] share one implementation
    * and the spec can drive it with synthetic stats. */
  private[graft] def decide(
      a: SideStats, b: SideStats, parts: Int,
      broadcastMaxRows: Long, skewFactor: Double,
      minSaltOutputRows: Long, maxSaltBuckets: Int): JoinAdvice = {
    require(broadcastMaxRows >= 0, "broadcastMaxRows must be >= 0")
    require(skewFactor > 0, "skewFactor must be positive")
    require(maxSaltBuckets >= 2, "maxSaltBuckets must be >= 2")
    val est = innerProduct(a.cells, b.cells)
    val fair = math.max(1L, est / parts)
    // hottest key's output upper bound: candidates from EITHER side's MG
    // (a key hot in the join output must be hot on at least one side);
    // per-side frequencies from the CMS point estimate (over-count only —
    // MG's own est may undercount by N/(capacity+1))
    val (hotKey, hotOut) =
      (a.heavy ++ b.heavy).foldLeft(Option.empty[String] -> 0L) {
        case ((bk, bo), (h, display, _)) =>
          // saturating: per-side frequencies near 2^32 would wrap the
          // product negative and un-flag the hottest key (see satMul)
          val out = satMul(cmsEstimate(a.cells, h), cmsEstimate(b.cells, h))
          if (out > bo) (Some(display), out) else (bk, bo)
      }
    if (math.min(a.rows, b.rows) <= broadcastMaxRows) {
      JoinAdvice("broadcast",
        Some(if (a.rows <= b.rows) "left" else "right"),
        est, a.rows, b.rows, hotKey, hotOut, fair, 0)
    } else if (hotOut > skewFactor * fair && hotOut >= minSaltOutputRows) {
      // buckets sized to spread the hot key's output back to fair share
      val needed = math.max(2L, hotOut / fair)
      var buckets = 2
      while (buckets < needed && buckets < maxSaltBuckets) buckets <<= 1
      JoinAdvice("salt", None, est, a.rows, b.rows, hotKey, hotOut, fair,
        math.min(buckets, maxSaltBuckets))
    } else {
      JoinAdvice("shuffle", None, est, a.rows, b.rows, hotKey, hotOut,
        fair, 0)
    }
  }
}
