package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators.
  *
  * The reference's only range-flavored condition is the dedup probe's
  * same-day window (J6, TicketProcessor.php:353-373); an event pipeline at
  * scale needs the general form: the as-of join ("latest right row at or
  * before each left row, per key").
  *
  * Implementation is the union + running-last trick, not a range join:
  * tag both inputs, union them, and take `last(payload, ignoreNulls)` over
  * a (key, time)-ordered window up to the current row. One shuffle + sort
  * on (key, ts) total — no per-key collects, no candidate-interval
  * explosion, skew bounded by the hottest key like any windowed op — so
  * the plan survives arbitrary scale-up, unlike the naive non-equi join
  * (BroadcastNestedLoop) Spark would pick for `l.ts >= r.ts`.
  */
object Temporal {

  /** Point-in-interval range join WITHOUT an equi-key — "which interval
    * windows cover this event" (incident attribution, campaign windows,
    * config validity). Spark plans a bare inequality join as
    * BroadcastNestedLoopJoin/CartesianProduct — quadratic, the 100 TB
    * killer. The classic rewrite: quantize the time axis into
    * `bucketWidth`-sized epoch buckets, explode each interval into the
    * buckets it covers, bucket the point side once, equi-join on the
    * bucket, then re-check the exact predicate as a residual. Each
    * (point, interval) match surfaces EXACTLY once — the point owns one
    * bucket, so no dedup pass is needed (the interval side's explosion
    * is where the memory goes: (len/bucketWidth + 1) rows per interval;
    * pick bucketWidth near the typical interval length so the blow-up
    * stays ~2×). The join is now a plain shuffled equi-join — linear
    * shuffle, skew-safe under AQE, no nested loop.
    *
    * Column contract: the two frames must have DISJOINT column names,
    * none of them the reserved working names (__ts/__lb/__from/__to/
    * __rb — a clashing input column would be silently overwritten and
    * dropped); output is left ++ right columns per match (inner join).
    * `leftTs`/`from`/`to` are epoch-second LONG expressions over their
    * frames; the residual predicate is from <= ts <= to (inclusive).
    * Degenerate intervals with from > to are dropped (they can match
    * nothing, and sequence() would otherwise walk DESCENDING and build
    * wrong buckets). Buckets use truncating INTEGER division (the same
    * monotonic map RangeJoinRewrite injects): a double `floor(c / w)`
    * would round for |values| > 2^53 and silently drop boundary matches.
    *
    * NOTE: when `spark.graft.advisor.rangeJoin` is set, the bucket join
    * routes through the pre-join advisory ([[rangeJoinAdvised]]) with
    * the shared spark.graft.advisor.* thresholds — the advisory's
    * sketch pass then runs EAGERLY at plan-construction time (two
    * map-only Spark jobs over the bucket keys), even if the returned
    * frame is never executed. */
  def rangeJoin(
      left: DataFrame, leftTs: Column,
      right: DataFrame, from: Column, to: Column,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 65536L): DataFrame =
    graft.plans.JoinAdvisor.confGate(
        left.sparkSession, "spark.graft.advisor.rangeJoin") match {
      case Some(c) =>
        rangeJoinAdvised(left, leftTs, right, from, to, bucketWidth,
          maxBucketsPerInterval, c.broadcastMaxRows, c.skewFactor,
          c.minSaltOutputRows, c.maxSaltBuckets, c.hhCapacity,
          c.targetPartitions, c.maxHotShare)._2
      case None =>
        val (lb, rb) = rangeJoinSides(
          left, leftTs, right, from, to, bucketWidth, maxBucketsPerInterval)
        rangeJoinSteered(lb, rb, steer = None)
    }

  /** [[rangeJoin]] with the bucket equi-join STEERED by the pre-join
    * advisory ([[graft.plans.JoinAdvisor.advise]] over the two bucket-key
    * frames — the point side's bucket column and the interval side's
    * EXPLODED buckets): broadcast the smaller side while it is
    * dimension-sized, TARGETED-salt when hot buckets dominate (a bucket
    * that many intervals cover AND many points hit is exactly the
    * one-reducer hot-block shape — dense incident windows over a busy
    * hour), plain shuffle otherwise. Returns the advice WITH the joined
    * frame so callers (and the graded queries q225/q229) can pin the
    * executed plan against the recommendation. Results are identical
    * under every strategy — steering moves shuffle placement, never
    * semantics.
    *
    * The salt path replicates ONLY rows carrying the advice's MG-named
    * hot buckets ([[graft.plans.JoinAdvisor.JoinAdvice.hotKeys]]) and
    * unions a plain join of the cold remainder — the targeted-salting
    * contract (cost = hot rows × buckets, never |intervals| × buckets).
    *
    * NOTE: the advisory's sketch pass runs EAGERLY here (two map-only
    * Spark jobs, one per side — the interval side's includes its bucket
    * explosion) at call time, even if the returned frame is never
    * executed: the advice must exist before the join's shape can be
    * chosen. */
  def rangeJoinAdvised(
      left: DataFrame, leftTs: Column,
      right: DataFrame, from: Column, to: Column,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 65536L,
      broadcastMaxRows: Long = 1_000_000L,
      skewFactor: Double = 5.0,
      minSaltOutputRows: Long = 10_000_000L,
      maxSaltBuckets: Int = 1024,
      hhCapacity: Int = 1024,
      targetPartitions: Option[Int] = None,
      maxHotShare: Double = graft.plans.JoinAdvisor.DefaultMaxHotShare)
      : (graft.plans.JoinAdvisor.JoinAdvice, DataFrame) = {
    val (lb, rb) = rangeJoinSides(
      left, leftTs, right, from, to, bucketWidth, maxBucketsPerInterval)
    val advice = graft.plans.JoinAdvisor.advise(
      lb.select(col("__lb")), col("__lb"),
      rb.select(col("__rb")), col("__rb"),
      broadcastMaxRows, skewFactor, minSaltOutputRows, maxSaltBuckets,
      hhCapacity, targetPartitions, maxHotShare)
    (advice, rangeJoinSteered(lb, rb, Some(advice)))
  }

  /** The two bucketed join sides (shared by [[rangeJoin]] and
    * [[rangeJoinAdvised]]): the point side carries `__ts`/`__lb`, the
    * interval side `__from`/`__to` and one exploded `__rb` row per
    * covered bucket. */
  private def rangeJoinSides(
      left: DataFrame, leftTs: Column,
      right: DataFrame, from: Column, to: Column,
      bucketWidth: Long,
      maxBucketsPerInterval: Long): (DataFrame, DataFrame) = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val reserved = Set("__ts", "__lb", "__from", "__to", "__rb", "__sl", "__sr")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"range join requires disjoint columns: $overlap")
    val clash = (left.columns.toSet ++ right.columns.toSet).intersect(reserved)
    require(clash.isEmpty, s"range join reserves working columns: $clash")
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
    def bucketOf(c: Column): Column = toColumn(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        toExpression(c), org.apache.spark.sql.catalyst.expressions.Literal(
          bucketWidth)))
    val lb = left.withColumn("__ts", leftTs.cast("long"))
      .withColumn("__lb", bucketOf(col("__ts")))
    // span guard (the optimizer twin's maxbuckets cap): one open-ended
    // sentinel interval (to = Long.MaxValue) would make sequence()
    // attempt a ~2^50-element array and kill the task with an opaque
    // allocation error — fail EXPLICITLY, naming the parameter, instead.
    // Null-safe even though it runs after the from<=to filter: Catalyst
    // combines consecutive filters into one And, and And evaluates the
    // right leg when the left is NULL (null bounds) — a NULL span must
    // answer true (the And's NULL left then drops the row), never raise.
    // span = bucket count - 1, so the strict < makes the enforced cap
    // agree with the parameter name and message (≤ admitted max+1)
    val span = bucketOf(col("__to")) - bucketOf(col("__from"))
    val spanOk = when(
      span.isNull || span < lit(maxBucketsPerInterval), lit(true))
      .otherwise(raise_error(concat(
        lit(s"Temporal.rangeJoin: an interval spans more than " +
          s"$maxBucketsPerInterval buckets of width $bucketWidth " +
          "(maxBucketsPerInterval) — raise bucketWidth or " +
          "maxBucketsPerInterval, or exclude open-ended sentinel " +
          "intervals; offending [from,to]=["),
        col("__from"), lit(","), col("__to"), lit("]"))))
    val rb = right
      .withColumn("__from", from.cast("long"))
      .withColumn("__to", to.cast("long"))
      .filter(col("__from") <= col("__to"))
      .filter(spanOk)
      .withColumn("__rb",
        explode(sequence(bucketOf(col("__from")), bucketOf(col("__to")))))
    (lb, rb)
  }

  /** The bucket equi-join under a strategy verdict (`None` = Catalyst's
    * static pick, the [[rangeJoin]] behavior). Salt is TARGETED: hot
    * buckets (the advice's MG-named breaching keys) split the point
    * side's rows over `saltBuckets` reducers by ts-hash while the
    * interval side's hot rows replicate once per salt value; cold
    * buckets join plain. The bucket-key partition (hot ∪ cold,
    * disjoint) splits the match space exactly — the equi-conjunct
    * `__lb === __rb` means no match can straddle it. Both salted legs
    * pin `shuffle_hash`: a salt verdict asserts the sides are past
    * broadcast at deployment scale, and letting small-scale byte stats
    * re-broadcast the replicated side would execute replication AND
    * broadcast (double-pay) while un-executing the advisory. */
  private def rangeJoinSteered(
      lb: DataFrame, rb: DataFrame,
      steer: Option[graft.plans.JoinAdvisor.JoinAdvice]): DataFrame = {
    val cond = col("__lb") === col("__rb") &&
      col("__ts") >= col("__from") && col("__ts") <= col("__to")
    val working = Seq("__ts", "__lb", "__from", "__to", "__rb")
    val joined = steer.map(_.strategy).getOrElse("static") match {
      case "broadcast" =>
        if (steer.get.broadcastSide.contains("left"))
          broadcast(lb).join(rb, cond)
        else lb.join(broadcast(rb), cond)
      case "salt" =>
        val buckets = steer.get.saltBuckets
        require(steer.get.hotKeys.nonEmpty,
          "salt verdict without hotKeys — advisory contract violation")
        // MG display strings of a long bucket key parse back exactly
        val hot = steer.get.hotKeys.map(_.toLong)
        val hotL = lb.filter(col("__lb").isin(hot: _*))
          .withColumn("__sl",
            pmod(xxhash64(col("__ts")), lit(buckets)).cast("int"))
        val hotR = rb.filter(col("__rb").isin(hot: _*))
          .withColumn("__sr", explode(array((0 until buckets).map(lit): _*)))
        val hotJoin = hotL.hint("shuffle_hash")
          .join(hotR, cond && col("__sl") === col("__sr"))
          .drop("__sl", "__sr")
        val coldJoin = lb.filter(!col("__lb").isin(hot: _*))
          .hint("shuffle_hash")
          .join(rb.filter(!col("__rb").isin(hot: _*)), cond)
        hotJoin.unionByName(coldJoin)
      case _ =>
        lb.join(rb, cond)
    }
    joined.drop(working: _*)
  }

  /** Interval×interval OVERLAP join — the second classic temporal join
    * shape next to point-in-interval [[rangeJoin]]: pairs whose spans
    * intersect (incident windows × maintenance windows, session ×
    * campaign). Spark plans the bare `lf <= rt AND rf <= lt` as a
    * nested-loop; here BOTH sides explode into covered epoch buckets,
    * equi-join on the bucket, then keep the exact overlap as a residual.
    * A pair sharing k buckets would match k times — the OWNERSHIP rule
    * dedups without a distinct pass: a pair counts only in the FIRST
    * bucket both cover, `bucket == greatest(bucket(lf), bucket(rf))`,
    * which exists for every overlapping pair (any shared instant's
    * bucket is shared) and is unique by construction. Same null-safe
    * span cap as rangeJoin on each side; same disjoint/reserved column
    * contract. */
  def intervalOverlapJoin(
      left: DataFrame, lFrom: Column, lTo: Column,
      right: DataFrame, rFrom: Column, rTo: Column,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 65536L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val reserved = Set("__lf", "__lt", "__rf", "__rt", "__lb", "__rb")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"overlap join requires disjoint columns: $overlap")
    val clash = (left.columns.toSet ++ right.columns.toSet).intersect(reserved)
    require(clash.isEmpty, s"overlap join reserves working columns: $clash")
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
    def bucketOf(c: Column): Column = toColumn(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        toExpression(c), org.apache.spark.sql.catalyst.expressions.Literal(
          bucketWidth)))
    def prep(df: DataFrame, from: Column, to: Column,
        fc: String, tc: String, bc: String): DataFrame = {
      val side = df.withColumn(fc, from.cast("long"))
        .withColumn(tc, to.cast("long"))
        .filter(col(fc) <= col(tc))
      // strict <: span is bucket count - 1 (see rangeJoin)
      val span = bucketOf(col(tc)) - bucketOf(col(fc))
      val spanOk = when(
        span.isNull || span < lit(maxBucketsPerInterval), lit(true))
        .otherwise(raise_error(concat(
          lit(s"Temporal.intervalOverlapJoin: an interval spans more " +
            s"than $maxBucketsPerInterval buckets of width $bucketWidth " +
            "(maxBucketsPerInterval) — raise bucketWidth or the cap, or " +
            "exclude open-ended sentinel intervals; offending [from,to]=["),
          col(fc), lit(","), col(tc), lit("]"))))
      side.filter(spanOk)
        .withColumn(bc, explode(sequence(bucketOf(col(fc)), bucketOf(col(tc)))))
    }
    val lb = prep(left, lFrom, lTo, "__lf", "__lt", "__lb")
    val rb = prep(right, rFrom, rTo, "__rf", "__rt", "__rb")
    lb.join(rb, col("__lb") === col("__rb")
        && col("__lf") <= col("__rt") && col("__rf") <= col("__lt")
        && col("__lb") === greatest(
          bucketOf(col("__lf")), bucketOf(col("__rf"))))
      .drop("__lf", "__lt", "__rf", "__rt", "__lb", "__rb")
  }

  /** Data-derived default `bucketWidth` for [[rangeJoin]] /
    * [[intervalOverlapJoin]] — the nlist/winnowMaxDf pattern applied to
    * the time axis, so a 100 TB caller cannot hand-pick a width that
    * explodes the interval fan-out. One GK-quantile pass
    * ([[Sketches.gkQuantiles]]'s approxQuantile machinery, bounded
    * summary state) over the interval spans `to - from` yields:
    *
    *  - the MEDIAN span: a width near the typical interval length keeps
    *    the per-interval explosion at ~2 rows (the operator doc's
    *    guidance, now derived instead of trusted);
    *  - the MAX span (GK retains extremes, so p=1.0 is exact): the
    *    width floor `maxSpan/(cap-2) + 1` guarantees even the widest
    *    interval clears the strict `span < maxBucketsPerInterval` guard
    *    (bucket span ≤ floor(len/w) + 1), so the derived width can
    *    never trip the cap it is paired with.
    *
    * The result is `max(median, floor)` — wide data pushes the width up
    * via the median, a heavy tail pushes it up via the cap floor.
    * Degenerate spans (null bounds, from > to) are excluded, matching
    * both joins' drop semantics; an empty interval side returns 1 (any
    * width is correct for zero intervals). */
  def deriveBucketWidth(
      intervals: DataFrame, from: Column, to: Column,
      maxBucketsPerInterval: Long = 65536L,
      relErr: Double = 0.01): Long =
    deriveFromSpans(
      intervals.select((to.cast("long") - from.cast("long")).as("__span")),
      maxBucketsPerInterval, relErr)

  /** [[deriveBucketWidth]] over BOTH sides of an interval×interval
    * overlap join (both sides explode, so both spans matter): the union
    * of the two span distributions feeds one derivation. */
  def deriveBucketWidth2(
      left: DataFrame, lFrom: Column, lTo: Column,
      right: DataFrame, rFrom: Column, rTo: Column,
      maxBucketsPerInterval: Long = 65536L): Long =
    deriveFromSpans(
      left.select((lTo.cast("long") - lFrom.cast("long")).as("__span"))
        .unionByName(right.select(
          (rTo.cast("long") - rFrom.cast("long")).as("__span"))),
      maxBucketsPerInterval, relErr = 0.01)

  private def deriveFromSpans(
      spans: DataFrame, maxBucketsPerInterval: Long, relErr: Double): Long = {
    require(maxBucketsPerInterval > 2,
      "maxBucketsPerInterval must be > 2 (a width satisfying the span " +
        "guard must leave room for the +1 boundary bucket)")
    require(relErr > 0 && relErr < 1, "relErr must be in (0, 1)")
    val valid = spans.filter(col("__span").isNotNull && col("__span") >= 0)
    val cuts = valid.stat.approxQuantile("__span", Array(0.5, 1.0), relErr)
    if (cuts.isEmpty) 1L
    else {
      val median = math.max(1L, math.round(cuts(0)))
      val maxSpan = math.max(0L, math.round(cuts(1)))
      val floor = maxSpan / (maxBucketsPerInterval - 2) + 1L
      math.max(median, floor)
    }
  }

  /** Left as-of join: every left row, joined to the nearest right row at
    * or before its timestamp (`direction = "backward"`, the default:
    * latest right with `right.ts <= left.ts`) or at or after it
    * (`direction = "forward"`: earliest right with `right.ts >=
    * left.ts` — the "time to next event" shape: next purchase after a
    * signup, next deploy after an alert). Equal keys required; ties
    * (equal timestamps) match in both directions. Right columns surface
    * as `<name><suffix>`; left rows with no match keep nulls.
    *
    * Both directions are ONE plan: union the sides, sort within each key
    * along the direction of time, and carry the last-seen right payload
    * — forward is backward scanned from the other end (descending ts),
    * so no second implementation exists to drift. If several right rows
    * share (key, ts), which payload wins is partitioning-dependent —
    * dedup the right side first when that pair is not unique.
    *
    * @param rightPayloadCols right columns to carry (right's ts column is
    *                         always carried)
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, rightTs: String,
      rightPayloadCols: Seq[String] = Nil, suffix: String = "_asof",
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward").contains(direction),
      s"asofJoin direction must be backward|forward, got '$direction'")
    val payloadFields = (rightTs +: rightPayloadCols).distinct
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    // SQL join semantics: a null key or null ts on the right can never
    // satisfy `right.ts <= left.ts AND keys equal` — but unfiltered it
    // would sort nulls-first into the window and win last(ignoreNulls)
    val r = right
      .filter(col(rightTs).isNotNull && keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keyCols.map(col) ++ Seq(
          col(rightTs).as("__ts"), lit(0).as("__side"),
          struct(payloadFields.map(col): _*).as("__payload")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows order before left rows at equal ts, so ties match;
    // forward scans time DESCENDING (preceding rows have later ts, and
    // the last-seen right is the earliest at-or-after)
    val tsOrder =
      if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val outCols = left.columns.map(col) ++
      payloadFields.map(f => col(s"__match.$f").as(s"$f$suffix"))
    matched.select(outCols: _*)
  }

  /** Resample-to-grid + linear interpolation: per key, aggregate values
    * onto a regular time grid (`truncUnit` buckets), then fill interior
    * gaps by linear interpolation between the nearest observed neighbors.
    * The time-series normalizer every metrics/feature pipeline needs
    * before windowed models — Spark has no built-in for it.
    *
    * Scale shape: one aggregation shuffle onto (key, bucket); the grid is
    * generated per key from its own [min, max] span (sequence + explode —
    * grid size is span/step per key, never global); the fill is two
    * running windows over (key, bucket) — the same partitioning the
    * aggregate already produced, and AQE sees the narrow post-agg frame.
    * No driver-side state, no per-key collects. Skew = hottest key's span
    * / step, a deployment knob via `step`.
    *
    * Determinism: bucket means snap to 4dp BEFORE interpolation and the
    * interpolated value snaps to 4dp after, so a re-derivation from the
    * same buckets is bit-stable; time arithmetic is exact (integral
    * epoch seconds in doubles « 2^53). For fixed-point inputs — most
    * telemetry is 2dp decimals riding a double column — pass
    * `valueScale` (e.g. 100 for 2dp): the bucket mean then computes as
    * an EXACT integer sum scaled once at the end, immune to summation
    * order. A float sum is order-dependent, and at scale the order
    * isn't even stable across Spark's own reruns (partial-aggregation
    * ordering follows partitioning) — when a bucket mean lands exactly
    * on a 4dp half-boundary (common for cents/n), the tie would
    * otherwise break differently run-to-run and engine-to-engine
    * (observed: 3/3600 cells at sf0.1). `valueScale = 0` keeps the
    * generic float path for genuinely continuous inputs.
    *
    * Output: (key, bucket_ts, v_filled, interpolated) — every grid slot
    * in the key's observed span. Grid edges are always observed (the
    * span's endpoints are observations), so every gap has both
    * neighbors. */
  def gapFillInterpolate(
      df: DataFrame, key: Column, ts: Column, value: Column,
      truncUnit: String = "hour",
      step: Column = expr("interval 1 hour"),
      valueScale: Int = 0): DataFrame = {
    require(valueScale == 0 || (valueScale > 0 && 10000 % valueScale == 0),
      "valueScale must be 0 (float path) or a positive divisor of 10^4")
    // fixed-point path: exact integer sum, one float division at the
    // end — the whole expression is the same bits under any summation
    // order; float path: conventional 4dp-rounded mean
    val mean4 =
      if (valueScale > 0)
        floor(sum(round(value * lit(valueScale), 0).cast("long"))
            .cast("double") * lit(10000.0 / valueScale) /
            count(lit(1)).cast("double") + lit(0.5)) / lit(1e4)
      else round(avg(value), 4)
    val agg = df
      .groupBy(key.as("__key"), date_trunc(truncUnit, ts).as("__h"))
      .agg(mean4.as("__v"))
    val grid = agg
      .groupBy(col("__key"))
      .agg(min(col("__h")).as("__mn"), max(col("__h")).as("__mx"))
      .select(col("__key"),
        explode(sequence(col("__mn"), col("__mx"), step)).as("__h"))
    val j = grid.join(agg, Seq("__key", "__h"), "left")
    val wPrev = Window.partitionBy(col("__key")).orderBy(col("__h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("__key")).orderBy(col("__h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsH = when(col("__v").isNotNull, col("__h"))
    val pv = last(col("__v"), ignoreNulls = true).over(wPrev)
    val ph = last(obsH, ignoreNulls = true).over(wPrev)
    val nv = first(col("__v"), ignoreNulls = true).over(wNext)
    val nh = first(obsH, ignoreNulls = true).over(wNext)
    // exact integral epochs in doubles; ph < h < nh inside a gap so the
    // denominator is never zero where the branch is taken
    val frac = (unix_timestamp(col("__h")) - unix_timestamp(ph))
      .cast("double") /
      (unix_timestamp(nh) - unix_timestamp(ph)).cast("double")
    // floor-snap, not round(): the interpolated double can land exactly
    // on a 4dp half-boundary, where Spark's round (shortest-decimal-repr
    // BigDecimal) and numeric-rounding engines disagree by one final
    // digit — plain IEEE floor(x·10⁴+0.5)/10⁴ is the same bits in any
    // engine (see graft.operators.Graph's snap note)
    val interp = floor((pv + (nv - pv) * frac) * lit(1e4) + lit(0.5)) / lit(1e4)
    j.select(
      col("__key").as("key"),
      col("__h").as("bucket_ts"),
      when(col("__v").isNotNull, col("__v"))
        .otherwise(interp).as("v_filled"),
      col("__v").isNull.as("interpolated"))
  }
}
