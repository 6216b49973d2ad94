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
  *  2. else if the hottest key's CORRECTED output exceeds `skewFactor ×`
  *     the CORRECTED fair per-reducer share (AQE's
  *     skewedPartitionFactor default 5) AND the absolute floor
  *     `minSaltOutputRows` → SALT, with the bucket count sized so the
  *     hot key's output spreads back to ≈ fair share (power of two,
  *     clamped to maxSaltBuckets), executed via
  *     [[graft.operators.Skew.saltedEquiJoin]].
  *  3. else → plain SHUFFLE (sort-merge / shuffled-hash; Catalyst's pick).
  *
  * REPORTED size estimates stay one-sided (over-counts only) — a
  * capacity decision made on `estOutputRows` never under-provisions.
  * The SKEW DECISION, however, cannot ride upper bounds: when distinct
  * keys ≫ depth·width, per-cell collision mass inflates the inner
  * product quadratically but each point estimate only linearly, so the
  * upper-bound ratio hot/fair goes to ZERO as cardinality grows — the
  * uncorrected rule silently under-salted (AdvisedJoinProbe: est 1500×
  * over truth hid a 99%-one-reducer hot block). The decision therefore
  * uses count-mean-min corrected frequencies floored by the MG lower
  * bounds ([[cmmEstimate]]) against a collision-corrected inner product
  * ([[innerProductCorrected]]) — approximately unbiased on both sides
  * of the ratio, with a hard MG floor keeping dominant keys visible.
  * JoinAdvisorSpec pins the recommendation against Spark's
  * actually-executed strategy at both operating points (broadcast
  * point: BroadcastHashJoinExec in the executed plan; skew point: exact
  * hot-key share over the exact fair share), and q207's oracle restates
  * the full corrected algebra in exact integer SQL.
  */
object JoinAdvisor {

  /** q200's fixed CMS geometry: ε ≈ e/512 per row, four rows. 16 KiB of
    * long state per map task — small enough to never matter, wide enough
    * that the min-over-rows inner product is tight in practice. */
  val Depth = 4
  val Width = 512

  /** The shared `spark.graft.advisor.*` threshold block, one parse for
    * every conf-gated consumer (fuzzy join / range join / kNN graph):
    * each operator has its own ON flag but all share the threshold
    * keys, so a session tunes the advisory once and flips consumers
    * independently. */
  final case class AdvisorConf(
      broadcastMaxRows: Long, skewFactor: Double, minSaltOutputRows: Long,
      maxSaltBuckets: Int, hhCapacity: Int, targetPartitions: Option[Int],
      maxHotShare: Double = DefaultMaxHotShare,
      fullOuterCostFactor: Double = DefaultFullOuterCostFactor)

  /** Parse the shared thresholds when `flagKey` is set true; None when
    * the flag is absent or false. A malformed session conf fails NAMING
    * THE OFFENDING KEY — a bare toLong would surface as an unlocated
    * NumberFormatException deep inside the consuming operator. */
  def confGate(
      spark: org.apache.spark.sql.SparkSession,
      flagKey: String): Option[AdvisorConf] = {
    val conf = spark.conf
    def parsed[A](key: String, default: String, parse: String => A): A = {
      val raw = conf.get(key, default)
      try parse(raw)
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"$key: cannot parse '$raw' (${e.getMessage})", e)
      }
    }
    if (!parsed(flagKey, "false", _.toBoolean)) None
    else Some(confThresholds(spark))
  }

  /** The shared `spark.graft.advisor.*` threshold parse WITHOUT a flag
    * gate — [[confGate]]'s Some branch, also consumed directly by the
    * hint-gated SQL rule ([[AdvisedEquiJoinRewrite]]) where the opt-in
    * is the GRAFT_ADVISE hint itself rather than a conf flag. Same
    * fail-naming-the-key contract. */
  def confThresholds(
      spark: org.apache.spark.sql.SparkSession): AdvisorConf = {
    val conf = spark.conf
    def parsed[A](key: String, default: String, parse: String => A): A = {
      val raw = conf.get(key, default)
      try parse(raw)
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"$key: cannot parse '$raw' (${e.getMessage})", e)
      }
    }
    AdvisorConf(
      parsed("spark.graft.advisor.broadcastMaxRows", "1000000", _.toLong),
      parsed("spark.graft.advisor.skewFactor", "5.0", _.toDouble),
      parsed("spark.graft.advisor.minSaltOutputRows", "10000000", _.toLong),
      parsed("spark.graft.advisor.maxSaltBuckets", "1024", _.toInt),
      parsed("spark.graft.advisor.hhCapacity", "1024", _.toInt),
      conf.getOption("spark.graft.advisor.targetPartitions")
        .map(v => parsed("spark.graft.advisor.targetPartitions", v, _.toInt)),
      parsed("spark.graft.advisor.maxHotShare",
        DefaultMaxHotShare.toString, _.toDouble),
      parsed("spark.graft.advisor.fullOuterCostFactor",
        DefaultFullOuterCostFactor.toString, _.toDouble))
  }

  /** One side's bounded-state summary: exact non-null key count, CMS
    * cells, and heavy-hitter candidates as (hashedKey, display, mgEst). */
  final case class SideStats(
      rows: Long,
      cells: Map[(Int, Int), Long],
      heavy: Seq[(Long, String, Long)])

  /** The advisory verdict. `strategy` ∈ broadcast | shuffle | salt.
    * `estOutputRows` is the CMS inner-product UPPER BOUND on the inner
    * equi-join's cardinality (never undercounts — the reporting
    * contract); `hotKeyOutputRows` the GLOBAL max of the per-key upper
    * bounds — it bounds every key's contribution but may be attained by
    * a different key than `hotKey` names (the argmax of the CORRECTED
    * estimates); `fairShareRows` the per-reducer share
    * `estOutputRows / shufflePartitions`. The DECISION, however, rides
    * the collision-CORRECTED twins `hotKeyOutputCorrected` /
    * `fairShareCorrected` (see [[cmmEstimate]] /
    * [[innerProductCorrected]]): upper bounds inflate the fair share
    * quadratically in key cardinality but the hot key only linearly,
    * so a ratio of upper bounds goes blind exactly where salting
    * matters. `saltBuckets` is 0 unless strategy == salt.
    *
    * `hotKeys` (non-empty iff strategy == salt) names EVERY MG candidate
    * whose corrected output breaches the skew test — the TARGETED
    * salting contract (r14 advisory): an executor replicates only rows
    * carrying these keys (cost = hot rows × buckets) and joins the cold
    * remainder plain, instead of replicating the whole small side
    * buckets× (which at a 1024-bucket verdict could multiply total join
    * input by three orders of magnitude — far more than the straggler
    * it cures). The set is ≤ 2·hhCapacity display strings of driver
    * state, and the key partition it induces (hot ∪ cold, disjoint)
    * preserves inner-join semantics exactly. */
  final case class JoinAdvice(
      strategy: String,
      broadcastSide: Option[String],
      estOutputRows: Long,
      leftRows: Long,
      rightRows: Long,
      hotKey: Option[String],
      hotKeyOutputRows: Long,
      fairShareRows: Long,
      saltBuckets: Int,
      hotKeyOutputCorrected: Long = 0L,
      fairShareCorrected: Long = 1L,
      hotKeys: Seq[String] = Nil,
      hotRowShare: Double = 0.0,
      hotShareLeft: Double = 0.0,
      hotShareRight: Double = 0.0) {
    override def toString: String = strategy match {
      case "broadcast" =>
        s"broadcast(${broadcastSide.get}): rows L=$leftRows R=$rightRows, " +
          s"est output <= $estOutputRows"
      // hotKey names the argmax of the CORRECTED estimates while
      // hotKeyOutputRows is the GLOBAL max of the upper bounds — at
      // high collision mass those can be different keys, so the render
      // labels the bound as global rather than attributing it to the
      // named key (a debugger reading a salt verdict must not chase the
      // wrong key's upper bound)
      case "salt" =>
        s"salt($saltBuckets buckets): hot key ${hotKey.getOrElse("?")} " +
          s"~$hotKeyOutputCorrected output rows (global upper bound " +
          s"$hotKeyOutputRows, argmax may differ) " +
          s"vs corrected fair share $fairShareCorrected; " +
          s"est output <= $estOutputRows"
      case _ =>
        s"shuffle: rows L=$leftRows R=$rightRows, est output <= " +
          s"$estOutputRows, hottest key ~$hotKeyOutputCorrected " +
          s"(corrected fair share $fairShareCorrected; global " +
          s"upper-bound max $hotKeyOutputRows)"
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
    * driver-side re-hash of arbitrary key types is needed.
    *
    * `hhCapacity` sets the skew DETECTION FLOOR: MG only surfaces keys
    * with f > N/(capacity+1), so at the historical default 16 a hot key
    * was invisible below N/17 — the exact blind spot AdvisedJoinProbe
    * measured. 1024 entries is still trivial per-task state (~48 KiB)
    * and pulls the floor to N/1025; pass a smaller capacity explicitly
    * only when summary size genuinely matters. */
  def sideStats(df: DataFrame, key: Column, hhCapacity: Int = 1024): SideStats = {
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

  /** Count-MEAN-min point estimate (Deng & Rafiei 2007): each row's
    * counter minus its EXPECTED collision mass `(rows − cell)/(W−1)`,
    * min over rows, floored at 0 — integer algebra throughout (Long
    * division on non-negatives is the floor both engines compute), so
    * the q207 oracle restates it exactly. This is the estimator the
    * SKEW DECISION needs when distinct keys ≫ depth·width: the plain
    * min-counter estimate inflates every key by the same per-cell
    * collision mean, which cancels out of a ratio only if BOTH sides
    * of the ratio carry it — and the fair share (inner product /
    * partitions) inflates quadratically while the hot key inflates
    * linearly, so the uncorrected test goes blind exactly where
    * salting matters (AdvisedJoinProbe measured est 1500× over truth
    * at 3.4M keys, hiding a 99%-single-reducer hot block). */
  def cmmEstimate(
      cells: Map[(Int, Int), Long], rows: Long, hashedKey: Long): Long = {
    val seed = XxHash64Function.hash(hashedKey, LongType, 42L)
    var best = Long.MaxValue
    var j = 0
    while (j < Depth) {
      val b = java.lang.Math.floorMod(
        XxHash64Function.hash(j.toLong, LongType, seed), Width.toLong).toInt
      val cell = cells.getOrElse((j, b), 0L)
      best = math.min(best, cell - (rows - cell) / (Width - 1))
      j += 1
    }
    math.max(0L, best)
  }

  /** Collision-corrected inner-product estimate: the plain CMS inner
    * product's expectation is `IP_true + (Na·Nb − IP_true)/W`, so
    * `(IP·W − Na·Nb)/(W−1)` recovers an approximately unbiased IP_true
    * (exact integer algebra via BigInt — Na·Nb overflows Long at the
    * advisory's own operating point). Division detail for the q207
    * oracle-exactness argument: BigInt `/` truncates toward zero while
    * DuckDB's `//` on HUGEINT floors, and the two differ ONLY on
    * negative quotients (truncate = floor + 1 there) — every negative
    * intermediate is then absorbed by the clamp at max(floor, 0) below,
    * and on non-negative quotients the operators coincide, so the two
    * engines agree on the CLAMPED value for every input. Clamped below
    * at `floor` (the corrected hot key's own output — the join emits at
    * least its hottest key) and 0. */
  private[graft] def innerProductCorrected(
      ipUpper: Long, aRows: Long, bRows: Long, floor: Long): Long = {
    val corr = (BigInt(ipUpper) * Width - BigInt(aRows) * bRows) / (Width - 1)
    val clamped = corr.max(BigInt(math.max(floor, 0L)))
    if (clamped > Long.MaxValue) Long.MaxValue else clamped.toLong
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
  /** Verdict memoization for the HAND-WIRED consumers (the r16-verdict
    * #6 cache, extended from the SQL rule to `advise`/`adviseSelf`): a
    * bounded LRU keyed on the CANONICALIZED one-column sketch
    * projections plus every decision parameter PLUS each side's
    * relation-data fingerprint (r17 verdict #2, see
    * [[relationFingerprint]]), so a re-executed operator (a bench rep,
    * an interactive retry, a pipeline re-run over the same inputs) pays
    * the two aggregate sketch jobs ONCE — while overwriting a
    * file-backed input under its unchanged path changes the fingerprint
    * and forces a fresh verdict. Residual staleness contract: only a
    * NON-file leaf (in-memory relation mutated in place, an external V2
    * source) can still serve a stale verdict — performance-only;
    * `spark.graft.advisor.cacheSize` governs both caches (≤0 disables). */
  private type AdviseKey = (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
    Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan],
    (Long, Double, Long, Int, Int, Int, Double), Long, Long)

  /** Order-independent digest of every file-backed leaf's CURRENT
    * listing — (path, length, modificationTime) per file through the
    * relation's own FileIndex (cached by Spark; the same listing
    * planning consults, so this adds no I/O beyond a map traversal).
    * Appending, rewriting, or compacting data under an UNCHANGED path
    * changes the digest, which is exactly the staleness hazard the r16
    * path-only cache keys documented instead of closing. Leaves that are
    * not HadoopFsRelations contribute nothing — for them the
    * canonicalized plan (already in the key) remains the whole identity,
    * i.e. the documented path-only fallback. */
  private[plans] def relationFingerprint(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Long = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    var acc = 0L
    plan.foreach {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.listFiles(Nil, Nil).foreach { pd =>
            pd.files.foreach { f =>
              var h = f.getPath.toString.hashCode.toLong
              h = h * 0x9E3779B97F4A7C15L + f.getLen
              h = h * 0x9E3779B97F4A7C15L + f.getModificationTime
              acc ^= XxHash64Function.hash(h, LongType, 42L)
            }
          }
        case _ => ()
      }
      case _ => ()
    }
    acc
  }
  private val cacheCapacity =
    new java.util.concurrent.atomic.AtomicInteger(64)
  private val adviceCache =
    new java.util.LinkedHashMap[AdviseKey, JoinAdvice](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[AdviseKey, JoinAdvice]): Boolean =
        size() > cacheCapacity.get()
    }

  /** Sketch passes actually EXECUTED through advise/adviseSelf (cache
    * misses) — observed by the spec's zero-extra-jobs pin. */
  private[graft] val sketchPassCount =
    new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] def clearAdviceCache(): Unit =
    adviceCache.synchronized { adviceCache.clear() }

  // the key column must be ANALYZED before canonicalization: a raw
  // Column converts to a ColumnNodeExpression whose Origin carries the
  // call site's stack trace — two textually identical keys would never
  // compare equal. The analyzed one-column select is exactly the frame
  // sideStats computes over, so the cache key IS the sketch input;
  // the paired fingerprint is the data's CURRENT file listing.
  private def canonKey(df: DataFrame, key: Column) = {
    val analyzed = df.select(key.as("__gk")).queryExecution.analyzed
    (analyzed.canonicalized, relationFingerprint(analyzed))
  }

  private def cached(
      spark: org.apache.spark.sql.SparkSession, k: AdviseKey)(
      compute: => JoinAdvice): JoinAdvice = {
    val cap = scala.util.Try(spark.conf.get(
      "spark.graft.advisor.cacheSize", "64").trim.toInt).getOrElse(64)
    if (cap <= 0) { sketchPassCount.incrementAndGet(); return compute }
    val hit = adviceCache.synchronized {
      cacheCapacity.set(cap)
      Option(adviceCache.get(k))
    }
    hit.getOrElse {
      sketchPassCount.incrementAndGet()
      val a = compute
      adviceCache.synchronized { adviceCache.put(k, a); () }
      a
    }
  }

  def advise(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      broadcastMaxRows: Long = 1_000_000L,
      skewFactor: Double = 5.0,
      minSaltOutputRows: Long = 10_000_000L,
      maxSaltBuckets: Int = 1024,
      hhCapacity: Int = 1024,
      targetPartitions: Option[Int] = None,
      maxHotShare: Double = DefaultMaxHotShare): JoinAdvice = {
    // advise for the cluster the join will RUN on — the planning session
    // is often a notebook with a different shuffle width than the target
    // deployment; None falls back to this session's conf
    val parts = math.max(1, targetPartitions.getOrElse(
      left.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt))
    val (planL, fpL) = canonKey(left, leftKey)
    val (planR, fpR) = canonKey(right, rightKey)
    val key: AdviseKey = (planL, Some(planR),
      (broadcastMaxRows, skewFactor, minSaltOutputRows, maxSaltBuckets,
        hhCapacity, parts, maxHotShare), fpL, fpR)
    cached(left.sparkSession, key) {
      val a = sideStats(left, leftKey, hhCapacity)
      val b = sideStats(right, rightKey, hhCapacity)
      decide(a, b, parts, broadcastMaxRows, skewFactor, minSaltOutputRows,
        maxSaltBuckets, maxHotShare)
    }
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
      hhCapacity: Int = 1024,
      targetPartitions: Option[Int] = None,
      maxHotShare: Double = DefaultMaxHotShare): JoinAdvice = {
    val parts = math.max(1, targetPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt))
    val (plan0, fp0) = canonKey(df, key)
    val key0: AdviseKey = (plan0, None,
      (broadcastMaxRows, skewFactor, minSaltOutputRows, maxSaltBuckets,
        hhCapacity, parts, maxHotShare), fp0, 0L)
    cached(df.sparkSession, key0) {
      val a = sideStats(df, key, hhCapacity)
      decide(a, a, parts, broadcastMaxRows, skewFactor, minSaltOutputRows,
        maxSaltBuckets, maxHotShare)
    }
  }

  /** Hot-row-share ceiling above which a salt verdict DEMOTES to plain
    * shuffle (AQE's skew split takes over): targeted salting's cost
    * advantage is |hot rows| × buckets ≪ |frame| × buckets, and it
    * degenerates toward full replication as the REPLICATED side's hot
    * share → 1 — past the crossover AQE splits the oversized
    * partitions post-shuffle while salting pays replication BEFORE the
    * map outputs are written. The tested share is the MINIMUM across
    * sides (the best replication choice — a hot PROBE side is exactly
    * what salting cures and costs nothing to spread). Default set by
    * SaltShareProbe's min-of-2 wall/bytes ledger (q224's threshold
    * shape, shares 10/20/30/50/90% — full table in NOTES r16): every
    * probed share ≥ 10% lost BOTH ledgers to AQE's split (wall 1.9-8×,
    * bytes 2-4.5×, and the byte overhead is structural:
    * ≈ 1 + share·buckets), while the engine's real measured salt win —
    * the q224 fuzzy join, r15 SaltVsAqeProbe, wall AND bytes — sits at
    * share 0.009, 11× under the ceiling. So the ceiling is the lowest
    * probed losing point, 0.1. Overridable via
    * `spark.graft.advisor.maxHotShare`. */
  val DefaultMaxHotShare = 0.1

  /** Engagement-bar multiplier for the FULL OUTER salt decomposition
    * (r17 verdict #6, measured by FullOuterSaltProbe at sf0.1): the
    * decomposed shape A⟗B = (A⟕B) ∪all null-pad(B▷A) pays a
    * STRUCTURAL ~2× cost over the one-pass SortMergeJoin — every input
    * scans twice and both legs shuffle, measured as a 2.2–2.6× byte
    * ledger at every probed hot share (1/300 … 1/3 of input rows on
    * the hot key), with the one-pass plan winning wall at every
    * fixture-scale point (the hot reducer there is seconds, never the
    * hours-long straggler the decomposition exists to cure — the same
    * cheap-reducer regime SaltShareProbe measured for the one-sided
    * crossover). So a full-outer salt verdict must clear a bar this
    * factor DEEPER than the one-sided salt's before the rewrite
    * engages: hotCorr > factor·skewFactor·fairCorr and hotCorr ≥
    * factor·minSaltOutputRows. Set from the measured structural byte
    * ratio (2×); overridable via
    * `spark.graft.advisor.fullOuterCostFactor` (≤1 restores the r17
    * engage-on-any-salt-verdict behavior). Full table in NOTES r18. */
  val DefaultFullOuterCostFactor = 2.0

  /** The decision rule over two computed side summaries (see object doc);
    * extracted so [[advise]] and [[adviseSelf]] share one implementation
    * and the spec can drive it with synthetic stats. */
  private[graft] def decide(
      a: SideStats, b: SideStats, parts: Int,
      broadcastMaxRows: Long, skewFactor: Double,
      minSaltOutputRows: Long, maxSaltBuckets: Int,
      maxHotShare: Double = DefaultMaxHotShare): JoinAdvice = {
    require(broadcastMaxRows >= 0, "broadcastMaxRows must be >= 0")
    require(skewFactor > 0, "skewFactor must be positive")
    require(maxSaltBuckets >= 2, "maxSaltBuckets must be >= 2")
    require(maxHotShare > 0, "maxHotShare must be positive")
    val est = innerProduct(a.cells, b.cells)
    val fair = math.max(1L, est / parts)
    // hottest key: candidates from EITHER side's MG (a key hot in the
    // join output must be hot on at least one side). Two estimates per
    // candidate: the plain min-counter UPPER bound (reporting), and the
    // corrected per-side frequency max(count-mean-min, MG estimate) —
    // the MG estimate is a guaranteed LOWER bound on the true count
    // (f − N/(cap+1) ≤ mg ≤ f), so a genuinely dominant key keeps a
    // hard floor under the noise-subtracted value. All products
    // saturate (see satMul).
    def mgLow(side: SideStats, h: Long): Long =
      side.heavy.collectFirst { case (`h`, _, m) => m }.getOrElse(0L)
    val cand = (a.heavy ++ b.heavy).map { case (h, display, _) =>
      val fa = math.max(cmmEstimate(a.cells, a.rows, h), mgLow(a, h))
      val fb = math.max(cmmEstimate(b.cells, b.rows, h), mgLow(b, h))
      val out = satMul(cmsEstimate(a.cells, h), cmsEstimate(b.cells, h))
      (display, out, satMul(fa, fb), fa, fb)
    }
    // both maxima are global over the candidate set (each exactly
    // restatable in SQL); the named key follows the DECISION's value
    val hotOut = if (cand.isEmpty) 0L else cand.map(_._2).max
    val hotCorr = if (cand.isEmpty) 0L else cand.map(_._3).max
    val hotKey =
      cand.sortBy(c => (-c._3, -c._2, c._1)).headOption.map(_._1)
    val estCorr = innerProductCorrected(est, a.rows, b.rows, hotCorr)
    val fairCorr = math.max(1L, estCorr / parts)
    // the TARGETED salting set: every candidate whose corrected output
    // breaches the skew test (the argmax is in by construction),
    // deduped by display — a key hot on BOTH sides enters once, and
    // its per-side masses are counted once
    val breaching: Map[String, (Long, Long)] = cand.collect {
      case (display, _, corr, fa, fb) if corr > skewFactor * fairCorr =>
        display -> ((fa, fb))
    }.toMap
    // estimated share of each side's ROWS carrying a breaching key.
    // Only the REPLICATED side pays |hot rows| × buckets (the salted
    // side is merely spread — a 90% hot PROBE side is exactly what
    // salting cures), so the demotion metric is the share of the side
    // a consumer would best CHOOSE to replicate: the minimum. Both
    // per-side shares ride the advice so a consumer with a fixed
    // replication side (or a free choice, like the SQL rule) can honor
    // the economics.
    // clamped at 1.0: a true row share cannot exceed 1, but the SUM of
    // per-key corrected estimates over a large breaching set can (each
    // carries residual collision mass) — unclamped, the excess would
    // defeat even a deliberately-lifted ceiling (the q229 sf0.1 lesson)
    val shareA = math.min(1.0,
      if (a.rows > 0)
        breaching.values.map(_._1).foldLeft(0L)(satAdd).toDouble / a.rows
      else 0.0)
    val shareB = math.min(1.0,
      if (b.rows > 0)
        breaching.values.map(_._2).foldLeft(0L)(satAdd).toDouble / b.rows
      else 0.0)
    val hotShare = math.min(shareA, shareB)
    if (math.min(a.rows, b.rows) <= broadcastMaxRows) {
      JoinAdvice("broadcast",
        Some(if (a.rows <= b.rows) "left" else "right"),
        est, a.rows, b.rows, hotKey, hotOut, fair, 0, hotCorr, fairCorr,
        hotRowShare = hotShare, hotShareLeft = shareA, hotShareRight = shareB)
    } else if (hotCorr > skewFactor * fairCorr &&
        hotCorr >= minSaltOutputRows && hotShare <= maxHotShare) {
      // buckets sized to spread the hot key's output back to fair share
      val needed = math.max(2L, hotCorr / fairCorr)
      var buckets = 2
      while (buckets < needed && buckets < maxSaltBuckets) buckets <<= 1
      val hotSet = breaching.keys.toSeq.sorted
      JoinAdvice("salt", None, est, a.rows, b.rows, hotKey, hotOut, fair,
        math.min(buckets, maxSaltBuckets), hotCorr, fairCorr, hotSet,
        hotRowShare = hotShare, hotShareLeft = shareA, hotShareRight = shareB)
    } else {
      // includes the DEMOTED case (skew test breached but even the
      // BEST replication choice carries hotShare > maxHotShare): past
      // the measured crossover, replication costs more than the
      // straggler it cures — plain shuffle + AQE skew split is the
      // cheaper cure there (SaltShareProbe's ledger)
      JoinAdvice("shuffle", None, est, a.rows, b.rows, hotKey, hotOut,
        fair, 0, hotCorr, fairCorr,
        hotRowShare = hotShare, hotShareLeft = shareA, hotShareRight = shareB)
    }
  }
}
