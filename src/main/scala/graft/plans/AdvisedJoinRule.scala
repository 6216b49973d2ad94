package graft.plans

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The pre-join advisory as a CATALYST RULE: a GRAFT_ADVISE query hint
  * in SQL text (or `df.hint("graft_advise")`) routes EVERY inner
  * equi-join under the hint through [[JoinAdvisor]]'s sketch pass and
  * executes the verdict — broadcast-hint the dimension side, targeted-
  * salt the hot keys, or leave Catalyst's pick — with no operator-
  * specific wiring. Until this rule, the advisory protected exactly
  * three hand-wired consumers (fuzzy join / range join / kNN graph),
  * each repeating the same verdict→execution scaffolding; a user's own
  * `spark.sql` join got nothing. This is the r15 verdict's "promote
  * the advisory from hand-wired consumers to a Catalyst rule".
  *
  * Two opt-in gates, either suffices:
  *  - the GRAFT_ADVISE hint, resolved by [[GraftAdviseHintRule]] (in
  *    the analyzer's hint batch, BEFORE RemoveAllHints would warn-drop
  *    an unknown hint) into a [[GraftAdviseMarker]] that survives to
  *    the optimizer — per-QUERY opt-in;
  *  - `spark.graft.advisor.sql=true` — per-SESSION opt-in, every
  *    unhinted inner equi-join is advised.
  * Thresholds ride the shared `spark.graft.advisor.*` block
  * ([[JoinAdvisor.confThresholds]]), so a session tunes the advisory
  * once for the conf-gated operators AND the SQL surface.
  *
  * The sketch pass runs EAGERLY inside the optimizer (one bounded-state
  * aggregate job per join side, the same planning-time-execution move
  * AQE makes with query stages) — that is the advisory's whole point:
  * the strategy decision must exist BEFORE the join's shape is chosen,
  * and at 100 TB a wrong shape discovered mid-join costs the full scan
  * twice. Reentrancy is guarded ([[AdvisedEquiJoinRewrite.inAdvisory]]):
  * the sketch queries themselves re-enter the optimizer on the driver
  * thread, and without the guard a join-bearing child would recurse.
  *
  * Verdict execution (exactly the hand-wired consumers' algebra):
  *  - broadcast → the smaller side gets a BROADCAST [[JoinHint]]
  *    (plan-pinnable: BroadcastHashJoinExec even at
  *    autoBroadcastJoinThreshold=-1);
  *  - salt → the TARGETED union shape: rows whose key casts to one of
  *    the advisory's MG-named breaching displays split off, the left
  *    hot rows take a deterministic salt (xxhash64 over the side's
  *    hashable columns), the right hot rows replicate buckets×, the
  *    cold remainder joins plain; both legs pin SHUFFLE_HASH (a salt
  *    verdict asserts the sides are past broadcast at deployment
  *    scale — test-scale byte-stats must not re-broadcast a replicated
  *    side). Inner-join exactness: matching rows agree on the key, so
  *    the hot/cold predicate routes every matching pair to exactly one
  *    leg, and null-keyed rows (dropped by BOTH legs' filters) never
  *    match anyway;
  *  - shuffle → untouched (Catalyst's static pick), tagged so the
  *    fixed-point batch does not re-run the sketch pass.
  *
  * Scope guards (else the join is left alone): inner, left-outer,
  * left-semi, left-anti, and right-outer joins only, with per-type
  * legality — broadcast hints only a side the type can BUILD, salting
  * only replicates a side whose unmatched rows the type never emits
  * (right for left-outer/semi/anti, left for right-outer, the
  * lower-hot-share side for inner; a replicated unmatched row would
  * emit once per bucket), and null-keyed rows on the SALTED side ride
  * the cold leg so outer/anti joins still emit them. Plus:
  * deterministic children/condition, no pre-existing strategy hint
  * (which also makes the rewrite idempotent — both rewrite shapes
  * carry hints), at least one cross-side equi-conjunct (composite keys
  * advise as a struct), and no correlated subquery in the condition.
  */
case class GraftAdviseMarker(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): GraftAdviseMarker = copy(child = newChild)
}

/** Analyzer (hint batch) rule: GRAFT_ADVISE → [[GraftAdviseMarker]].
  * Must run in the HINT batch — injected via injectHintResolutionRule —
  * because the analyzer's RemoveAllHints drops unrecognized hints with
  * only a warning at the end of analysis. */
object GraftAdviseHintRule extends Rule[LogicalPlan] {
  val HintName = "GRAFT_ADVISE"
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case UnresolvedHint(name, Nil, child)
          if name.equalsIgnoreCase(HintName) =>
        GraftAdviseMarker(child)
      case UnresolvedHint(name, args, _) if name.equalsIgnoreCase(HintName) =>
        throw new IllegalArgumentException(
          s"$HintName takes no arguments (thresholds ride the " +
            s"spark.graft.advisor.* confs); got ${args.mkString(", ")}")
    }
}

object AdvisedEquiJoinRewrite extends Rule[LogicalPlan] {

  /** Session-wide opt-in: advise every unhinted inner equi-join. */
  val FlagConf = "spark.graft.advisor.sql"

  /** Joins already examined this plan (shuffle verdicts leave the node
    * unchanged — without the tag the fixed-point batch would re-run the
    * sketch pass each iteration; a rule that rebuilds the node drops
    * the tag, costing at worst a duplicate advisory, never wrong
    * results). */
  private[plans] val AdvisedTag = TreeNodeTag[Boolean]("graft.advised")

  /** A join inside a GRAFT_ADVISE-marked subtree (the SQL query-hint
    * scope: every join under the hinted SELECT). */
  private val MarkedTag = TreeNodeTag[Boolean]("graft.advise.marked")

  /** The stripped position of a marker whose subtree held no join: a
    * marked JOIN INPUT advises the join ABOVE it — the Dataset-side
    * `df.hint("graft_advise").join(dim)` idiom, mirroring how
    * broadcast(df) marks an input rather than the join node. */
  private val MarkedChildTag = TreeNodeTag[Boolean]("graft.advise.input")

  /** Reentrancy guard: the sketch pass's own aggregate queries optimize
    * on this same driver thread; advising THEM would recurse through
    * any join-bearing child. */
  private val inAdvisory = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (inAdvisory.get) return plan
    // malformed flag must not fail every query in the session (the
    // RangeJoinRewrite contract): warn and read as false
    val confOn = scala.util.Try(
      SQLConf.get.getConfString(FlagConf, "false").trim.toBoolean)
      .getOrElse {
        logWarning(s"$FlagConf is not a boolean; treating as false")
        false
      }
    val hasMarker = plan.exists(_.isInstanceOf[GraftAdviseMarker])
    if (!confOn && !hasMarker) return plan
    val session = org.apache.spark.sql.SparkSession.active
    // threshold parse failures abort the advisory, not the query: the
    // marker is still stripped (an unplannable marker node must never
    // reach the physical planner)
    val thresholds = scala.util.Try(JoinAdvisor.confThresholds(session))
    if (thresholds.isFailure)
      logWarning("advisory thresholds unparseable; GRAFT_ADVISE is " +
        s"inert this query: ${thresholds.failed.get.getMessage}")
    // phase 1 — strip markers, remembering their scope as tags: every
    // join INSIDE the marked subtree, plus the stripped position itself
    // (a marked join INPUT advises the join above — the Dataset idiom).
    // Tags survive transformUp rebuilds (withNewChildren copyTagsFrom).
    val stripped = if (!hasMarker) plan else plan.transformUp {
      case GraftAdviseMarker(child) =>
        child.foreach {
          case jj: Join => jj.setTagValue(MarkedTag, true)
          case _ => ()
        }
        child.setTagValue(MarkedChildTag, true)
        child
    }
    if (thresholds.isFailure) return stripped
    // a marked input seen through the unary chain above it (hint →
    // select → filter → join still advises the join)
    @scala.annotation.tailrec
    def inputMarked(p: LogicalPlan): Boolean =
      if (p.getTagValue(MarkedChildTag).isDefined) true
      else p match {
        case u: UnaryNode => inputMarked(u.child)
        case _ => false
      }
    stripped.transformUp {
      case j: Join if confOn || j.getTagValue(MarkedTag).isDefined ||
          j.children.exists(inputMarked) =>
        maybeAdvise(session, j, thresholds.get)
    }
  }

  /** Cross-side equi-conjuncts of `cond` as (leftKey, rightKey) pairs,
    * normalized so the first component references only `l`. */
  private[plans] def equiKeys(
      cond: Expression, l: LogicalPlan,
      r: LogicalPlan): Seq[(Expression, Expression)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    def sideOnly(e: Expression, p: LogicalPlan) =
      e.deterministic && e.references.nonEmpty &&
        e.references.subsetOf(p.outputSet)
    conjuncts(cond).collect {
      case EqualTo(a, b) if sideOnly(a, l) && sideOnly(b, r) => (a, b)
      case EqualTo(a, b) if sideOnly(a, r) && sideOnly(b, l) => (b, a)
    }
  }

  /** Join-type legality for the two rewrite shapes. Broadcast: the
    * hinted side must be a side Spark can BUILD for the type
    * (BroadcastHashJoin builds right for left-outer/semi/anti, left
    * for right-outer, either for inner). Salt: the REPLICATED side
    * must be one whose unmatched rows the type never emits (a
    * replicated unmatched row would emit once per bucket — the
    * Skew.saltedEquiJoin contract): right for left-outer/semi/anti,
    * left for right-outer, free choice (by hot share) for inner.
    * Full-outer and existence joins are never advised. */
  private def legalBroadcastSides(jt: JoinType): Set[String] = jt match {
    case Inner => Set("left", "right")
    case LeftOuter | LeftSemi | LeftAnti => Set("right")
    case RightOuter => Set("left")
    case _ => Set.empty
  }

  /** Some(replicateRight) when salting is legal for the type. */
  private def saltReplicateSide(
      jt: JoinType, advice: JoinAdvisor.JoinAdvice): Option[Boolean] =
    jt match {
      case Inner => Some(advice.hotShareRight <= advice.hotShareLeft)
      case LeftOuter | LeftSemi | LeftAnti => Some(true)
      case RightOuter => Some(false)
      case _ => None
    }

  private def maybeAdvise(
      session: org.apache.spark.sql.SparkSession, j: Join,
      conf: JoinAdvisor.AdvisorConf): LogicalPlan = j match {
    case Join(l, r, jt, Some(cond), hint)
        if (legalBroadcastSides(jt).nonEmpty || jt == FullOuter) &&
          hint == JoinHint.NONE &&
          j.getTagValue(AdvisedTag).isEmpty &&
          cond.deterministic && l.deterministic && r.deterministic &&
          !SubqueryExpression.hasSubquery(cond) =>
      val keys = equiKeys(cond, l, r)
      if (keys.isEmpty) { j.setTagValue(AdvisedTag, true); j }
      else {
        val (lk0, rk0) =
          if (keys.size == 1) keys.head
          else (CreateStruct(keys.map(_._1)), CreateStruct(keys.map(_._2)))
        // float/double key components normalize BEFORE any string
        // rendering (ADVICE r16): join equality treats -0.0 = 0.0 and
        // all NaNs as equal (Spark normalizes keys via
        // NormalizeFloatingNumbers before hashing) while their string
        // renderings differ — an un-normalized hot predicate could
        // route the two halves of a matching mixed-sign-zero pair to
        // DIFFERENT salt legs, silently dropping the match. Both the
        // sketch pass (MG displays) and the salt rewrite's isHot
        // predicate see the SAME normalized expression, so renderings
        // stay aligned with join equality; a no-op for non-float keys
        val lk = GraftColumnBridge.normalizeFloats(lk0)
        val rk = GraftColumnBridge.normalizeFloats(rk0)
        val advice = runAdvisory(session, l, r, lk, rk, conf)
        logInfo(s"GRAFT_ADVISE verdict ($jt): $advice")
        advice.strategy match {
          case "broadcast"
              if advice.broadcastSide.exists(legalBroadcastSides(jt)) =>
            val b = Some(HintInfo(Some(BROADCAST)))
            val newHint =
              if (advice.broadcastSide.contains("left")) JoinHint(b, None)
              else JoinHint(None, b)
            j.copy(hint = newHint)
          case "salt" if jt == FullOuter =>
            // the decomposition pays ~2x the one-pass plan's scan+shuffle
            // (FullOuterSaltProbe's structural byte ratio), so its
            // engagement bar sits fullOuterCostFactor DEEPER than the
            // one-sided salt verdict's: the straggler must out-cost the
            // double scan it buys, not merely breach the generic skew test
            val fo = conf.fullOuterCostFactor
            val deepEnough =
              advice.hotKeyOutputCorrected >
                fo * conf.skewFactor * advice.fairShareCorrected &&
              advice.hotKeyOutputCorrected >=
                (fo * conf.minSaltOutputRows).toLong
            if (deepEnough) fullOuterSaltRewrite(j, l, r, cond, lk, rk, advice, conf)
            else {
              logInfo(s"GRAFT_ADVISE full-outer salt demoted: breach " +
                s"${advice.hotKeyOutputCorrected} vs gate " +
                s"${fo * conf.skewFactor * advice.fairShareCorrected} " +
                s"(cost factor $fo) — one-pass join stands")
              j.setTagValue(AdvisedTag, true); j
            }
          case "salt" =>
            saltReplicateSide(jt, advice) match {
              case Some(repRight) =>
                // forced-replication economics (ADVICE r16): decide()
                // gates only min(shareLeft, shareRight) — the best FREE
                // choice — but one-sided join types force the replicated
                // side (right for left-outer/semi/anti, left for
                // right-outer). A forced side past the measured
                // maxHotShare ceiling replicates a mostly-hot side
                // buckets×, the exact regime SaltShareProbe measured at
                // 1.9–8× worse than shuffle+AQE — demote to Catalyst's
                // pick instead. Inner joins pick the min-share side, so
                // this check is a no-op there by construction.
                val repShare = if (repRight) advice.hotShareRight
                               else advice.hotShareLeft
                if (repShare > conf.maxHotShare) {
                  logInfo(s"GRAFT_ADVISE salt demoted ($jt): forced " +
                    s"replication side hot share $repShare > " +
                    s"maxHotShare ${conf.maxHotShare}")
                  j.setTagValue(AdvisedTag, true); j
                } else saltRewrite(j, l, r, cond, lk, rk, advice, repRight)
              case None => j.setTagValue(AdvisedTag, true); j
            }
          case _ =>
            // shuffle verdict, or a broadcast verdict whose smaller
            // side the join type cannot build — Catalyst's pick stands
            j.setTagValue(AdvisedTag, true); j
        }
      }
    case _ => j
  }

  /** Verdict cache size conf: a session re-running the same join shape
    * (interactive exploration, a retried statement, the driver's
    * write-time re-optimization of an unpinned plan) re-pays two
    * aggregate jobs per advised join per statement without it. ≤ 0
    * disables. */
  val CacheSizeConf = "spark.graft.advisor.cacheSize"
  private val DefaultCacheSize = 64

  /** Bounded LRU of advisory verdicts, keyed on the CANONICALIZED
    * one-column sketch projections of both sides plus the full conf
    * tuple, the RESOLVED shuffle-partition count (r17 ADVICE: when
    * conf.targetPartitions is None the fair share divides by the
    * session's current width, so two sessions differing only in
    * spark.sql.shuffle.partitions must not share a verdict), and each
    * side's relation-data fingerprint
    * ([[JoinAdvisor.relationFingerprint]], r17 verdict #2) —
    * canonicalization normalizes exprIds positionally within each
    * subtree, so two statements over the same relations with the same
    * key expressions hit regardless of their analyzer-fresh ids, while
    * any change to the child plan (filter, projection, relation path)
    * OR to a file-backed relation's data (append/rewrite/compaction
    * under the unchanged path — the listing digest moves) is a distinct
    * key. Global (not per-session): the key embeds relation paths and
    * data fingerprints, so equal keys mean semantically identical
    * sketch inputs. Residual staleness: only non-file leaves (the
    * fingerprint's documented fallback) can serve a stale verdict — a
    * performance hazard only (the salt rewrite is exact for any hot-key
    * set) — set cacheSize to 0 for such volatile inputs. */
  private type RuleCacheKey = (LogicalPlan, LogicalPlan,
    JoinAdvisor.AdvisorConf, Int, Long, Long)
  private val cacheCapacity =
    new java.util.concurrent.atomic.AtomicInteger(DefaultCacheSize)
  private val adviceCache =
    new java.util.LinkedHashMap[
      RuleCacheKey, JoinAdvisor.JoinAdvice](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[
            RuleCacheKey, JoinAdvisor.JoinAdvice]): Boolean =
        size() > cacheCapacity.get()
    }

  /** Sketch passes actually EXECUTED (cache misses) — the spec's pin
    * that a second identical advised statement runs zero additional
    * sketch jobs observes this counter, not the listener bus. */
  private[graft] val sketchPassCount =
    new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] def clearAdviceCache(): Unit =
    adviceCache.synchronized { adviceCache.clear() }

  /** The sketch pass over both join children, from inside the
    * optimizer: each side is wrapped as a one-column DataFrame (the key
    * expression aliased over the already-analyzed child — exprIds are
    * preserved, so no re-resolution ambiguity) and pays one bounded-
    * state aggregate job — memoized (r16 verdict #6) so re-advising an
    * identical (plan, key, conf) shape is a map hit, not two jobs. */
  private def runAdvisory(
      session: org.apache.spark.sql.SparkSession,
      l: LogicalPlan, r: LogicalPlan, lk: Expression, rk: Expression,
      conf: JoinAdvisor.AdvisorConf): JoinAdvisor.JoinAdvice = {
    val projL = Project(Seq(Alias(lk, "__gk")()), l)
    val projR = Project(Seq(Alias(rk, "__gk")()), r)
    val cacheSize = scala.util.Try(
      SQLConf.get.getConfString(CacheSizeConf, DefaultCacheSize.toString)
        .trim.toInt).getOrElse(DefaultCacheSize)
    // resolve the partition width BEFORE keying (r17 ADVICE): with no
    // targetPartitions the decision divides by the session's current
    // shuffle width, which must therefore be part of the verdict's
    // identity, exactly as JoinAdvisor.advise bakes it into its key
    val parts = math.max(1, conf.targetPartitions.getOrElse(
      SQLConf.get.numShufflePartitions))
    val key: RuleCacheKey = (projL.canonicalized, projR.canonicalized,
      conf, parts, JoinAdvisor.relationFingerprint(projL),
      JoinAdvisor.relationFingerprint(projR))
    if (cacheSize > 0) {
      val hit = adviceCache.synchronized {
        cacheCapacity.set(cacheSize)
        Option(adviceCache.get(key))
      }
      hit.foreach { a =>
        logInfo(s"GRAFT_ADVISE verdict served from cache: $a")
        return a
      }
    }
    inAdvisory.set(true)
    val advice = try {
      sketchPassCount.incrementAndGet()
      val lDf = GraftColumnBridge.ofRows(session, projL)
      val rDf = GraftColumnBridge.ofRows(session, projR)
      val a = JoinAdvisor.sideStats(lDf, col("__gk"), conf.hhCapacity)
      val b = JoinAdvisor.sideStats(rDf, col("__gk"), conf.hhCapacity)
      JoinAdvisor.decide(a, b, parts, conf.broadcastMaxRows,
        conf.skewFactor, conf.minSaltOutputRows, conf.maxSaltBuckets,
        conf.maxHotShare)
    } finally inAdvisory.set(false)
    if (cacheSize > 0)
      adviceCache.synchronized { adviceCache.put(key, advice); () }
    advice
  }

  /** The targeted-salt union shape in logical-plan algebra (the
    * RangeJoinRewrite house style — building through the DataFrame API
    * here would splice analyzer-fresh subtrees into a half-optimized
    * plan). Output attributes keep the ORIGINAL join's exprIds: the hot
    * leg joins the original (filtered) children, so `j.output` resolves
    * against it, and Union exposes its first child's attributes —
    * parents of the rewritten join never see the change. */
  private def saltRewrite(
      j: Join, l: LogicalPlan, r: LogicalPlan, cond: Expression,
      lk: Expression, rk: Expression,
      advice: JoinAdvisor.JoinAdvice,
      replicateRight: Boolean): LogicalPlan = {
    require(advice.hotKeys.nonEmpty,
      "salt verdict without hotKeys — advisory contract violation")
    // only the REPLICATED side pays ×buckets; for inner joins the
    // caller picked the side with the SMALLER hot-row share (decide()
    // demoted to shuffle already if even that choice is past the
    // maxHotShare crossover), for one-sided join types the legal side
    val (saltSide, saltKey, repSide, repKey) =
      if (replicateRight) (l, lk, r, rk) else (r, rk, l, lk)
    // the salt must vary WITHIN a hot key, so it hashes every hashable
    // column of the salted side; a side with no hashable columns (e.g.
    // all-map output) cannot spread and keeps Catalyst's pick
    val hashable = saltSide.output.filter(a =>
      new XxHash64(Seq(a)).checkInputDataTypes().isSuccess)
    if (hashable.isEmpty) {
      logWarning("salt verdict but no hashable column to salt on; " +
        "leaving Catalyst's pick")
      j.setTagValue(AdvisedTag, true)
      return j
    }
    val buckets = advice.saltBuckets
    // MG displays are the key CAST TO STRING (sideStats' aggregate
    // child), so the hot predicate re-renders the key identically —
    // exact for any key type, including composite structs
    val hotLits = advice.hotKeys.map(s =>
      Literal(UTF8String.fromString(s), StringType))
    def isHot(k: Expression) = In(Cast(k, StringType), hotLits)
    val saltAlias = Alias(
      Pmod(new XxHash64(hashable), Literal(buckets.toLong)), "__gsalt")()
    val hotSalted =
      Project(saltSide.output :+ saltAlias, Filter(isHot(saltKey), saltSide))
    val repSaltAttr =
      AttributeReference("__gsalt_r", LongType, nullable = false)()
    val gen = Generate(
      Explode(CreateArray((0L until buckets.toLong).map(Literal(_)))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(repSaltAttr), child = Filter(isHot(repKey), repSide))
    val sh = Some(HintInfo(Some(SHUFFLE_HASH)))
    val saltCond = And(cond, EqualTo(saltAlias.toAttribute, repSaltAttr))
    val jt = j.joinType
    val hotJoin =
      if (replicateRight)
        Join(hotSalted, gen, jt, Some(saltCond), JoinHint(sh, sh))
      else Join(gen, hotSalted, jt, Some(saltCond), JoinHint(sh, sh))
    // cold-leg routing: the SALTED side keeps its null-keyed rows (a
    // null key matches nothing, but outer/anti joins still EMIT the
    // row — dropping it from both legs would lose it; isHot is null on
    // a null key, so Not(isHot) alone would drop it too); the
    // REPLICATED side's null-keyed rows are dropped — every advised
    // type never emits that side's unmatched rows
    def coldKeep(k: Expression, salted: Boolean): Expression =
      if (salted) Or(Not(isHot(k)), IsNull(k)) else Not(isHot(k))
    val coldJoin = Join(
      Filter(coldKeep(lk, salted = replicateRight), l),
      Filter(coldKeep(rk, salted = !replicateRight), r),
      jt, Some(cond), JoinHint(sh, sh))
    // both Projects expose j.output (the original attrs ride the
    // filtered original children in BOTH legs — the same shape as a
    // self-union, which Spark executes with shared exprIds)
    Union(Seq(Project(j.output, hotJoin), Project(j.output, coldJoin)))
  }

  /** FULL OUTER salting (r16 verdict #4 — the last row of the type
    * table). The one-sided salt shape is illegal here directly: BOTH
    * sides' unmatched rows emit, and a replicated unmatched row would
    * emit once per bucket. So the join is first decomposed by the
    * classical outer-union identity
    *
    *   A ⟗ B  =  (A ⟕ B)  ∪all  null-pad(B ▷ A)
    *
    * (left-outer = inner pairs + unmatched-A exactly once; the anti leg
    * adds unmatched-B exactly once, null-padded on A's columns) — and
    * each leg is a join type the salt shape IS legal for: LeftOuter and
    * LeftAnti both replicate only their RIGHT side, whose unmatched
    * rows they never emit. Orientation follows the inner join's free
    * choice: the primary (outer) leg replicates the LOWER-hot-share
    * side — the share decide() already gated under maxHotShare, so the
    * primary leg always salts — while the anti leg's replicated side is
    * the HIGHER-share one and salts only if its own share passes the
    * ceiling (else the leg stays a plain anti join for AQE's skew
    * split; its salted twin would replicate a mostly-hot side
    * buckets×, the regime SaltShareProbe measured as the losing one).
    *
    * Exactness inherits from [[saltRewrite]]'s per-type argument plus
    * the identity above: matching pairs emit once (the outer leg's
    * inner part; the anti leg excludes matched B rows), unmatched A
    * rows once (outer leg, null-padded), unmatched B rows once (anti
    * leg), and NULL-keyed rows on both sides ride their leg's COLD
    * route (the salted side of each leg keeps nulls — outer/anti types
    * emit them — while each leg's replicated side drops them: a null
    * key matches nothing, and neither leg emits its replicated side's
    * unmatched rows). Nullability: j.output for a full outer is both
    * sides' attrs nullable with ORIGINAL exprIds — the anti leg pads
    * the missing side with null literals ALIASED TO those exprIds, so
    * parents resolve against the Union unchanged.
    *
    * Cost: each input is scanned twice (once per leg) — the price of
    * the decomposition. A salt verdict asserts a skew straggler that
    * dominates scan cost at deployment scale; when it does not, the
    * advisory's shuffle verdict leaves the single-pass full outer in
    * place. */
  private def fullOuterSaltRewrite(
      j: Join, l: LogicalPlan, r: LogicalPlan, cond: Expression,
      lk: Expression, rk: Expression,
      advice: JoinAdvisor.JoinAdvice,
      conf: JoinAdvisor.AdvisorConf): LogicalPlan = {
    // primary-leg orientation: replicate the lower-share side (decide()
    // gated exactly this minimum under maxHotShare)
    val repRight = advice.hotShareRight <= advice.hotShareLeft
    val (a, ak, b, bk) = if (repRight) (l, lk, r, rk) else (r, rk, l, lk)
    val antiShare = if (repRight) advice.hotShareLeft else advice.hotShareRight
    // outer leg: A ⟕ B, salted — replicates B's hot rows (legal: a
    // left-outer never emits unmatched right rows)
    val lo = Join(a, b, LeftOuter, Some(cond), JoinHint.NONE)
    val loLeg = saltRewrite(lo, a, b, cond, ak, bk, advice,
      replicateRight = true)
    // anti leg: B ▷ A — salted only when replicating A's hot rows is
    // inside the measured economics, else Catalyst's pick + AQE
    val anti = Join(b, a, LeftAnti, Some(cond), JoinHint.NONE)
    val antiLeg =
      if (antiShare > conf.maxHotShare) {
        logInfo(s"GRAFT_ADVISE full-outer anti leg unsalted: replicated" +
          s" side hot share $antiShare > maxHotShare ${conf.maxHotShare}")
        anti
      } else saltRewrite(anti, b, a, cond, bk, ak, advice,
        replicateRight = true)
    // null-pad the A side of the anti leg with A's ORIGINAL exprIds
    val aNulls = a.output.map(attr =>
      Alias(Literal(null, attr.dataType), attr.name)(exprId = attr.exprId))
    val padded = Project(
      if (repRight) aNulls ++ b.output else b.output ++ aNulls, antiLeg)
    // both Projects restate j.output (both sides nullable, original
    // ids) — orientation B's column order is restored here too
    Union(Seq(Project(j.output, loLeg), Project(j.output, padded)))
  }
}
