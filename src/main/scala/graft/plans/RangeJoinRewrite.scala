package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite an INEQUALITY-ONLY inner join (a point column
  * bounded between two columns of the other side, no equi-conjunct) into
  * the epoch-bucketed equi-join `operators.Temporal.rangeJoin` builds by
  * hand — Spark's own planner gives this shape BroadcastNestedLoopJoin,
  * which is quadratic and the thing that kills point-in-interval
  * enrichment at 100 TB. The rewrite is algebraic and exact:
  *
  *   point side    += __graft_range_lb = ts div W
  *   interval side += Filter(from <= to)          -- degenerates match ∅
  *                    Generate(explode(sequence(from div W, to div W)))
  *   join cond     += __graft_range_lb = __graft_range_rb
  *
  * `div` (truncating long division) is MONOTONIC non-decreasing, so for
  * any from <= ts <= to the point's bucket lies in [bucket(from),
  * bucket(to)] and every original match survives the added equi-conjunct;
  * the original predicates ride along as residuals, so no false match
  * survives either. Each match surfaces exactly once — the point owns
  * ONE bucket. Strict bounds (<, >) keep the inclusive bucket cover (a
  * superset) and are enforced by the residual.
  *
  * Scope guards (all must hold, else the plan is left untouched):
  *  - `spark.graft.rangejoin.bucketwidth` > 0 (off by default — the rule
  *    is inert for every query that doesn't opt in);
  *  - inner join, condition present, NO cross-side equi-conjunct (if one
  *    exists Spark already hash-joins; this also makes the rule
  *    idempotent — its own output contains the added equi-conjunct);
  *  - a conjunct pair lower/upper bounding the SAME point-side expression
  *    by two interval-side expressions, all deterministic and integral
  *    (int/long — epoch seconds; truncating division is exact there,
  *    where a double floor could round);
  *  - both join children deterministic.
  *
  * Registered via `GraftExtensions` (injectOptimizerRule), so it runs
  * inside the operator-optimization fixed point of every engine session.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangejoin.bucketwidth"

  /** Ceiling on buckets per interval (`spark.graft.rangejoin.maxbuckets`,
    * default 65536): a runtime guard — the rewrite cannot know interval
    * widths at plan time, and ONE open-ended interval (to = Long.MaxValue
    * sentinel, a common validity-window encoding) would otherwise make
    * sequence() attempt a ~2^50-element array and crash the task with an
    * opaque array-size error. The guard turns that into an explicit
    * per-row failure naming this conf, so the user either raises
    * bucketwidth or excludes the sentinel rows — never silently wrong,
    * never mysteriously dead. */
  val MaxBucketsConf = "spark.graft.rangejoin.maxbuckets"

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** (tsExpr, loExpr, hiExpr) with ts referencing only `point` and lo/hi
    * only `interval`, from a lower- and an upper-bound conjunct over the
    * SAME ts expression. */
  private def findRangePair(
      conjuncts: Seq[Expression],
      point: LogicalPlan,
      interval: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def pointOnly(e: Expression) =
      e.deterministic && integral(e) && e.references.nonEmpty &&
        e.references.subsetOf(point.outputSet)
    def intervalOnly(e: Expression) =
      e.deterministic && integral(e) && e.references.nonEmpty &&
        e.references.subsetOf(interval.outputSet)
    // normalize each comparison into (ts, bound, isLower)
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) if pointOnly(a) && intervalOnly(b) =>
        Some((a, b, true))
      case GreaterThan(a, b) if pointOnly(a) && intervalOnly(b) =>
        Some((a, b, true))
      case LessThanOrEqual(a, b) if pointOnly(a) && intervalOnly(b) =>
        Some((a, b, false))
      case LessThan(a, b) if pointOnly(a) && intervalOnly(b) =>
        Some((a, b, false))
      case GreaterThanOrEqual(a, b) if intervalOnly(a) && pointOnly(b) =>
        Some((b, a, false)) // f >= ts  ⇔  ts <= f
      case GreaterThan(a, b) if intervalOnly(a) && pointOnly(b) =>
        Some((b, a, false))
      case LessThanOrEqual(a, b) if intervalOnly(a) && pointOnly(b) =>
        Some((b, a, true))  // f <= ts  ⇔  ts >= f
      case LessThan(a, b) if intervalOnly(a) && pointOnly(b) =>
        Some((b, a, true))
      case _ => None
    }
    val lowers = bounds.filter(_._3)
    val uppers = bounds.filterNot(_._3)
    (for {
      (ts, lo, _) <- lowers
      (ts2, hi, _) <- uppers
      if ts.semanticEquals(ts2)
    } yield (ts, lo, hi)).headOption
  }

  private def crossSideEqui(
      conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty) ||
        (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty)
      case EqualNullSafe(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty) ||
        (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a malformed value must not fail EVERY query in the session from
    // inside the optimizer — warn once per apply and stay inert
    def confLong(key: String, dflt: Long): Option[Long] =
      scala.util.Try(SQLConf.get.getConfString(key, dflt.toString).trim.toLong)
        .toOption.orElse {
          logWarning(s"$key is not a long; RangeJoinRewrite is inert")
          None
        }
    val width = confLong(WidthConf, 0L).getOrElse(return plan)
    if (width <= 0) return plan
    val maxBuckets = confLong(MaxBucketsConf, 65536L).getOrElse(return plan)
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if left.deterministic && right.deterministic =>
        val conjuncts = splitConjuncts(cond)
        if (crossSideEqui(conjuncts, left, right)) j
        else {
          def bucket(e: Expression): Expression =
            IntegralDivide(Cast(e, LongType), Literal(width))
          def rewrite(point: LogicalPlan, interval: LogicalPlan,
              pointIsLeft: Boolean): Option[LogicalPlan] =
            findRangePair(conjuncts, point, interval).map { case (ts, lo, hi) =>
              val lbAlias = Alias(bucket(ts), "__graft_range_lb")()
              val pointProj =
                Project(point.output :+ lbAlias, point)
              // span guard: NULL (filter-true via IsNull) under the cap,
              // raise_error above it — a too-wide interval fails
              // EXPLICITLY, naming the conf, instead of dying in
              // sequence()'s array allocation. Built as AssertTrue's own
              // replacement (If/Literal(null)/RaiseError) directly:
              // AssertTrue itself is RuntimeReplaceable and
              // ReplaceExpressions has already run by the time this rule
              // fires, so the unreplaced form cannot codegen
              val span = Subtract(bucket(hi), bucket(lo))
              // null-safe: a NULL bound makes span NULL, and If's NULL
              // predicate would take the RaiseError branch — but the
              // original join silently DROPS null-bound rows (condition
              // evaluates NULL), so the rewrite must too, not crash
              // strict <: span is bucket count - 1, so < keeps the
              // enforced cap in agreement with the conf name/message
              // (and with Temporal.rangeJoin's twin guard)
              val spanGuard = IsNull(If(
                Or(IsNull(span), LessThan(span, Literal(maxBuckets))),
                Literal(null),
                new RaiseError(Literal.create(
                  s"range-join rewrite: an interval spans more than " +
                    s"$maxBuckets buckets of width $width — raise " +
                    s"$WidthConf or $MaxBucketsConf, or exclude " +
                    "open-ended sentinel intervals",
                  org.apache.spark.sql.types.StringType))))
              // IsNotNull leads the conjunction so And short-circuits to
              // FALSE on a null bound before the guard ever evaluates
              // (And skips the right leg only when the left is false —
              // a NULL lo<=hi alone would not stop the guard)
              val guarded = Filter(
                And(IsNotNull(Cast(lo, LongType)),
                  And(IsNotNull(Cast(hi, LongType)),
                    And(
                      LessThanOrEqual(Cast(lo, LongType), Cast(hi, LongType)),
                      spanGuard))), interval)
              val rbAttr =
                AttributeReference("__graft_range_rb", LongType, nullable = false)()
              // Sequence is TimeZoneAwareExpression: without an explicit
              // timeZoneId it reports unresolved and the optimizer's plan
              // validation rejects the rewrite (long sequences never use
              // it, but resolved() checks the field regardless)
              val gen = Generate(
                Explode(new Sequence(bucket(lo), bucket(hi), None,
                  Some(SQLConf.get.sessionLocalTimeZone))),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(rbAttr), child = guarded)
              val newCond = And(cond, EqualTo(lbAlias.toAttribute, rbAttr))
              val rejoined =
                if (pointIsLeft) Join(pointProj, gen, Inner, Some(newCond), hint)
                else Join(gen, pointProj, Inner, Some(newCond), hint)
              Project(j.output, rejoined)
            }
          rewrite(left, right, pointIsLeft = true)
            .orElse(rewrite(right, left, pointIsLeft = false))
            .getOrElse(j)
        }
    }
  }
}
