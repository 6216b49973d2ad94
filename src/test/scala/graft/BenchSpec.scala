package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cross-round bench guard's arithmetic, unit-pinned. Two rounds of
  * guard failures were both envelope-update bugs (r9: no envelope at
  * all; r10: self-overwrite erased the anchor and `regressed` compared
  * noise to noise), so the update rule now lives in pure functions this
  * spec can hold still. No SparkSession needed.
  */
class BenchSpec extends AnyFunSuite {

  test("envelope only tightens: a regressing run cannot erase its anchor") {
    val prior = Map("q1" -> 0.5, "q2" -> 1.0)
    val cur = Map("q1" -> 5.0, "q2" -> 0.8)
    val e = Bench.rollingEnvelope(prior, cur, rebase = false)
    assert(e("q1") === 0.5, "regressed query keeps its prior minimum")
    assert(e("q2") === 0.8, "faster run tightens the envelope")
  }

  test("all-reps-failed query keeps its prior instead of dropping out") {
    val e = Bench.rollingEnvelope(
      Map("q1" -> 0.5), Map("q1" -> -1.0, "q2" -> -1.0), rebase = false)
    assert(e === Map("q1" -> 0.5), "failed reps: prior kept, no-prior dropped")
  }

  test("a new query enters the envelope at its current value") {
    val e = Bench.rollingEnvelope(Map.empty, Map("q9" -> 2.0), rebase = false)
    assert(e === Map("q9" -> 2.0))
  }

  test("rebase replaces values verbatim (deliberate re-baseline)") {
    val e = Bench.rollingEnvelope(
      Map("q1" -> 0.5), Map("q1" -> 5.0), rebase = true)
    assert(e === Map("q1" -> 5.0))
  }

  test("cost-scaled tolerance: top decile gets the hard 1.3x gate, " +
    "cheap queries keep jitter headroom") {
    val cutoff = 8.0 // top-decile boundary in a hypothetical envelope
    // the BENCH_r12 escape: q159 at 14.09s vs 8.66s prior (1.63x) MUST
    // now trip the guard for a top-decile query
    val limitHeavy = Bench.spreadLimitFor(prior = 8.66, topDecileCutoff = cutoff)
    assert(limitHeavy === 1.3)
    assert(Bench.exceedsPrior(best = 14.09, prior = 8.66, limitHeavy),
      "the r12 q159 slip (1.63x on the heaviest query) must flag")
    // a mid-cost query: tolerance scales as 1 + 1.5/sqrt(prior)
    val limitMid = Bench.spreadLimitFor(prior = 4.0, topDecileCutoff = cutoff)
    assert(math.abs(limitMid - 1.75) < 1e-9)
    assert(Bench.exceedsPrior(best = 8.0, prior = 4.0, limitMid))
    assert(!Bench.exceedsPrior(best = 6.0, prior = 4.0, limitMid))
    // a sub-second query keeps the full jitter headroom (clamped at base)
    assert(Bench.spreadLimitFor(prior = 0.1, topDecileCutoff = cutoff) === 3.0)
    // monotone: tolerance never loosens as cost grows
    val grid = Seq(0.05, 0.2, 0.5, 1.0, 2.0, 4.0, 7.9, 8.0, 20.0)
    val limits = grid.map(Bench.spreadLimitFor(_, cutoff))
    assert(limits === limits.sorted.reverse, s"non-monotone: $limits")
    // no envelope -> no decile, sqrt rule alone (1 + 1.5/sqrt(10))
    assert(math.abs(
      Bench.spreadLimitFor(prior = 10.0, topDecileCutoff = 0.0)
        - (1.0 + 1.5 / math.sqrt(10.0))) < 1e-9)
  }

  test("crash-injection lifecycle is excluded from the timed sweep but " +
    "stays registered for the correctness gate") {
    assert(Bench.benchExcluded.contains("q159_crash_consistent_curation"))
    Bench.benchExcluded.foreach(n =>
      assert(SparkEntry.queries.contains(n),
        s"excluded query $n must still be Verify-graded"))
  }

  test("excluded queries keep their envelope anchor (seconds + bytes rows)") {
    // the r13 ADVICE finding: rollingEnvelope iterates current keys only,
    // so an excluded query's prior entry was erased after one run and a
    // later re-inclusion would re-baseline from scratch
    val prior = Map("q159" -> 8.66, "q159#b" -> 1.0e8, "q1" -> 0.5)
    val carried = Bench.carriedExcludedEntries(prior, Set("q159"))
    assert(carried === Map("q159" -> 8.66, "q159#b" -> 1.0e8),
      "both the seconds row and the #b bytes row must ride")
    val env = Bench.rollingEnvelope(
      prior, Map("q1" -> 0.4), rebase = false) ++ carried
    assert(env("q159") === 8.66 && env("q159#b") === 1.0e8 &&
      env("q1") === 0.4)
  }

  test("canary health gate: degraded only past 1.5x a committed reference," +
    " fails open without one") {
    assert(Bench.canaryDegraded(canary = 0.58, healthyRef = 0.27),
      "the r13 driver window (0.58 vs 0.27) must read degraded")
    assert(!Bench.canaryDegraded(canary = 0.31, healthyRef = 0.27),
      "the end-of-sweep window (0.31 vs 0.27) is healthy")
    // no committed reference (first run, lost file) -> NOT degraded:
    // the gate must fall back to today's behavior, not mark everything
    // noisy
    assert(!Bench.canaryDegraded(canary = 9.9, healthyRef = -1.0))
    assert(!Bench.canaryDegraded(canary = 9.9, healthyRef = 0.0))
    // a failed canary measurement (-1) never reads as degraded
    assert(!Bench.canaryDegraded(canary = -1.0, healthyRef = 0.27))
  }

  test("inflation-calibrated adjudication: a flag at the host's own " +
    "inflation is noise; a slowdown the canary cannot explain confirms") {
    // host inflation: fixed-work canary ratio, clamped at 1, fails open
    assert(Bench.hostInflation(canary = 0.31, healthyRef = 0.288) ===
      0.31 / 0.288)
    assert(Bench.hostInflation(canary = 0.20, healthyRef = 0.288) === 1.0,
      "a faster-than-reference host must not tighten the gate")
    assert(Bench.hostInflation(canary = 9.9, healthyRef = -1.0) === 1.0,
      "no committed reference -> fail open to the raw comparison")
    assert(Bench.hostInflation(canary = -1.0, healthyRef = 0.288) === 1.0)
    // the r14 run-2 shape: q208 at 4.644 vs 3.538 prior (1.31x) under a
    // 1.08x-inflated window — 4.644 < 1.3 * (3.538 * 1.08): noise
    val infl = Bench.hostInflation(0.31, 0.288)
    assert(!Bench.confirmsUnderInflation(
      best = 4.644, prior = 3.538, spreadLimit = 1.3, inflation = infl),
      "a 1.31x flag under 1.08x host inflation must not confirm")
    // the same flag under a CLEAN window (inflation 1.0) confirms
    assert(Bench.confirmsUnderInflation(
      best = 4.644, prior = 3.538, spreadLimit = 1.3, inflation = 1.0))
    // a genuine 2x regression confirms even on the inflated host
    assert(Bench.confirmsUnderInflation(
      best = 7.1, prior = 3.538, spreadLimit = 1.3, inflation = infl))
    // a severely degraded host (5x) sends borderline flags to noisy —
    // seconds are unmeasurable there; the bytes ledger is that window's
    // plan-regression signal
    assert(!Bench.confirmsUnderInflation(
      best = 7.1, prior = 3.538, spreadLimit = 1.3, inflation = 5.0))
  }

  test("canary reference key can never collide with a query shortKey") {
    assert(Bench.CanaryRefKey.startsWith("__"))
    assert(SparkEntry.queries.keys.forall(n =>
      !n.startsWith("_") && n.takeWhile(_ != '_') != Bench.CanaryRefKey))
  }

  test("rebase never touches the canary reference: the health anchor " +
    "rides the rolling-min rule even under a deliberate re-baseline") {
    // the r14 advisory finding: a rebase performed in a degraded window
    // would commit an inflated "healthy" canary, silently weakening every
    // future canaryDegraded verdict and understating hostInflation
    val prior = Map("q1" -> 0.5, Bench.CanaryRefKey -> 0.28)
    val cur = Map("q1" -> 5.0, Bench.CanaryRefKey -> 0.61)
    val e = Bench.rollingEnvelope(prior, cur, rebase = true)
    assert(e("q1") === 5.0, "query anchors rebase verbatim")
    assert(e(Bench.CanaryRefKey) === 0.28,
      "the canary reference must keep its healthiest-ever value")
    // a genuinely healthier window still tightens it under rebase
    val e2 = Bench.rollingEnvelope(
      prior, Map(Bench.CanaryRefKey -> 0.22), rebase = true)
    assert(e2(Bench.CanaryRefKey) === 0.22)
    // the disk canary reference rides the same exemption
    val e3 = Bench.rollingEnvelope(
      Map(Bench.DiskCanaryRefKey -> 0.15),
      Map(Bench.DiskCanaryRefKey -> 0.90), rebase = true)
    assert(e3(Bench.DiskCanaryRefKey) === 0.15)
  }

  test("combined inflation: a flag confirms only past what EVERY measured " +
    "resource's own slowdown explains") {
    // the round-15 q59/q5a false-confirm series: five windows at ~1.33x
    // the envelope with CPU inflation 1.01 — the CPU canaries are blind
    // to storage, and streaming queries are checkpoint-fsync-bound. The
    // classification inflation is the max over measured resources: any
    // degraded resource makes seconds unmeasurable, and the flag then
    // ships regressed_noisy with both canary series (bytes stay the
    // hard signal in that window).
    assert(Bench.combinedInflation(1.01, 1.40) === 1.40)
    assert(Bench.combinedInflation(1.40, 1.01) === 1.40)
    // clamped below at 1.0 — a faster-than-reference resource must not
    // tighten the gate
    assert(Bench.combinedInflation(0.8, 0.9) === 1.0)
    // the q59 shape: 2.78 vs 2.098 envelope at 1.3x top-decile gate —
    // confirmed under CPU-only inflation 1.01, exonerated once the disk
    // canary's 1.4x window is measured
    assert(Bench.confirmsUnderInflation(2.78, 2.098, 1.3,
      Bench.combinedInflation(1.01)))
    assert(!Bench.confirmsUnderInflation(2.78, 2.098, 1.3,
      Bench.combinedInflation(1.01, 1.40)))
  }

  test("excluded-query anchors survive a rebase (the q159 re-seed path)") {
    // re-seeding an excluded query's anchor means hand-merging its rows
    // into bench_prior.json; carriedExcludedEntries must then keep them
    // across every later run INCLUDING a deliberate rebase (an excluded
    // query has no current value to re-baseline to)
    val prior = Map("q159" -> 9.4, "q159#b" -> 2.1e8, "q1" -> 0.5)
    val carried = Bench.carriedExcludedEntries(prior, Set("q159"))
    val env = Bench.rollingEnvelope(
      prior, Map("q1" -> 0.7), rebase = true) ++ carried
    assert(env("q159") === 9.4 && env("q159#b") === 2.1e8,
      "the re-seeded anchor must ride through a rebase untouched")
    assert(env("q1") === 0.7)
  }

  test("seed path: an excluded query with a MISSING anchor is timed only " +
    "under the flag; a present anchor is never re-timed") {
    val short: String => String = _.takeWhile(_ != '_')
    val excluded = Set("q159_crash_consistent_curation")
    // flag off: nothing seeds, whatever the prior looks like
    assert(Bench.seedTargets(excluded, Set.empty, short, enabled = false)
      .isEmpty)
    // flag on + anchor missing: the excluded query is timed for seeding
    assert(Bench.seedTargets(excluded, Set("q1", "q2"), short,
      enabled = true) === Seq("q159_crash_consistent_curation"))
    // flag on + BOTH rows present: one-shot repair, never a re-time (the
    // crash matrix's seconds would otherwise overwrite a sane anchor
    // through the rolling-min rule on some future quiet window)
    assert(Bench.seedTargets(excluded, Set("q159", "q159#b"), short,
      enabled = true).isEmpty)
    // seconds present but the "#b" bytes companion missing: STILL
    // seed-eligible (r15 ADVICE — the bytes-regression guard was
    // permanently blind for the partial-history state); the run then
    // contributes only the missing row (seedRows drops present ones)
    assert(Bench.seedTargets(excluded, Set("q159"), short,
      enabled = true) === Seq("q159_crash_consistent_curation"))
    // and the seeded row then rides rollingEnvelope like any new key —
    // missing from prior, so it enters at its current value even though
    // the query stays out of the timed sweep forever after
    val env = Bench.rollingEnvelope(
      Map("q1" -> 0.5), Map("q159" -> 9.4, "q159#b" -> 2.1e8, "q1" -> 0.6),
      rebase = false)
    assert(env("q159") === 9.4 && env("q159#b") === 2.1e8)
  }

  test("full-set absolute floor: sub-decile 2x breaches with real deltas " +
    "flag; jitter-scale and sub-2x moves do not") {
    // the BENCH_r14 escapes: q200 1.093 vs 0.492 and q218 0.943 vs 0.428
    // sat at 2.1-2.2x with no verdict because 1 + 1.5/sqrt(prior) waves
    // through anything under ~3x at sub-second priors
    assert(Bench.exceedsAbsFloor(best = 1.093, prior = 0.492))
    assert(Bench.exceedsAbsFloor(best = 0.943, prior = 0.428))
    // q209's r14 shape: 2.06x but only +0.23s — under the 0.3s floor
    assert(!Bench.exceedsAbsFloor(best = 0.447, prior = 0.217))
    // sub-2x never fires regardless of delta
    assert(!Bench.exceedsAbsFloor(best = 3.9, prior = 2.0))
    // degenerate priors/failures never fire
    assert(!Bench.exceedsAbsFloor(best = 5.0, prior = 0.0))
    assert(!Bench.exceedsAbsFloor(best = -1.0, prior = 1.0))
    // the combined trigger: either rule flags, and the SAME predicate
    // adjudicates (via confirmsUnderInflation's inflation-scaled prior)
    assert(Bench.flaggedVsPrior(best = 1.093, prior = 0.492,
      spreadLimit = 3.0), "floor fires where the ratio rule is silent")
    assert(Bench.flaggedVsPrior(best = 5.24, prior = 0.897,
      spreadLimit = 3.0), "ratio rule still fires on its own")
    assert(!Bench.flaggedVsPrior(best = 0.9, prior = 0.492,
      spreadLimit = 3.0))
    // under 1.09x host inflation the q200 flag still confirms (1.093 >
    // 2 * 0.492 * 1.09 + ...): the floor scales with the canary like
    // every other rule
    assert(Bench.confirmsUnderInflation(
      best = 1.093, prior = 0.492, spreadLimit = 3.0, inflation = 1.09))
    // ... but a 2.05x breach on a 1.09x-inflated host does not
    assert(!Bench.confirmsUnderInflation(
      best = 1.01, prior = 0.492, spreadLimit = 3.0, inflation = 1.09))
  }

  test("regression trigger needs BOTH the ratio and the absolute delta") {
    // ratio alone: 0.05 -> 0.3 is 6x but only +0.25s — codegen jitter
    assert(!Bench.exceedsPrior(best = 0.3, prior = 0.05, spreadLimit = 3.0))
    // delta alone: 2.0 -> 2.9 is +0.9s but under 3x — normal variance
    assert(!Bench.exceedsPrior(best = 2.9, prior = 2.0, spreadLimit = 3.0))
    // both: the r10 q94 shape (0.897 -> 5.24)
    assert(Bench.exceedsPrior(best = 5.24, prior = 0.897, spreadLimit = 3.0))
    // degenerate priors/failures never fire
    assert(!Bench.exceedsPrior(best = 5.0, prior = 0.0, spreadLimit = 3.0))
    assert(!Bench.exceedsPrior(best = -1.0, prior = 1.0, spreadLimit = 3.0))
  }

  test("resource-matched exoneration: a CPU-bound flag CONFIRMS on a " +
    "disk-only-degraded window; a disk-affine flag is still exonerated") {
    // the BENCH_r15 window shape: disk 1.71x degraded, CPU healthy
    val (cpu, disk) = (1.02, 1.71)
    // a q121-shaped flag (connected components, CPU/shuffle-bound) at
    // 1.46x its top-decile envelope: the old blanket max exonerated it
    // on disk inflation it never felt; CPU-matched it CONFIRMS
    val cpuInfl = Bench.inflationFor("cpu", cpu, disk)
    assert(cpuInfl === 1.02)
    assert(Bench.confirmsUnderInflation(
      best = 3.2, prior = 2.195, spreadLimit = 1.3, inflation = cpuInfl))
    assert(!Bench.confirmsUnderInflation(
      best = 3.2, prior = 2.195, spreadLimit = 1.3,
      inflation = Bench.combinedInflation(cpu, disk)),
      "the blanket max would have exonerated the same flag")
    // a q59-shaped flag (streaming, checkpoint-bound) at 1.38x on the
    // same window: disk-matched, the storage slowdown explains it
    assert(!Bench.confirmsUnderInflation(
      best = 2.9, prior = 2.1, spreadLimit = 1.3,
      inflation = Bench.inflationFor("disk", cpu, disk)))
    // untagged keys keep the conservative blanket max; healthy
    // resources never tighten below 1.0
    assert(Bench.inflationFor("max", cpu, disk) === 1.71)
    assert(Bench.inflationFor("cpu", 0.8, disk) === 1.0)
    // the affinity tags: streaming lifecycles disk, every other
    // registered query cpu, non-query keys the blanket fallback
    assert(Bench.resourceAffinity("q59") === "disk")
    assert(Bench.resourceAffinity("q5a") === "disk")
    assert(Bench.resourceAffinity("q121") === "cpu")
    assert(Bench.resourceAffinity("q184") === "cpu")
    assert(Bench.resourceAffinity("__canary_par") === "max")
  }

  test("rebase ledger: every hand-loosening writes its own history row " +
    "in the envelope; tightenings, canaries, and non-rebase runs never do") {
    val prior = Map("q5a" -> 1.499, "q59" -> 2.098, "q184" -> 4.780,
      "q01" -> 0.5, Bench.CanaryRefKey -> 0.281)
    val cur = Map("q5a" -> 1.830, "q59" -> 2.513, "q184" -> 6.098,
      "q01" -> 0.4, Bench.CanaryRefKey -> 0.9)
    val rows = Bench.rebaseLedgerRows(prior, cur, rebase = true,
      note = "healthy-floor-series")
    assert(rows === Map(
      "__rebase:q5a:healthy-floor-series:1.499" -> 1.830,
      "__rebase:q59:healthy-floor-series:2.098" -> 2.513,
      "__rebase:q184:healthy-floor-series:4.780" -> 6.098),
      s"every loosened anchor must be ledgered: $rows")
    // a rebase WITHOUT a ledger entry is unreachable: the rows are
    // produced by the same call that gates on the rebase flag
    assert(Bench.rebaseLedgerRows(prior, cur, rebase = false, "x").isEmpty)
    // ledger rows are history, not anchors: carried verbatim forever,
    // and never themselves re-ledgered
    val carried = Bench.carriedLedgerRows(
      rows ++ Map("q5a" -> 1.830, "q01" -> 0.4))
    assert(carried === rows)
    assert(Bench.rebaseLedgerRows(
      rows, rows.map { case (k, v) => k -> (v + 1) }, rebase = true, "y")
      .isEmpty, "a ledger row must never be re-ledgered")
  }

  test("warm-up eligibility rides the committed envelope (heavy tail " +
    "only), not this run's readings") {
    assert(Bench.warmupEligible(Some(2.1)))
    assert(Bench.warmupEligible(Some(6.098)))
    assert(!Bench.warmupEligible(Some(1.9)))
    assert(!Bench.warmupEligible(None), "no anchor, no warm-up")
  }

  test("a run whose every disk-canary reading failed (-1) keeps the " +
    "committed healthy anchor through the rolling rule") {
    // the r15 ADVICE finding: omitting the key entirely erased the
    // anchor; emitting -1 routes through rollingEnvelope's cur<0 branch
    val env = Bench.rollingEnvelope(
      Map(Bench.DiskCanaryRefKey -> 0.109),
      Map(Bench.DiskCanaryRefKey -> -1.0, "q1" -> 0.5), rebase = false)
    assert(env(Bench.DiskCanaryRefKey) === 0.109)
  }

  test("anchor-era context: a NEW-MIN anchor writes its capture-window " +
    "canaries; a holding anchor carries its prior context verbatim") {
    val prior = Map(
      "q1" -> 0.5, "q1#cp" -> 0.30, "q1#cd" -> 0.12, // holds this run
      "q2" -> 1.0, "q2#cp" -> 0.50, "q2#cd" -> 0.30, // tightens this run
      "q3" -> 2.0) // pre-machinery anchor: era unknown, holds
    val cur = Map("q1" -> 0.9, "q2" -> 0.8, "q3" -> 2.5,
      "q4" -> 1.5, // new query: enters with context
      "q1#b" -> 1e6, Bench.CanaryRefKey -> 0.28)
    val ctx = Bench.anchorContextRows(prior, cur, rebase = false,
      ctxCpu = 0.41, ctxDisk = 0.22)
    assert(ctx("q1#cp") === 0.30 && ctx("q1#cd") === 0.12,
      "holding anchor keeps its capture era")
    assert(ctx("q2#cp") === 0.41 && ctx("q2#cd") === 0.22,
      "tightened anchor records THIS run's window")
    assert(!ctx.contains("q3#cp") && !ctx.contains("q3#cd"),
      "a holding pre-machinery anchor stays era-unknown")
    assert(ctx("q4#cp") === 0.41 && ctx("q4#cd") === 0.22,
      "a new anchor enters with its capture context")
    assert(!ctx.keys.exists(_.endsWith("#b#cp")),
      "bytes rows never get context (isAnchorKey)")
    assert(!ctx.contains(Bench.CanaryRefKey + "#cp"),
      "canary references never get context")
  }

  test("anchor-era context: rebase re-stamps the era, a failed canary " +
    "reading clears stale context instead of mislabeling the new anchor, " +
    "and departed anchors drop their context unless excluded-carried") {
    val prior = Map("q1" -> 0.5, "q1#cp" -> 0.30,
      "q9" -> 3.0, "q9#cp" -> 0.33, // q9 leaves the registry this run
      "q159" -> 9.0, "q159#cp" -> 0.35) // excluded query: carried
    val reb = Bench.anchorContextRows(prior, Map("q1" -> 2.0),
      rebase = true, ctxCpu = 0.90, ctxDisk = 0.44,
      alsoKeep = Set("q159"))
    assert(reb("q1#cp") === 0.90 && reb("q1#cd") === 0.44,
      "a rebased (loosened) anchor records the rebase window's era")
    assert(!reb.contains("q9#cp"), "departed anchor drops its context")
    assert(reb("q159#cp") === 0.35, "excluded-query context is carried")
    val cleared = Bench.anchorContextRows(
      Map("q1" -> 0.5, "q1#cp" -> 0.30, "q1#cd" -> 0.12),
      Map("q1" -> 0.2), rebase = false, ctxCpu = -1.0, ctxDisk = 0.2)
    assert(!cleared.contains("q1#cp"),
      "failed cpu reading: stale context cleared, not inherited")
    assert(cleared("q1#cd") === 0.2, "the healthy reading still lands")
  }

  test("selective rebase: only the NAMED key loosens (seconds + its #b " +
    "row), only it is ledgered, its context re-stamps, and every other " +
    "anchor keeps the rolling-min rule") {
    val prior = Map(
      "q191" -> 0.445, "q191#b" -> 170453.0,
      "q01" -> 0.5, "q01#cp" -> 0.30,
      Bench.CanaryRefKey -> 0.28)
    val cur = Map(
      "q191" -> 0.930, "q191#b" -> 171000.0,
      "q01" -> 0.9, // slower this window: must NOT loosen
      Bench.CanaryRefKey -> 0.85)
    val pred = Set("q191").contains _
    val env = Bench.rollingEnvelope(prior, cur, pred)
    assert(env("q191") === 0.930, "named key re-baselines to current")
    assert(env("q191#b") === 171000.0, "its bytes row rides the verdict")
    assert(env("q01") === 0.5, "unnamed keys keep their rolling minimum")
    assert(env(Bench.CanaryRefKey) === 0.28,
      "canary references stay rebase-exempt even when named")
    val ledger = Bench.rebaseLedgerRows(prior, cur, pred, "era-drift")
    assert(ledger === Map(
      "__rebase:q191:era-drift:0.445" -> 0.930,
      "__rebase:q191#b:era-drift:170453.000" -> 171000.0),
      s"exactly the named key's loosenings are ledgered: $ledger")
    val ctx = Bench.anchorContextRows(prior, cur, pred,
      ctxCpu = 0.85, ctxDisk = 0.29, alsoKeep = Set.empty)
    assert(ctx("q191#cp") === 0.85 && ctx("q191#cd") === 0.29,
      "the rebased anchor records ITS capture window's era")
    assert(ctx("q01#cp") === 0.30,
      "an unnamed, non-tightening anchor keeps its prior context")
    // the blanket boolean form still means ALL (backward compatible)
    assert(Bench.rollingEnvelope(prior, cur, rebase = true)("q01") === 0.9)
  }

  test("window-matched flag adjudication: the canary reading adjacent " +
    "to a flag's own re-reps wins over the sweep-endpoint reading, in " +
    "BOTH directions") {
    // the w5 shape: endpoint cpu canary clean (0.28 vs ref 0.28) but the
    // flag's re-reps ran in a contended mid-sweep window (adjacent
    // parallel reading 0.56 = 2x) — the flag must ship NOISY, where the
    // endpoint-only gate confirmed it
    val noisy = Bench.flagResourceInflation("cpu",
      adjPar = Some(0.56), classifyPar = 0.28,
      anchorCpuCtx = None, globalCpuRef = 0.28,
      adjDisk = Some(0.10), classifyDisk = 0.10,
      anchorDiskCtx = None, globalDiskRef = 0.10)
    assert(noisy === 2.0, s"adjacent contention must exonerate: $noisy")
    // the converse: endpoint degraded but the flag's OWN window was
    // clean — no allowance, a real slowdown confirms
    val strict = Bench.flagResourceInflation("cpu",
      adjPar = Some(0.28), classifyPar = 0.84,
      anchorCpuCtx = None, globalCpuRef = 0.28,
      adjDisk = None, classifyDisk = 0.10,
      anchorDiskCtx = None, globalDiskRef = 0.10)
    assert(strict === 1.0, s"clean adjacent window gives no excuse: $strict")
    // failed/absent adjacent reading falls back to the endpoint reading
    val fallback = Bench.flagResourceInflation("cpu",
      adjPar = Some(-1.0), classifyPar = 0.56,
      anchorCpuCtx = None, globalCpuRef = 0.28,
      adjDisk = None, classifyDisk = 0.10,
      anchorDiskCtx = None, globalDiskRef = 0.10)
    assert(fallback === 2.0)
    // disk-affine flags judge against their adjacent DISK reading and
    // ignore the cpu series entirely (resource-matched, r15 #2)
    val disk = Bench.flagResourceInflation("disk",
      adjPar = Some(0.84), classifyPar = 0.84,
      anchorCpuCtx = None, globalCpuRef = 0.28,
      adjDisk = Some(0.30), classifyDisk = 0.10,
      anchorDiskCtx = None, globalDiskRef = 0.10)
    assert(math.abs(disk - 3.0) < 1e-9, disk.toString)
    // era-matched denominator still applies to the adjacent reading
    val era = Bench.flagResourceInflation("cpu",
      adjPar = Some(0.56), classifyPar = 0.28,
      anchorCpuCtx = Some(0.56), globalCpuRef = 0.28,
      adjDisk = None, classifyDisk = 0.10,
      anchorDiskCtx = None, globalDiskRef = 0.10)
    assert(era === 1.0,
      "an anchor captured at the same noise level gets no allowance")
  }

  test("anchorInflation consumes the context row: known era divides by " +
    "the anchor's own canary, unknown era falls back to the global " +
    "rolling-min reference, and a healthier-than-today era never " +
    "tightens below 1.0") {
    // q191's shape: anchor captured at canary 0.30, today's window 0.60
    // — 2.0x era drift is now computed, not argued
    assert(Bench.anchorInflation(0.60, Some(0.30), 0.28) === 2.0)
    // unknown context: today's behavior (global healthiest-ever ref)
    assert(math.abs(
      Bench.anchorInflation(0.60, None, 0.28) - 0.60 / 0.28) < 1e-9)
    // NOISY-era anchor: judged against its own era => TIGHTER gate than
    // the global ref would give (the anchor was achieved under noise)
    assert(Bench.anchorInflation(0.60, Some(0.55), 0.28) < 0.60 / 0.28)
    // host recovered since capture: clamp at 1.0, raw comparison
    assert(Bench.anchorInflation(0.30, Some(0.60), 0.28) === 1.0)
    // a failed/zero context reading must not divide by zero
    assert(Bench.anchorInflation(0.60, Some(0.0), 0.28) === 0.60 / 0.28)
    // end-to-end through the resource-matched gate: a cpu-affine flag
    // judged by its anchor-era cpu inflation
    val infl = Bench.inflationFor("cpu",
      Bench.anchorInflation(0.60, Some(0.30), 0.28),
      Bench.anchorInflation(2.0, Some(2.0), 0.109))
    assert(infl === 2.0, "cpu-affine: disk era plays no part")
  }
}
