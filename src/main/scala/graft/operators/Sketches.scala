package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007), relational-
  * first: the register table IS the sketch, and both the register
  * derivation and the raw estimator are built from functions DuckDB also
  * has (`bin`, `length`, integer shifts), so — uniquely among the
  * engine's sketches — the WHOLE pipeline from hash to estimate carries a
  * full cross-engine oracle (q126/q127), not a rows-only row like Spark's
  * own `approx_count_distinct` (q40, whose HLL++ internals differ across
  * implementations by design).
  *
  * Reference scope: the reference counts records up front to plan its
  * migration (count-first planning, GrooveImport.php progress totals);
  * this is the sketch-scale version of that count for corpora where an
  * exact `count(distinct)` is itself a major job.
  */
object Sketches {

  /** HLL bias-correction constant αₘ. The closed form
    * 0.7213/(1+1.079/m) is the LARGE-m approximation; Flajolet et al.
    * give exact constants for the small register counts, and using the
    * approximation at m=16/32/64 carries a few-percent systematic bias.
    */
  private[graft] def alphaM(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** αₘ as a shortest-round-trip decimal literal for embedding in an
    * oracle SQL text: Scala's `Double.toString` round-trips, so DuckDB
    * parses back the bit-identical double Spark folds into the plan. */
  def alphaLiteral(p: Int): String = alphaM(1 << p).toString

  /** Per-register HLL state over `xxhash64(value)`: one row `(j, rho)` for
    * ALL `2^p` registers (untouched registers emit rho 0). `j` is the low
    * p bits of the hash (unsigned); `rho` is the leading-zero count of the
    * remaining 64-p bits plus one (all-zero remainder → 64-p+1). NULL
    * values are filtered before hashing — `approx_count_distinct` (q40)
    * ignores NULLs, and the two distinct-count surfaces must agree on
    * nullable columns (xxhash64(NULL) would otherwise hash the seed and
    * register one phantom element).
    *
    * Scale posture: ONE map-side-combining max aggregate — each task ships
    * at most 2^p rows regardless of input size, the same summary-sized-
    * shuffle posture as the Misra-Gries/CMS aggregates. Mergeability is
    * relational too: union register tables from disjoint corpus splits and
    * re-max to combine sketches (pinned in SketchesSpec).
    *
    * The bit-length trick: rho = (64-p+1) - length(bin(w)) for w > 0 —
    * `bin` prints a long's minimal binary digits in both engines, so the
    * rho computation needs no libm log2 and no custom kernel, which is
    * what keeps the register table re-derivable by the DuckDB oracle from
    * the closed-formula XXH64 chain.
    */
  def hllRegisters(df: DataFrame, value: Column, p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"hll precision out of range: $p")
    val m = 1 << p
    val maxRho = 64 - p + 1
    val spark = df.sparkSession
    val h = df.filter(value.isNotNull).select(xxhash64(value).as("h"))
    val w = shiftrightunsigned(col("h"), p)
    val reg = h.select(
      col("h").bitwiseAND(lit((m - 1).toLong)).cast("int").as("j"),
      when(w === 0L, lit(maxRho))
        .otherwise(lit(maxRho) - length(bin(w))).cast("int").as("rho"))
    val mx = reg.groupBy(col("j")).agg(max(col("rho")).as("rho"))
    spark.range(m).select(col("id").cast("int").as("j"))
      .join(mx, Seq("j"), "left")
      .select(col("j"), coalesce(col("rho"), lit(0)).as("rho"))
  }

  /** Per-GROUP HLL register tables — [[hllRegisters]] with a group key:
    * one dense m-register block per group value (missing registers
    * materialized at rho 0), ≤ m·|groups| rows total. The 100 TB shape
    * for "distinct users per segment" dashboards: one map-side-combining
    * max aggregate keyed on (group, register); merging two snapshots is
    * still union + re-max per group. Null groups and null values are
    * excluded (they sketch nothing); a group observed ONLY with null
    * values emits no register block at all — an all-zero block would
    * linear-count to a spurious ~0.36m instead of 0. */
  def hllRegistersGrouped(
      df: DataFrame, group: Column, value: Column, p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"hll precision out of range: $p")
    val m = 1 << p
    val maxRho = 64 - p + 1
    val spark = df.sparkSession
    val h = df.filter(value.isNotNull && group.isNotNull)
      .select(group.as("grp"), xxhash64(value).as("h"))
    val w = shiftrightunsigned(col("h"), p)
    val reg = h.select(col("grp"),
      col("h").bitwiseAND(lit((m - 1).toLong)).cast("int").as("j"),
      when(w === 0L, lit(maxRho))
        .otherwise(lit(maxRho) - length(bin(w))).cast("int").as("rho"))
    val mx = reg.groupBy(col("grp"), col("j")).agg(max(col("rho")).as("rho"))
    // group universe from h (non-null group AND value): a group whose
    // values are all NULL sketches nothing and must not emit an all-zero
    // register block (its raw estimate would be a spurious ~0.36m)
    h.select(col("grp")).distinct()
      .crossJoin(spark.range(m).select(col("id").cast("int").as("j")))
      .join(mx, Seq("grp", "j"), "left")
      .select(col("grp"), col("j"), coalesce(col("rho"), lit(0)).as("rho"))
  }

  /** Raw HLL estimator αₘ·m²/Σ2^-rho off a register table; one row
    * `(m, v_zeros, est_raw)`. The indicator sum is exact and order-pinned:
    * each term 2^((64-p+1)-rho) is an integer power of two ≤ 2^(64-p+1)
    * (exactly representable in double), folded in register order with the
    * native ordered-sum device — so a DuckDB oracle reaches the identical
    * IEEE double from the same registers
    * (`list_sum(list(term ORDER BY j))`). The small-range linear-counting
    * and 64-bit large-range corrections need `ln` — libm, whose cross-
    * engine parity this codebase never assumes — so the REGISTERED surface
    * is the raw estimator plus `v_zeros` (everything a consumer needs to
    * apply corrections); [[hllEstimateCorrected]] applies the standard
    * small-range correction engine-side and is accuracy-pinned in
    * SketchesSpec.
    */
  def hllEstimateRaw(registers: DataFrame, p: Int = 9): DataFrame = {
    val m = 1 << p
    val maxRho = 64 - p + 1
    registers
      .select(col("j"), col("rho"),
        expr(s"cast(shiftleft(cast(1 as bigint), $maxRho - rho) as double)")
          .as("term"))
      .agg(
        graft.plans.OrderedFold.orderedSum(col("j"), col("term")).as("sd"),
        sum(when(col("rho") === 0, 1L).otherwise(0L)).as("v_zeros"))
      .select(lit(m).as("m"), col("v_zeros"),
        round(
          lit(alphaM(m)) * lit(m.toDouble) * lit(m.toDouble)
            * lit((BigInt(1) << maxRho).toDouble) / col("sd"), 4)
          .as("est_raw"))
  }

  /** Standard small-range correction: linear counting m·ln(m/V) when the
    * raw estimate is below 2.5m and empty registers remain; raw otherwise.
    * Engine-side only (ln is libm) — see [[hllEstimateRaw]]. */
  def hllEstimateCorrected(registers: DataFrame, p: Int = 9): DataFrame = {
    val m = 1 << p
    hllEstimateRaw(registers, p)
      .select(col("m"), col("v_zeros"), col("est_raw"),
        when(col("est_raw") <= lit(2.5 * m) && col("v_zeros") > 0,
          round(lit(m.toDouble) *
            log(lit(m.toDouble) / col("v_zeros").cast("double")), 4))
          .otherwise(col("est_raw")).as("est"))
  }

  /** Approximate quantiles via Spark's Greenwald-Khanna summary — the
    * scale path for percentile computation: the exact `percentile`
    * surface (q29) buffers every value per group, which at 100 TB is a
    * global-sort-sized job, while GK runs as one pass of map-side
    * mergeable summaries whose size is O(1/relErr · log(relErr·N)) —
    * model-sized driver state, never corpus-sized.
    *
    * Output: one (p, cut, rank_ok) row per requested probability, where
    * `rank_ok` carries the GK CONTRACT itself: the exact rank of `cut`
    * lies within relErr·N of p·N. The engine emits `true` (the claim);
    * the q132 oracle RE-DERIVES the verdict from the exported cuts
    * against an exact DuckDB rank count — the q40 tolerance-verdict
    * device applied to a rank bound, which is exactly the property GK
    * guarantees (the cut VALUES are summary-merge-order specific, like
    * every engine's quantile sketch, and ride 1:1). A violated bound
    * flips the oracle's verdict and reds the row. */
  def gkQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
      relErr: Double): DataFrame = {
    require(probs.nonEmpty && probs.forall(q => q >= 0 && q <= 1),
      "probabilities must be in [0, 1]")
    require(relErr > 0 && relErr < 1, "relErr must be in (0, 1)")
    val cuts = df.stat.approxQuantile(valueCol, probs.toArray, relErr)
    val spark = df.sparkSession
    import spark.implicits._
    probs.zip(cuts.toSeq).toDF("p", "cut")
      .select(col("p"), col("cut"), lit(true).as("rank_ok"))
  }

  /** KMV shard-overlap estimation (Beyer et al., SIGMOD'07) — the
    * multiset question HLL cannot answer: given two corpus shards (two
    * crawl snapshots, two pipeline epochs), estimate each shard's
    * distinct count, the union, the Jaccard, and the INTERSECTION from
    * two k-minimum-value summaries instead of a distinct-join over both
    * corpora. At 100 TB this is the "how much of snapshot B is already
    * in snapshot A" planning query that decides whether a re-dedup run
    * is worth scheduling, answered from 2·k·8 bytes of state.
    *
    * One aggregation pass over one scan: both sketches build in a single
    * ObjectHashAggregate via null-gated inputs (`when(inA, h)`) — the
    * KmvMinimaAgg buffer skips NULLs, so a row in both shards feeds both
    * summaries and a row in neither feeds none. Everything downstream is
    * array-function algebra on the two ≤k-element results (codegen, no
    * UDF): the union sketch is the k smallest of the merged arrays, and
    * every estimate is a closed formula a DuckDB oracle reproduces —
    * u(h) = (toDouble(h) + 2^63)/2^64 maps the signed hash to (0,1),
    * distinct ≈ (k-1)/u(k-th min) (exact when the sketch holds fewer
    * than k values, i.e. ALL of them), J ≈ shared/|kmin(A∪B)|,
    * |A∩B| ≈ J·est(A∪B). Estimates are rounded to 6dp on both engines
    * (the q127 device) so a last-ulp divergence in the one double
    * division cannot flip the hash compare.
    *
    * Output: one row (n_a, n_b, est_a, est_b, n_union, est_union,
    * shared, jaccard, est_intersect). */
  /** (k-1)/u(k-th min) when the sketch is full; exact size otherwise.
    * u maps the signed hash to (0,1) via the exact power-of-two
    * constants 2⁶³/2⁶⁴ (both exactly representable doubles). */
  private def kmvEst(arr: Column, k: Int): Column = {
    // 0-based get: NULL (never thrown) out of bounds — the size<k
    // branch means it is only consumed when index k-1 exists
    val kth = get(arr, lit(k - 1)).cast("double")
    val u = (kth + lit(9223372036854775808.0)) / lit(1.8446744073709552E19)
    round(when(size(arr) < k, size(arr).cast("double"))
      .otherwise(lit((k - 1).toDouble) / u), 6)
  }

  /** The pair-estimate pipeline shared by [[kmvOverlap]] and
    * [[kmvOverlapMatrix]] (SketchesSpec pins their agreement; ONE
    * implementation keeps a future estimator tweak from silently
    * diverging them): consumes sketch columns `a`/`b` plus `carry`
    * passthrough columns, emits carry ++ the nine estimate columns. */
  private def kmvPairStats(pairs: DataFrame, k: Int,
      carry: Seq[String]): DataFrame = {
    val merged = slice(array_sort(array_union(col("a"), col("b"))), 1, k)
    val cs = carry.map(col)
    pairs.select(cs ++ Seq(col("a"), col("b"), merged.as("u")): _*)
      .select(cs ++ Seq(
        size(col("a")).as("n_a"),
        size(col("b")).as("n_b"),
        kmvEst(col("a"), k).as("est_a"),
        kmvEst(col("b"), k).as("est_b"),
        size(col("u")).as("n_union"),
        kmvEst(col("u"), k).as("est_union"),
        size(filter(col("u"), x =>
          array_contains(col("a"), x) && array_contains(col("b"), x)))
          .as("shared"),
        col("u")): _*)
      .select(cs ++ Seq(
        col("n_a"), col("n_b"), col("est_a"), col("est_b"),
        col("n_union"), col("est_union"), col("shared"),
        round(col("shared").cast("double") / col("n_union"), 6)
          .as("jaccard"),
        // UNROUNDED ratio here: in the under-k (exact) regime the
        // intersection must come out integer-exact, and a pre-rounded J
        // would turn 20/60·60 into 19.99998
        round(col("shared").cast("double") / col("n_union")
          * col("est_union"), 6).as("est_intersect")): _*)
  }

  def kmvOverlap(df: DataFrame, inA: Column, inB: Column, value: Column,
      k: Int): DataFrame = {
    require(k > 1, s"kmv overlap needs k > 1, got $k")
    val h = xxhash64(value)
    val sk = df.filter(value.isNotNull).agg(
      graft.plans.Kmv.kmvMinima(when(inA, h), k).as("a"),
      graft.plans.Kmv.kmvMinima(when(inB, h), k).as("b"))
    kmvPairStats(sk, k, carry = Nil)
  }

  /** [[kmvOverlap]] generalized to a GROUP: one KMV sketch per group
    * value, then the full pairwise overlap matrix — G sketches from ONE
    * aggregation pass over one scan, G·(G−1)/2 estimates from
    * sketch-level algebra. The 100 TB shape this replaces is the
    * audience/cohort overlap matrix ("which segments share users"),
    * which computed exactly is G² distinct-intersection joins over the
    * corpus; here the corpus is read once and the pairing is a
    * nested-loop join of G ≤k·8-byte summary rows (model-sized by
    * construction — it never touches data). Same estimate contract as
    * [[kmvOverlap]], same 6dp rounding; exact below k per group.
    *
    * Output: one row per unordered group pair (grp_a < grp_b). */
  def kmvOverlapMatrix(df: DataFrame, group: Column, value: Column,
      k: Int): DataFrame = {
    require(k > 1, s"kmv overlap needs k > 1, got $k")
    val sk = df.filter(value.isNotNull && group.isNotNull)
      .select(group.as("g"), xxhash64(value).as("h"))
      .groupBy(col("g"))
      .agg(graft.plans.Kmv.kmvMinima(col("h"), k).as("m"))
      // materialize the G-row sketch table before the self-join: without
      // this the pairing plan re-runs the CORPUS aggregation once per
      // join side — two full scans instead of one at 100 TB
      .localCheckpoint(true)
    val x = sk.select(col("g").as("grp_a"), col("m").as("a"))
    val y = sk.select(col("g").as("grp_b"), col("m").as("b"))
    kmvPairStats(x.join(y, col("grp_a") < col("grp_b")), k,
        carry = Seq("grp_a", "grp_b"))
      .orderBy(col("grp_a"), col("grp_b"))
  }
}
