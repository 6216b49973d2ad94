package graft

import org.apache.spark.sql.functions._
import graft.plans.JoinAdvisor

/** Pins the pre-join advisory ([[graft.plans.JoinAdvisor]]) against
  * ground truth AND against Spark's actually-executed strategies at both
  * operating points the round-12 verdict named: the broadcast point (a
  * dim Spark itself broadcast-hash-joins) and the skew point (a hot key
  * whose exact share breaches the exact AQE-style skew test). */
class JoinAdvisorSpec extends SparkSpec {
  import spark.implicits._

  test("sideStats: exact count, CMS point estimates never undercount, " +
    "MG names the hot key") {
    val df = (Seq.fill(60)("hot") ++ (1 to 40).map(i => s"k$i"))
      .toDF("k")
    val s = JoinAdvisor.sideStats(df, col("k"), hhCapacity = 8)
    assert(s.rows === 100L)
    val hot = s.heavy.find(_._2 == "hot")
    assert(hot.isDefined, s"MG missed the 60% key: ${s.heavy}")
    // CMS point estimate >= true frequency, for the hot key and a cold one
    assert(JoinAdvisor.cmsEstimate(s.cells, hot.get._1) >= 60L)
    val cold = s.heavy.find(_._2 != "hot")
    cold.foreach(c => assert(JoinAdvisor.cmsEstimate(s.cells, c._1) >= 1L))
    // null keys never enter the sketch (xxhash64 would fold them into the
    // seed value, a phantom shared key)
    val withNulls = df.unionByName(
      Seq.fill(5)(null.asInstanceOf[String]).toDF("k"))
    assert(JoinAdvisor.sideStats(withNulls, col("k")).rows === 100L)
  }

  test("inner-product estimate upper-bounds the exact join cardinality") {
    val a = (1 to 500).map(i => i % 37).toDF("k")
    val b = (1 to 800).map(i => i % 53).toDF("k")
    val sa = JoinAdvisor.sideStats(a, col("k"))
    val sb = JoinAdvisor.sideStats(b, col("k"))
    val est = JoinAdvisor.innerProduct(sa.cells, sb.cells)
    val exact = a.join(b, "k").count()
    assert(est >= exact, s"CMS inner product $est undercut exact $exact")
  }

  test("broadcast point: advisory matches Spark's executed " +
    "BroadcastHashJoin on a dim-sized side") {
    val dim = (1 to 100).map(i => (i.toLong, s"name$i")).toDF("id", "name")
    val fact = (1 to 50000).map(i => (i % 100 + 1).toLong).toDF("id")
    val advice = JoinAdvisor.advise(fact, col("id"), dim, col("id"))
    assert(advice.strategy === "broadcast")
    assert(advice.broadcastSide === Some("right"))
    assert(advice.rightRows === 100L && advice.leftRows === 50000L)
    // est upper-bounds exact output (50000: every fact row matches once)
    assert(advice.estOutputRows >= 50000L)
    // Spark's own planner agrees: the executed join IS a broadcast join
    val p = fact.join(dim, "id").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("skew point: advisory salts exactly when the exact hot-key share " +
    "breaches the exact skew test") {
    // 90% of the big side is one key; the other side has 50 rows per key
    // -> hot key output = 45k*50 = 2.25M of est ~2.5M total: one reducer
    // would own ~90% of the join
    val big = ((1 to 45000).map(_ => 7L) ++ (1 to 5000).map(i => (i % 100 + 10).toLong))
      .toDF("k")
    val other = (1 to 101).flatMap(k => Seq.fill(50)(k.toLong + 6)).toDF("k")
    // skewFactor 3 (not the 5.0 cluster default): with only 4 shuffle
    // partitions in the test harness a single key can never exceed 5x
    // the fair share (that would be >125% of the join); at cluster
    // partition counts (hundreds+) the default is the binding one
    val advice = JoinAdvisor.advise(
      big, col("k"), other, col("k"),
      broadcastMaxRows = 100L,       // both sides "big" at this test scale
      skewFactor = 3.0,
      minSaltOutputRows = 1000L)     // test-scale floor
    assert(advice.strategy === "salt", advice.toString)
    assert(advice.hotKey === Some("7"), advice.toString)
    // ground truth: exact hot share vs exact fair share breaches 3x
    val exactHot = big.filter($"k" === 7).count() *
      other.filter($"k" === 7).count()
    val exactAll = big.join(other, "k").count()
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(exactHot > 3.0 * (exactAll / parts),
      "fixture must genuinely breach the skew factor")
    assert(advice.hotKeyOutputRows >= exactHot)
    // the recommended bucket count spreads the hot key back under ~fair
    assert(advice.saltBuckets >= 2)
    assert(exactHot / advice.saltBuckets <= 3.0 * advice.fairShareRows)
    // the advisory's executable form: saltedEquiJoin output matches the
    // plain join exactly (multiplicity included)
    val salted = graft.operators.Skew.saltedEquiJoin(
      big, other, "k", "k", saltSource = monotonically_increasing_id(),
      buckets = advice.saltBuckets)
    assert(salted.count() === exactAll)
  }

  test("uniform big-big join: plain shuffle, no salt, no broadcast") {
    val a = (1 to 20000).map(i => (i % 1000).toLong).toDF("k")
    val b = (1 to 20000).map(i => (i % 1000).toLong).toDF("k")
    val advice = JoinAdvisor.advise(
      a, col("k"), b, col("k"),
      broadcastMaxRows = 100L, minSaltOutputRows = 1000L)
    assert(advice.strategy === "shuffle", advice.toString)
    assert(advice.estOutputRows >= a.join(b, "k").count())
  }

  test("detection floor at the default capacity: a hot key far below the " +
    "old N/17 blind spot still surfaces (r14 verdict #2)") {
    // MG only surfaces keys with f > N/(capacity+1). The historical
    // default 16 made a key invisible below N/17 — the exact
    // AdvisedJoinProbe failure, fixed per-consumer in r14 and promoted
    // to the advisory-wide default (1024) this round. Fixture: one key
    // at ~2% of N (N/50) — far under the old floor, far over the new.
    val n = 50000
    val hotRows = n / 50 // 1000 rows = 2% of N: N/17 ≈ 2941 would hide it
    // hot rows INTERLEAVED uniformly (every 50th row): concentrated hot
    // runs would survive capacity 16 by luck of partial-merge order —
    // the blind spot is about decrement pressure within the stream
    val df = (1 to n)
      .map(i => if (i % 50 == 0) 7L else 100L + i).toDF("k")
    val atDefault = JoinAdvisor.sideStats(df, col("k"))
    val hotAtDefault = atDefault.heavy.find(_._2 == "7")
    assert(hotAtDefault.isDefined,
      s"the 2% key must surface at the default capacity; " +
        s"got ${atDefault.heavy.size} candidates")
    // the MG lower-bound guarantee at the default: mg >= f - N/(cap+1),
    // so the surfaced ESTIMATE itself is near-exact (>= 1000 - 48)
    assert(hotAtDefault.get._3 >= hotRows - n / 1025,
      s"MG estimate ${hotAtDefault.get._3} under the guaranteed floor")
    // at the old capacity the guarantee is VACUOUS for this key
    // (f - N/17 < 0): surfacing becomes merge-order luck, and when the
    // key does survive its estimate may be arbitrarily decremented —
    // pin that the GUARANTEED floor, not observed behavior, is what
    // separates the capacities (observed: cap 16 kept the key here but
    // with a decrement-eroded count; concentrated runs or another
    // partitioning could drop it entirely)
    val atSixteen = JoinAdvisor.sideStats(df, col("k"), hhCapacity = 16)
    atSixteen.heavy.find(_._2 == "7").foreach(h =>
      assert(h._3 <= hotRows, "MG never overcounts"))
    assert(hotRows - n / 17 < 0, "old floor genuinely vacuous for a 2% key")
    // and the default floor is what the scaladoc promises: f > N/1025
    assert(hotRows > n / 1025 && hotRows < n / 17)
  }

  test("100 TB-point arithmetic saturates instead of wrapping negative") {
    // the r13 ADVICE finding: at ~1e10 rows per side the hot key's
    // f_A·f_B product exceeds Long.MaxValue and plain `*` wraps
    // NEGATIVE — the skew test then silently fails and a must-salt join
    // ships as plain shuffle. Saturation keeps the estimate one-sided.
    val big = 4_000_000_000L // 4e9 occurrences of one hot key per side
    assert(big * big < 0, "the raw product really does wrap on Long")
    assert(JoinAdvisor.satMul(big, big) === Long.MaxValue)
    assert(JoinAdvisor.satAdd(Long.MaxValue, 1L) === Long.MaxValue)
    assert(JoinAdvisor.satMul(3L, 4L) === 12L, "in-range products are exact")
    assert(JoinAdvisor.satAdd(3L, 4L) === 7L)
    // innerProduct over synthetic CMS cells with 1e10-scale counters must
    // come back saturated-positive, never negative
    val cells = (0 until JoinAdvisor.Depth)
      .map(j => (j, 0) -> 10_000_000_000L).toMap
    val est = JoinAdvisor.innerProduct(cells, cells)
    assert(est === Long.MaxValue, s"expected saturation, got $est")
  }

  test("GraftSession.joinAdvice: same-named key shorthand") {
    val dim = (1 to 50).map(i => (i.toLong, s"n$i")).toDF("id", "name")
    val fact = (1 to 5000).map(i => (i % 50 + 1).toLong).toDF("id")
    val advice = GraftSession.joinAdvice(fact, dim, "id")
    assert(advice.strategy === "broadcast")
  }

  test("confGate: off by default, thresholds parsed once for all " +
    "consumers, malformed values fail naming the key") {
    // absent flag -> None (the plain operators stay static)
    assert(JoinAdvisor.confGate(spark, "spark.graft.advisor.rangeJoin")
      .isEmpty)
    // flag on -> the shared defaults (hhCapacity at the advisory-wide
    // 1024 floor, no targetPartitions unless set)
    spark.conf.set("spark.graft.advisor.knnGraph", "true")
    try {
      val c = JoinAdvisor.confGate(spark, "spark.graft.advisor.knnGraph").get
      assert(c.broadcastMaxRows === 1000000L && c.hhCapacity === 1024 &&
        c.maxSaltBuckets === 1024 && c.targetPartitions.isEmpty)
      // a malformed shared threshold must name the offending key, not
      // surface as a bare NumberFormatException deep in an operator
      spark.conf.set("spark.graft.advisor.maxSaltBuckets", "lots")
      val e = intercept[IllegalArgumentException](
        JoinAdvisor.confGate(spark, "spark.graft.advisor.knnGraph"))
      assert(e.getMessage.contains("spark.graft.advisor.maxSaltBuckets") &&
        e.getMessage.contains("lots"))
    } finally {
      spark.conf.unset("spark.graft.advisor.knnGraph")
      spark.conf.unset("spark.graft.advisor.maxSaltBuckets")
    }
  }

  test("salt demotes to shuffle past the hot-share crossover; the share " +
    "tested is the best REPLICATION choice (min across sides)") {
    // 90% of BOTH sides carries the hot key: whichever side replicates,
    // targeted salting degenerates toward full replication — past the
    // SaltShareProbe crossover, AQE's post-shuffle split is the cheaper
    // cure, so the verdict demotes
    val hotBoth = ((1 to 9000).map(_ => 7L) ++
      (1 to 1000).map(i => 100L + i)).toDF("k")
    val demoted = JoinAdvisor.advise(
      hotBoth, col("k"), hotBoth, col("k"),
      broadcastMaxRows = 0L, skewFactor = 1.5, minSaltOutputRows = 100L,
      targetPartitions = Some(200000))
    assert(demoted.strategy === "shuffle", demoted.toString)
    assert(demoted.hotRowShare > 0.5 && demoted.hotShareLeft > 0.5 &&
      demoted.hotShareRight > 0.5, demoted.toString)
    // the demotion (not the skew test) is what flipped it: the same
    // shape salts when the ceiling is lifted
    val lifted = JoinAdvisor.advise(
      hotBoth, col("k"), hotBoth, col("k"),
      broadcastMaxRows = 0L, skewFactor = 1.5, minSaltOutputRows = 100L,
      targetPartitions = Some(200000), maxHotShare = 1.0)
    assert(lifted.strategy === "salt", lifted.toString)
    // one-sided heat STAYS salt under the default ceiling: a hot PROBE
    // side is exactly what salting cures — only the replicated side
    // pays ×buckets, and the cold side is the obvious replication choice
    val coldSide = (1 to 101).flatMap(k => Seq.fill(50)(k.toLong + 6))
      .toDF("k")
    val oneSided = JoinAdvisor.advise(
      hotBoth, col("k"), coldSide, col("k"),
      broadcastMaxRows = 100L, skewFactor = 3.0, minSaltOutputRows = 1000L)
    assert(oneSided.strategy === "salt", oneSided.toString)
    assert(oneSided.hotShareLeft > 0.5 && oneSided.hotShareRight < 0.2,
      oneSided.toString)
    assert(oneSided.hotRowShare === oneSided.hotShareRight)
  }

  test("advise/adviseSelf memoize: a repeated identical advisory runs " +
    "zero additional sketch passes; parameter or input changes miss; " +
    "cacheSize=0 disables") {
    import spark.implicits._
    val left = (1 to 2000).map(i => (i % 40 + 1).toLong).toDF("k")
    val right = (1 to 40).map(i => (i.toLong, i * 2L)).toDF("k", "v")
    JoinAdvisor.clearAdviceCache()
    val c0 = JoinAdvisor.sketchPassCount.get
    val a1 = JoinAdvisor.advise(left, col("k"), right, col("k"))
    assert(JoinAdvisor.sketchPassCount.get === c0 + 1)
    val a2 = JoinAdvisor.advise(left, col("k"), right, col("k"))
    assert(JoinAdvisor.sketchPassCount.get === c0 + 1,
      "identical advisory must be a cache hit")
    assert(a1 === a2)
    // a changed decision parameter is a different key
    JoinAdvisor.advise(left, col("k"), right, col("k"), skewFactor = 3.0)
    assert(JoinAdvisor.sketchPassCount.get === c0 + 2)
    // a changed INPUT is a different key (plan-canonical, not by name)
    val left2 = (1 to 2000).map(i => (i % 7 + 1).toLong).toDF("k")
    JoinAdvisor.advise(left2, col("k"), right, col("k"))
    assert(JoinAdvisor.sketchPassCount.get === c0 + 3)
    // self-join form shares the machinery
    val s1 = JoinAdvisor.adviseSelf(left, col("k"))
    val cSelf = JoinAdvisor.sketchPassCount.get
    val s2 = JoinAdvisor.adviseSelf(left, col("k"))
    assert(JoinAdvisor.sketchPassCount.get === cSelf && s1 === s2)
    // opt-out recomputes every time
    val prev = spark.conf.getOption("spark.graft.advisor.cacheSize")
    spark.conf.set("spark.graft.advisor.cacheSize", "0")
    try {
      val cOff = JoinAdvisor.sketchPassCount.get
      JoinAdvisor.advise(left, col("k"), right, col("k"))
      JoinAdvisor.advise(left, col("k"), right, col("k"))
      assert(JoinAdvisor.sketchPassCount.get === cOff + 2)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.advisor.cacheSize", v)
      case None => spark.conf.unset("spark.graft.advisor.cacheSize")
    }
  }

  test("verdict cache snapshot fingerprint: data rewritten under an " +
    "UNCHANGED path is a cache MISS with a fresh verdict; an unchanged " +
    "listing through a fresh read still hits") {
    // r17 verdict #2: the r16 cache keyed on the canonicalized plan
    // only, and file-relation equality is PATH-based (InMemoryFileIndex
    // compares rootPaths) — so overwriting a table in place served the
    // old verdict for the process lifetime. The key now carries a
    // digest of the FileIndex listing (path, size, mtime per file).
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-advfp").toString
    (1 to 500).map(i => (i % 10 + 1).toLong).toDF("k")
      .write.mode("overwrite").parquet(dir)
    val right = (1 to 40).map(i => (i.toLong, i * 2L)).toDF("k", "v")
    JoinAdvisor.clearAdviceCache()
    val c0 = JoinAdvisor.sketchPassCount.get
    val a1 = JoinAdvisor.advise(
      spark.read.parquet(dir), col("k"), right, col("k"))
    assert(JoinAdvisor.sketchPassCount.get === c0 + 1)
    assert(a1.leftRows === 500L)
    // a FRESH read of the unchanged path: same canonical plan, same
    // listing digest -> hit (the memoization still earns its keep)
    val a2 = JoinAdvisor.advise(
      spark.read.parquet(dir), col("k"), right, col("k"))
    assert(JoinAdvisor.sketchPassCount.get === c0 + 1,
      "unchanged data under the same path must stay a cache hit")
    assert(a2 === a1)
    // overwrite IN PLACE: identical path, new files -> the fingerprint
    // moves, the stale verdict is NOT served, and the fresh one sees
    // the new row count
    (1 to 900).map(i => (i % 10 + 1).toLong).toDF("k")
      .write.mode("overwrite").parquet(dir)
    val a3 = JoinAdvisor.advise(
      spark.read.parquet(dir), col("k"), right, col("k"))
    assert(JoinAdvisor.sketchPassCount.get === c0 + 2,
      "rewritten data under an unchanged path must be a cache miss")
    assert(a3.leftRows === 900L,
      "the fresh verdict must reflect the rewritten data")
  }
}
