package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the SQL-surface advisory (GRAFT_ADVISE hint →
  * [[graft.plans.GraftAdviseHintRule]] →
  * [[graft.plans.AdvisedEquiJoinRewrite]]) — the r15 verdict's
  * "promote the advisory from hand-wired consumers to a Catalyst
  * rule". The causality pins run with size-based broadcast DISABLED so
  * a strategy can only come from the rule; every rewrite is also
  * result-graded against the identical unhinted query (strategy moves
  * shuffle placement, never semantics). */
class AdvisedSqlJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs[A](kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def joins(df: DataFrame): String =
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Union"))
      .mkString("\n")

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("hint causality: the advised query broadcasts where the identical " +
    "unhinted query sort-merges (size-based broadcast disabled)") {
    val dim = (1 to 50).map(i => (i.toLong, s"n$i")).toDF("id", "name")
    val fact = (1 to 20000).map(i => (i % 50 + 1).toLong).toDF("id")
    dim.createOrReplaceTempView("adv_dim")
    fact.createOrReplaceTempView("adv_fact")
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val hinted = spark.sql("""SELECT /*+ GRAFT_ADVISE */ name,
        CAST(count(*) AS BIGINT) AS n
        FROM adv_fact JOIN adv_dim ON adv_fact.id = adv_dim.id
        GROUP BY name""")
      assert(joins(hinted).contains("BroadcastHashJoin"), joins(hinted))
      val control = spark.sql("""SELECT name, CAST(count(*) AS BIGINT) AS n
        FROM adv_fact JOIN adv_dim ON adv_fact.id = adv_dim.id
        GROUP BY name""")
      assert(!joins(control).contains("BroadcastHashJoin"), joins(control))
      assert(sorted(hinted) === sorted(control))
    }
  }

  test("salt verdict through plain SQL: targeted union shape executed, " +
    "results identical to the unhinted join") {
    val big = ((1 to 5000).map(_ => 7L) ++ (1 to 5000).map(i => i + 100L))
      .toDF("k")
    val other = (1 to 200).map(i => (i.toLong, i * 2L)).toDF("k", "v")
    big.createOrReplaceTempView("adv_big")
    other.createOrReplaceTempView("adv_other")
    withConfs(
      "spark.graft.advisor.broadcastMaxRows" -> "0",
      "spark.graft.advisor.skewFactor" -> "1.5",
      "spark.graft.advisor.minSaltOutputRows" -> "100",
      "spark.graft.advisor.maxSaltBuckets" -> "8",
      "spark.graft.advisor.targetPartitions" -> "200000",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val hinted = spark.sql("""SELECT /*+ GRAFT_ADVISE */ k,
        CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv
        FROM adv_big JOIN adv_other USING (k) GROUP BY k""")
      val p = joins(hinted)
      assert(p.contains("__gsalt"), p)
      assert(p.contains("Union"), p)
      assert(p.contains("ShuffledHashJoin"), p)
      assert(!p.contains("BroadcastHashJoin"), p)
      val control = spark.sql("""SELECT k, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(v) AS BIGINT) AS sv
        FROM adv_big JOIN adv_other USING (k) GROUP BY k""")
      assert(sorted(hinted) === sorted(control))
    }
  }

  test("session-wide conf gate advises without a hint; composite keys " +
    "advise as one struct key") {
    val a = (1 to 3000).map(i => (i % 10L, i % 7L, i.toLong))
      .toDF("k1", "k2", "x")
    val d = (0 until 10).flatMap(i => (0 until 7).map(j =>
      (i.toLong, j.toLong, s"g$i$j"))).toDF("k1", "k2", "g")
    a.createOrReplaceTempView("adv_comp_a")
    d.createOrReplaceTempView("adv_comp_d")
    withConfs(
      "spark.graft.advisor.sql" -> "true",
      "spark.graft.advisor.broadcastMaxRows" -> "1000000",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // no hint anywhere: the session flag routes the join, and the
      // 70-row dim side earns a broadcast verdict on the (k1, k2)
      // composite key
      val q = spark.sql("""SELECT g, CAST(count(*) AS BIGINT) AS n
        FROM adv_comp_a a JOIN adv_comp_d d
          ON a.k1 = d.k1 AND a.k2 = d.k2
        GROUP BY g""")
      assert(joins(q).contains("BroadcastHashJoin"), joins(q))
      assert(q.collect().map(r => r.getLong(1)).sum === 3000L)
    }
  }

  test("scope guards: per-type broadcast legality, pre-hinted joins, " +
    "and non-equi conditions") {
    val x = (1 to 1000).map(i => (i.toLong, i % 5L)).toDF("id", "k")
    val y = (1 to 50).map(i => (i % 5L, i.toLong)).toDF("k", "w")
    x.createOrReplaceTempView("adv_x")
    y.createOrReplaceTempView("adv_y")
    withConfs(
      "spark.graft.advisor.sql" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // LEFT OUTER with the DIM ON THE RIGHT: broadcast verdict side =
      // right, which LeftOuter can build — the hint lands
      val outerLegal = spark.sql("""SELECT adv_x.id, adv_y.w FROM adv_x
        LEFT JOIN adv_y ON adv_x.k = adv_y.k""")
      assert(joins(outerLegal).contains("BroadcastHashJoin"),
        joins(outerLegal))
      // LEFT OUTER with the DIM ON THE LEFT: the verdict's broadcast
      // side (left) cannot be built for LeftOuter — untouched
      val outerIllegal = spark.sql("""SELECT adv_x.id, adv_y.w FROM adv_y
        LEFT JOIN adv_x ON adv_x.k = adv_y.k""")
      assert(!joins(outerIllegal).contains("BroadcastHashJoin"),
        joins(outerIllegal))
      // an explicit user strategy hint wins over the advisory
      val userHinted = spark.sql("""SELECT /*+ GRAFT_ADVISE,
        MERGE(adv_y) */ adv_x.id, adv_y.w
        FROM adv_x JOIN adv_y ON adv_x.k = adv_y.k""")
      assert(joins(userHinted).contains("SortMergeJoin"), joins(userHinted))
      // inequality-only condition: no equi-conjunct to advise on
      val nonEqui = spark.sql("""SELECT CAST(count(*) AS BIGINT) AS n
        FROM adv_y a JOIN adv_y b ON a.w < b.w""")
      assert(nonEqui.collect().head.getLong(0) === (50L * 49L) / 2L)
    }
  }

  test("salt parity across join types: left outer / semi / anti emit " +
    "null-keyed and unmatched left rows exactly once") {
    // left: one hot key (7), cold keys, UNMATCHED keys, and NULL keys;
    // right: hot key many times + a matched subset of the cold keys
    val left = ((1 to 4000).map(_ => 7L) ++ (1 to 2000).map(i => i + 100L)
      ++ (1 to 500).map(i => i + 900000L))
      .map(k => (k: java.lang.Long)) ++ Seq.fill(25)(null: java.lang.Long)
    val right = ((1 to 300).map(_ => 7L) ++ (1 to 1000).map(i => i + 100L))
      .map(k => (k, k * 2))
    import spark.implicits._
    left.toDF("k").createOrReplaceTempView("adv_t_l")
    right.toDF("k", "v").createOrReplaceTempView("adv_t_r")
    withConfs(
      "spark.graft.advisor.broadcastMaxRows" -> "0",
      "spark.graft.advisor.skewFactor" -> "1.5",
      "spark.graft.advisor.minSaltOutputRows" -> "100",
      "spark.graft.advisor.maxSaltBuckets" -> "8",
      "spark.graft.advisor.maxHotShare" -> "1.0",
      "spark.graft.advisor.targetPartitions" -> "200000",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      Seq(
        "SELECT %s adv_t_l.k, adv_t_r.v FROM adv_t_l LEFT JOIN adv_t_r" +
          " ON adv_t_l.k = adv_t_r.k",
        "SELECT %s adv_t_l.k FROM adv_t_l LEFT SEMI JOIN adv_t_r" +
          " ON adv_t_l.k = adv_t_r.k",
        "SELECT %s adv_t_l.k FROM adv_t_l LEFT ANTI JOIN adv_t_r" +
          " ON adv_t_l.k = adv_t_r.k").foreach { tpl =>
        val hinted = spark.sql(tpl.format("/*+ GRAFT_ADVISE */"))
        val control = spark.sql(tpl.format(""))
        val p = joins(hinted)
        assert(p.contains("__gsalt") && p.contains("Union"), s"$tpl\n$p")
        assert(!p.contains("BroadcastHashJoin"), s"$tpl\n$p")
        assert(sorted(hinted) === sorted(control), tpl)
      }
    }
  }

  test("FULL OUTER salt: the outer-union decomposition emits matched " +
    "pairs, both sides' unmatched rows, and both sides' null-keyed rows " +
    "exactly once") {
    // hot key 7 on both sides; unmatched LEFT keys (i+900000), unmatched
    // RIGHT keys (i+500000), and NULL keys on BOTH sides — every row
    // class a replicated/salted leg could lose or duplicate
    val left = ((1 to 4000).map(_ => 7L) ++ (1 to 1500).map(i => i + 100L)
      ++ (1 to 400).map(i => i + 900000L))
      .map(k => (k: java.lang.Long)) ++ Seq.fill(20)(null: java.lang.Long)
    val right = ((1 to 300).map(_ => 7L) ++ (1 to 800).map(i => i + 100L)
      ++ (1 to 350).map(i => i + 500000L))
      .map(k => (k: java.lang.Long)) ++ Seq.fill(15)(null: java.lang.Long)
    left.toDF("k").createOrReplaceTempView("adv_fo_l")
    right.map(k => (k, if (k == null) null
      else (k * 2L): java.lang.Long)).toDF("k", "v")
      .createOrReplaceTempView("adv_fo_r")
    withConfs(
      "spark.graft.advisor.broadcastMaxRows" -> "0",
      "spark.graft.advisor.skewFactor" -> "1.5",
      "spark.graft.advisor.minSaltOutputRows" -> "100",
      "spark.graft.advisor.maxSaltBuckets" -> "8",
      "spark.graft.advisor.maxHotShare" -> "1.0",
      "spark.graft.advisor.targetPartitions" -> "200000",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val tpl = "SELECT %s adv_fo_l.k AS lk, adv_fo_r.k AS rk, adv_fo_r.v" +
        " FROM adv_fo_l FULL OUTER JOIN adv_fo_r ON adv_fo_l.k = adv_fo_r.k"
      val hinted = spark.sql(tpl.format("/*+ GRAFT_ADVISE */"))
      val control = spark.sql(tpl.format(""))
      val p = joins(hinted)
      assert(p.contains("__gsalt") && p.contains("Union"), p)
      assert(!p.contains("BroadcastHashJoin"), p)
      // the FullOuter node itself must be decomposed away (LeftOuter +
      // LeftAnti legs are what carry the salt legality)
      assert(!p.contains("FullOuter"), p)
      assert(sorted(hinted) === sorted(control))
    }
  }

  test("forced-replication economics (ADVICE r16): a LEFT OUTER whose " +
    "forced (right) side is mostly hot demotes to shuffle, while the " +
    "same data as INNER still salts by replicating the cold side") {
    // left: hot key 7 at ~0.5% share; right: the SAME key at ~50% share.
    // decide() gates min(share) = left's 0.5% and verdicts salt; the
    // LeftOuter consumer is FORCED to replicate the right side (its
    // unmatched rows never emit) at 50% hot — past the measured 0.1
    // ceiling, so it must demote; the Inner consumer freely replicates
    // the 0.5% left side and keeps the salt.
    val left = ((1 to 50).map(_ => 7L) ++ (1 to 10000).map(i => i + 100L))
      .toDF("k")
    val right = ((1 to 5000).map(_ => 7L) ++ (1 to 5000).map(i => i + 100L))
      .map(k => (k, k * 3L)).toDF("k", "v")
    left.createOrReplaceTempView("adv_fr_l")
    right.createOrReplaceTempView("adv_fr_r")
    withConfs(
      "spark.graft.advisor.broadcastMaxRows" -> "0",
      "spark.graft.advisor.skewFactor" -> "1.5",
      "spark.graft.advisor.minSaltOutputRows" -> "100",
      "spark.graft.advisor.maxSaltBuckets" -> "8",
      "spark.graft.advisor.targetPartitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val outer = spark.sql("""SELECT /*+ GRAFT_ADVISE */ adv_fr_l.k,
        adv_fr_r.v FROM adv_fr_l LEFT JOIN adv_fr_r
        ON adv_fr_l.k = adv_fr_r.k""")
      val pOuter = joins(outer)
      assert(!pOuter.contains("__gsalt"),
        s"forced 50%-hot replication side must demote, not salt:\n$pOuter")
      val controlOuter = spark.sql("""SELECT adv_fr_l.k, adv_fr_r.v
        FROM adv_fr_l LEFT JOIN adv_fr_r ON adv_fr_l.k = adv_fr_r.k""")
      assert(sorted(outer) === sorted(controlOuter))
      val inner = spark.sql("""SELECT /*+ GRAFT_ADVISE */ adv_fr_l.k,
        adv_fr_r.v FROM adv_fr_l JOIN adv_fr_r
        ON adv_fr_l.k = adv_fr_r.k""")
      val pInner = joins(inner)
      assert(pInner.contains("__gsalt"),
        s"inner keeps the salt by replicating the cold side:\n$pInner")
    }
  }

  test("float-key normalization (ADVICE r16): a hot -0.0/+0.0 double " +
    "key routes both halves of every matching pair to one leg") {
    // the HOT key itself is the mixed-sign zero: the left side stores
    // -0.0, the right side +0.0 — join equality matches them, string
    // renderings differ. Without normalization the hot predicate sends
    // left's rows to the hot leg and right's to the cold leg and every
    // match is silently lost.
    val left = ((1 to 500).map(_ => -0.0) ++ (1 to 500).map(i => i + 100.0))
      .toDF("k")
    val right = ((1 to 40).map(_ => 0.0) ++ (1 to 200).map(i => i + 100.0))
      .map(k => (k, k + 0.5)).toDF("k", "v")
    left.createOrReplaceTempView("adv_fz_l")
    right.createOrReplaceTempView("adv_fz_r")
    withConfs(
      "spark.graft.advisor.broadcastMaxRows" -> "0",
      "spark.graft.advisor.skewFactor" -> "1.5",
      "spark.graft.advisor.minSaltOutputRows" -> "100",
      "spark.graft.advisor.maxSaltBuckets" -> "8",
      "spark.graft.advisor.maxHotShare" -> "1.0",
      "spark.graft.advisor.targetPartitions" -> "200000",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val tpl = "SELECT %s adv_fz_l.k, adv_fz_r.v FROM adv_fz_l" +
        " JOIN adv_fz_r ON adv_fz_l.k = adv_fz_r.k"
      val hinted = spark.sql(tpl.format("/*+ GRAFT_ADVISE */"))
      val control = spark.sql(tpl.format(""))
      val p = joins(hinted)
      assert(p.contains("__gsalt"), p)
      assert(sorted(hinted) === sorted(control),
        "mixed-sign-zero matches must survive the hot/cold routing")
      assert(hinted.count() === 500L * 40L + 200L)
    }
  }

  test("advisory memoization: a second identical advised statement runs " +
    "zero additional sketch passes; cacheSize=0 disables") {
    import graft.plans.AdvisedEquiJoinRewrite
    val dim = (1 to 40).map(i => (i.toLong, s"m$i")).toDF("id", "m")
    val fact = (1 to 8000).map(i => (i % 40 + 1).toLong).toDF("id")
    dim.createOrReplaceTempView("adv_memo_d")
    fact.createOrReplaceTempView("adv_memo_f")
    val stmt = """SELECT /*+ GRAFT_ADVISE */ m,
      CAST(count(*) AS BIGINT) AS n
      FROM adv_memo_f JOIN adv_memo_d ON adv_memo_f.id = adv_memo_d.id
      GROUP BY m"""
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      AdvisedEquiJoinRewrite.clearAdviceCache()
      val c0 = AdvisedEquiJoinRewrite.sketchPassCount.get
      val r1 = sorted(spark.sql(stmt))
      val c1 = AdvisedEquiJoinRewrite.sketchPassCount.get
      assert(c1 === c0 + 1, "first statement pays exactly one sketch pass")
      val r2 = sorted(spark.sql(stmt))
      assert(AdvisedEquiJoinRewrite.sketchPassCount.get === c1,
        "second identical statement must be a cache hit")
      assert(r1 === r2)
    }
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.graft.advisor.cacheSize" -> "0") {
      val c2 = AdvisedEquiJoinRewrite.sketchPassCount.get
      spark.sql(stmt).collect()
      assert(AdvisedEquiJoinRewrite.sketchPassCount.get === c2 + 1,
        "cacheSize=0 must re-run the sketch pass")
    }
  }

  test("SQL verdict cache: data rewritten under an unchanged path is a " +
    "MISS (snapshot fingerprint), and the resolved shuffle width is " +
    "part of the verdict's identity") {
    import graft.plans.AdvisedEquiJoinRewrite
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sqlfp").toString
    (1 to 4000).map(i => (i % 50 + 1).toLong).toDF("id")
      .write.mode("overwrite").parquet(dir)
    val dim = (1 to 50).map(i => (i.toLong, s"m$i")).toDF("id", "m")
    dim.createOrReplaceTempView("adv_fp_d")
    val stmt = """SELECT /*+ GRAFT_ADVISE */ m,
      CAST(count(*) AS BIGINT) AS n
      FROM adv_fp_f JOIN adv_fp_d ON adv_fp_f.id = adv_fp_d.id
      GROUP BY m"""
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      spark.read.parquet(dir).createOrReplaceTempView("adv_fp_f")
      AdvisedEquiJoinRewrite.clearAdviceCache()
      val c0 = AdvisedEquiJoinRewrite.sketchPassCount.get
      val r1 = spark.sql(stmt).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(AdvisedEquiJoinRewrite.sketchPassCount.get === c0 + 1)
      // overwrite the fact table IN PLACE (same path, new files) and
      // re-register the view from a fresh read: the r16 path-only key
      // would HIT here and serve a verdict computed over the old data
      (1 to 8000).map(i => (i % 50 + 1).toLong).toDF("id")
        .write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir).createOrReplaceTempView("adv_fp_f")
      val r2 = spark.sql(stmt).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(AdvisedEquiJoinRewrite.sketchPassCount.get === c0 + 2,
        "rewritten data under the unchanged path must re-run the sketch")
      assert(r1.values.sum === 4000L && r2.values.sum === 8000L)
      // r17 ADVICE: with no targetPartitions the fair share divides by
      // the session's shuffle width — changing it between two otherwise
      // identical statements must be a distinct cache key
      val c2 = AdvisedEquiJoinRewrite.sketchPassCount.get
      withConfs("spark.sql.shuffle.partitions" -> "7") {
        spark.sql(stmt).collect()
      }
      assert(AdvisedEquiJoinRewrite.sketchPassCount.get === c2 + 1,
        "a changed shuffle width must not be served the old verdict")
    }
  }

  test("full-outer cost-factor gate (r17 #6): a salt verdict that clears " +
    "the one-sided bar but not the 2x-deeper full-outer bar stays " +
    "one-pass; factor=1 restores engage-on-any-verdict; an inner join " +
    "on the same data still salts") {
    // FullOuterSaltProbe: the decomposition scans every input twice
    // (measured 2.2-2.6x bytes at every probed share), so its
    // engagement bar is fullOuterCostFactor deeper. Fixture: hot key
    // output ~500*40 = 20k rows; minSaltOutputRows=12000 puts it
    // BETWEEN the one-sided floor (12k) and the full-outer floor
    // (2x = 24k).
    val left = ((1 to 500).map(_ => 1L) ++ (1L to 2000L).map(_ + 100L))
      .toDF("k")
    val right = ((1 to 40).map(_ => 1L) ++ (1L to 300L).map(_ + 5000L))
      .toDF("k2")
    left.createOrReplaceTempView("fo_gate_l")
    right.createOrReplaceTempView("fo_gate_r")
    val fullOuter = """SELECT /*+ GRAFT_ADVISE */
      CAST(count(*) AS BIGINT) AS n
      FROM fo_gate_l l FULL OUTER JOIN fo_gate_r r ON l.k = r.k2"""
    val inner = fullOuter.replace("FULL OUTER JOIN", "JOIN")
    def plan(q: String): String =
      spark.sql(q).queryExecution.executedPlan.toString
    withConfs(
      "spark.graft.advisor.broadcastMaxRows" -> "0",
      "spark.graft.advisor.skewFactor" -> "1.5",
      "spark.graft.advisor.minSaltOutputRows" -> "12000",
      "spark.graft.advisor.maxSaltBuckets" -> "8",
      "spark.graft.advisor.targetPartitions" -> "200000",
      "spark.graft.advisor.maxHotShare" -> "1.0",
      "spark.graft.advisor.cacheSize" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // between the bars: the full outer stays a one-pass join...
      val pFo = plan(fullOuter)
      assert(pFo.contains("FullOuter") && !pFo.contains("__gsalt"),
        s"between the bars the one-pass full outer must stand:\n" +
          pFo.take(800))
      // ...while the inner join on the same data salts (one-sided bar)
      val pIn = plan(inner)
      assert(pIn.contains("__gsalt"),
        s"the one-sided bar is cleared — inner must salt:\n${pIn.take(800)}")
      // the knob: factor 1 restores engage-on-any-salt-verdict
      withConfs("spark.graft.advisor.fullOuterCostFactor" -> "1.0") {
        val pFo1 = plan(fullOuter)
        assert(pFo1.contains("__gsalt") && !pFo1.contains("FullOuter"),
          s"factor=1 must decompose:\n${pFo1.take(800)}")
      }
      // past BOTH bars (floor back under 2x-depth) the rewrite engages
      withConfs("spark.graft.advisor.minSaltOutputRows" -> "100") {
        val pDeep = plan(fullOuter)
        assert(pDeep.contains("__gsalt") && !pDeep.contains("FullOuter"),
          s"past the deep bar the decomposition must engage:\n" +
            pDeep.take(800))
      }
      // and the verdicts never change results: decomposed vs one-pass
      val nPlain = spark.sql(
        fullOuter.replace("/*+ GRAFT_ADVISE */", ""))
        .collect().head.getLong(0)
      withConfs("spark.graft.advisor.minSaltOutputRows" -> "100") {
        assert(spark.sql(fullOuter).collect().head.getLong(0) === nPlain,
          "decomposition must preserve the full outer's row count")
      }
    }
  }

  test("GRAFT_ADVISE takes no arguments") {
    val e = intercept[Exception] {
      spark.sql("SELECT /*+ GRAFT_ADVISE(x) */ * FROM range(1)").collect()
    }
    assert(e.getMessage.contains("GRAFT_ADVISE takes no arguments"),
      e.getMessage)
  }

  test("Dataset API surface: df.hint(\"graft_advise\") routes the same " +
    "rule (case-insensitive)") {
    val dim = (1 to 30).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val fact = (1 to 5000).map(i => (i % 30 + 1).toLong).toDF("id")
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val hinted = fact.hint("graft_advise").join(dim, "id")
      assert(joins(hinted).contains("BroadcastHashJoin"), joins(hinted))
      assert(hinted.count() === 5000L)
    }
  }
}
