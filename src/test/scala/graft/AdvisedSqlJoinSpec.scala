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
