package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Layout, Sketches}
import graft.sources.Tables
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}

/** The core relational operator surface of the engine, exercised over the
  * TPC-H-ish fixtures. Each query re-expresses one (or more) operators from
  * SURVEY.md §2 — the inventory extracted from the reference
  * (app/Console/Commands of chefsplate/groove-to-helpscout-migration-tool) —
  * as an idiomatic Catalyst-optimizable DataFrame plan:
  *
  *  - scans with pushdown (S1-S3: SyncCustomers.php:57-83,
  *    SyncTickets.php:124-146,169-202)
  *  - broadcast dimension joins (J1-J5: APIHelper.php:112-159)
  *  - semi/anti validation joins (J7/J8: SyncTickets.php:84-108, F1/J6 dedup:
  *    TicketProcessor.php:353-373)
  *  - group-by/collect aggregation (A3: TicketPublisher.php:55-75)
  *  - explode/flatten (N3/N4: APIHelper.php:252-261, SyncTickets.php:124)
  *  - CASE dictionary mapping (X10: APIHelper.php:198-218)
  *  - first-space name split / truncation (X1/X2: APIHelper.php:166-189)
  *  - regex extraction (X6-X8: TicketProcessor.php:210-277)
  *  - date parse/format (X11: TicketProcessor.php:436-437)
  *  - page-range scans (F4: SyncTickets.php:162-189) and point lookups
  *    (S3/VT: ViewTicket.php:53-57)
  *
  * Scale notes: fact-fact joins shuffle on their keys and leave join
  * reordering to Catalyst/AQE; dimension joins are explicitly `broadcast()`;
  * aggregates are partial (map-side) by construction; every scan projects
  * only needed columns so parquet `ReadSchema` stays narrow.
  */
object RelationalQueries extends QueryPack {

  /** TPC-H Q1-style pricing summary: filtered scan → partial+final agg.
    * Covers A1/A2 counting (SyncCustomers.php:62-69) at analytic scale. */
  private val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") <= lit("2000-12-31"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      round(avg(l_quantity), 2) AS avg_qty,
      round(avg(l_extendedprice), 2) AS avg_price,
      round(avg(l_discount), 4) AS avg_disc,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  /** Global top-k by sort+limit (§2.9: the engine's explicit ordering
    * surface; the reference only has implicit page order, SC:71-83). */
  private val q02 = Q(
    "q02_topk_orders",
    (s, dir) => Tables(s, dir).orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** TPC-H Q3-style: selective dim filter → fact join → agg → top-k.
    * Shuffle-join on orderkey; customer side filtered before the join so
    * Catalyst can push the predicate below it. */
  private val q03 = Q(
    "q03_segment_revenue",
    (s, dir) => {
      val t = Tables(s, dir)
      val c = t.customer.filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey"))
      val o = t.orders.filter(col("o_orderdate") < lit("2000-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t.lineitem.filter(col("l_shipdate") > lit("2000-01-01"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'MACHINERY'
        AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** EXISTS as left-semi join (J7-shape validation gate,
    * SyncTickets.php:84-92 expressed as a distributed semi-join). */
  private val q04 = Q(
    "q04_priority_exists",
    (s, dir) => {
      val t = Tables(s, dir)
      val returned = t.lineitem.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      t.orders
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** NOT EXISTS as left-anti join — the dedup/validation shape (F1/J6:
    * TicketProcessor.php:353-373; J8: SyncTickets.php:100-108). Customers
    * with no 1995 order. */
  private val q05 = Q(
    "q05_quiet_customers_1995",
    (s, dir) => {
      val t = Tables(s, dir)
      val o95 = t.orders
        .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1996-01-01"))
        .select(col("o_custkey"))
      t.customer
        .join(o95, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
      ORDER BY c_custkey"""))

  /** TPC-H Q6-style selective filter + scalar agg: the pushdown showcase —
    * all three predicates reach the parquet scan. */
  private val q06 = Q(
    "q06_discount_revenue",
    (s, dir) => Tables(s, dir).lineitem
      .filter(col("l_shipdate") >= lit("1998-01-01") && col("l_shipdate") < lit("1999-01-01")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
           count(lit(1)).as("n_lines")),
    Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      count(*) AS n_lines FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** Broadcast hash join fact⋈dim (J1/J2 mailbox lookups,
    * APIHelper.php:112-141 — dims are broadcast, never shuffled). */
  private val q07 = Q(
    "q07_brand_revenue",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem.select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
             count(lit(1)).as("n_lines"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      count(*) AS n_lines FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand"""))

  /** Snowflake dim chain: two broadcast joins then agg (S9-S11 dims). */
  private val q08 = Q(
    "q08_region_balance",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer.select(col("c_nationkey"), col("c_acctbal"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("c_acctbal")), 2).as("total_bal"),
             count(lit(1)).as("n_cust"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name, round(sum(c_acctbal), 2) AS total_bal,
      count(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  /** CASE dictionary mapping — the Groove-state→HelpScout-status table
    * (X10: APIHelper.php:198-218) re-expressed over o_orderstatus, with the
    * unknown→NULL error-channel row (TicketProcessor.php:444-446). */
  private val q09 = Q(
    "q09_status_mapping",
    (s, dir) => Tables(s, dir).orders
      .withColumn("status",
        when(col("o_orderstatus") === "O", "active")
          .when(col("o_orderstatus") === "P", "pending")
          .when(col("o_orderstatus") === "F", "closed")
          .otherwise(lit(null)))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("status")),
    Some("""SELECT CASE WHEN o_orderstatus = 'O' THEN 'active'
        WHEN o_orderstatus = 'P' THEN 'pending'
        WHEN o_orderstatus = 'F' THEN 'closed' ELSE NULL END AS status,
      count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY 1 ORDER BY status"""))

  /** Case-insensitive lookup join against an inline literal dim (X9 `strcasecmp`
    * joins: APIHelper.php:118,136,154; J4 isin membership:
    * TicketProcessor.php:76-83). */
  private val q10 = Q(
    "q10_ci_segment_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val dim = s.createDataFrame(Seq(
        ("Automobile", "retail"), ("Building", "construction"),
        ("Furniture", "retail"), ("Household", "retail"),
        ("Machinery", "industrial"))).toDF("seg_name", "seg_class")
      t.customer.select(col("c_mktsegment"), col("c_acctbal"))
        .join(broadcast(dim), lower(col("c_mktsegment")) === lower(col("seg_name")), "left")
        .groupBy(col("seg_class"))
        .agg(count(lit(1)).as("n_cust"), round(avg(col("c_acctbal")), 2).as("avg_bal"))
        .orderBy(col("seg_class"))
    },
    Some("""SELECT seg_class, count(*) AS n_cust, round(avg(c_acctbal), 2) AS avg_bal
      FROM customer LEFT JOIN (VALUES ('Automobile','retail'), ('Building','construction'),
        ('Furniture','retail'), ('Household','retail'), ('Machinery','industrial'))
        AS dim(seg_name, seg_class)
      ON lower(c_mktsegment) = lower(seg_name)
      GROUP BY seg_class ORDER BY seg_class"""))

  /** split+explode flatten (N3/N4: APIHelper.php:252-261, comma-list explode
    * SyncTickets.php:124) as a distributed word count. */
  private val q11 = Q(
    "q11_word_counts",
    (s, dir) => Tables(s, dir).part
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("word")),
    Some("""SELECT word, count(*) AS n FROM
      (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
      GROUP BY word ORDER BY word"""))

  /** Top-1-per-group via ranking window (§2.9 gap in the reference — part of
    * the engine's analytic surface over the fixtures). */
  private val q12 = Q(
    "q12_top_order_per_customer",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir).orders
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .drop("rn")
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM
      (SELECT o_custkey, o_orderkey, o_totalprice,
        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
       FROM orders) WHERE rn = 1 ORDER BY o_custkey"""))

  /** Running aggregate over an ordered frame (cumulative spend). */
  private val q13 = Q(
    "q13_running_spend",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir).orders
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
      FROM orders WHERE o_custkey < 100 ORDER BY o_custkey, o_orderkey"""))

  /** lag/lead event-sequence analytics over the events table. */
  private val q14 = Q(
    "q14_event_deltas",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir).events
        .filter(col("user_id") < 50)
        .select(col("user_id"), col("event_id"), col("event_type"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          round(col("value") - lag(col("value"), 1).over(w), 2).as("value_delta"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id, event_type,
      lag(event_type, 1) OVER w AS prev_type,
      lead(event_type, 1) OVER w AS next_type,
      round(value - lag(value, 1) OVER w, 2) AS value_delta
      FROM events WHERE user_id < 50
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id"""))

  /** rank / dense_rank ranking family. */
  private val q15 = Q(
    "q15_supplier_rank",
    (s, dir) => {
      val w = Window.partitionBy(col("s_nationkey")).orderBy(col("s_acctbal").desc)
      Tables(s, dir).supplier
        .select(col("s_nationkey"), col("s_suppkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .orderBy(col("s_nationkey"), col("s_suppkey"))
    },
    Some("""SELECT s_nationkey, s_suppkey,
      rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk,
      dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS drnk
      FROM supplier ORDER BY s_nationkey, s_suppkey"""))

  /** Set ops — INTERSECT/EXCEPT (§2.9: union accumulation AH:60,96; the
    * except-shaped validation logic ST:84-108). */
  private val q16 = Q(
    "q16_nation_coverage",
    (s, dir) => {
      val t = Tables(s, dir)
      val custN = t.customer.select(col("c_nationkey").as("nationkey"))
      val suppN = t.supplier.select(col("s_nationkey").as("nationkey"))
      val both = custN.intersect(suppN).withColumn("tag", lit("both"))
      val custOnly = custN.except(suppN).withColumn("tag", lit("cust_only"))
      both.unionByName(custOnly)
        .select(col("tag"), col("nationkey"))
        .orderBy(col("tag"), col("nationkey"))
    },
    Some("""SELECT tag, nationkey FROM (
      SELECT 'both' AS tag, nationkey FROM
        (SELECT c_nationkey AS nationkey FROM customer INTERSECT
         SELECT s_nationkey AS nationkey FROM supplier)
      UNION ALL
      SELECT 'cust_only' AS tag, nationkey FROM
        (SELECT c_nationkey AS nationkey FROM customer EXCEPT
         SELECT s_nationkey AS nationkey FROM supplier))
      ORDER BY tag, nationkey"""))

  /** ROLLUP multi-level aggregate (north-star surface beyond the reference;
    * SURVEY §2.6 notes the reference has no grouping sets). */
  private val q17 = Q(
    "q17_priority_rollup",
    (s, dir) => Tables(s, dir).orders
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("total"))
      .orderBy(col("priority"), col("status")),
    Some("""SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      coalesce(o_orderstatus, 'ALL') AS status,
      count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      ORDER BY priority, status"""))

  /** Grouped collect with deterministic ordering (A3 error grouping
    * TicketPublisher.php:55-75 = groupBy+collect_list; emitted as a sorted
    * joined string for oracle stability). */
  private val q18 = Q(
    "q18_nations_concat",
    (s, dir) => Tables(s, dir).nation
      .groupBy(col("n_regionkey"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
           count(lit(1)).as("n"))
      .orderBy(col("n_regionkey")),
    Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
      count(*) AS n FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  /** Regex extraction from a semi-structured string column (X6-X8 href
    * parsing, TicketProcessor.php:210-223,271-277 — same regexp_extract
    * pattern over events.props). */
  private val q19 = Q(
    "q19_props_extract",
    (s, dir) => Tables(s, dir).events
      .select(col("event_id"),
        regexp_extract(col("props"), """"k": (\d+)""", 1).cast("long").as("k"))
      .filter(col("event_id") < 2000)
      .orderBy(col("event_id")),
    Some("""SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
      FROM events WHERE event_id < 2000 ORDER BY event_id"""))

  /** Date truncation + formatting (X11 date parse/re-format,
    * TicketProcessor.php:436-437; emitted as strings for writer parity). */
  private val q20 = Q(
    "q20_monthly_orders",
    (s, dir) => Tables(s, dir).orders
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("month")),
    Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
      count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY 1 ORDER BY month"""))

  /** First-space name split (X1: APIHelper.php:166-176 splitFullName —
    * first token vs trimmed remainder, no-space ⇒ empty rest). */
  private val q21 = Q(
    "q21_part_name_split",
    (s, dir) => Tables(s, dir).part
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\S+)", 1).as("first_token"),
        ltrim(regexp_replace(col("p_name"), "^\\S+", "")).as("rest"))
      .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey, regexp_extract(p_name, '^(\S+)', 1) AS first_token,
      ltrim(regexp_replace(p_name, '^\S+', '')) AS rest
      FROM part ORDER BY p_partkey"""))

  /** Length-capped truncation with warning flag (X2/X3:
    * APIHelper.php:180-189, CustomerProcessor.php:64-77). */
  private val q22 = Q(
    "q22_truncate_names",
    (s, dir) => Tables(s, dir).part
      .select(col("p_partkey"),
        substring(col("p_name"), 1, 10).as("name_trunc"),
        (length(col("p_name")) > 10).as("was_truncated"))
      .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey, substr(p_name, 1, 10) AS name_trunc,
      (length(p_name) > 10) AS was_truncated FROM part ORDER BY p_partkey"""))

  /** Point lookup by id list (S3 ticket lookup ST:124-146; view-ticket
    * VT:53-57) — isin predicate pushed to the scan. */
  private val q23 = Q(
    "q23_point_lookup",
    (s, dir) => Tables(s, dir).orders
      .filter(col("o_orderkey").isin(1L, 5L, 13L, 42L, 999L))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s, o_orderpriority
      FROM orders WHERE o_orderkey IN (1, 5, 13, 42, 999) ORDER BY o_orderkey"""))

  /** Page-range scan (F4 `--startPage/--stopPage` ST:162-189): derive a page
    * column and range-filter it — at scale this is partition pruning. */
  private val q24 = Q(
    "q24_page_scan",
    (s, dir) => Tables(s, dir).orders
      .withColumn("page", floor(col("o_orderkey") / 50).cast("long"))
      .filter(col("page").between(2, 5))
      .groupBy(col("page"))
      .agg(count(lit(1)).as("n"),
           min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
      .orderBy(col("page")),
    Some("""SELECT CAST(floor(o_orderkey / 50) AS BIGINT) AS page, count(*) AS n,
      min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM orders WHERE CAST(floor(o_orderkey / 50) AS BIGINT) BETWEEN 2 AND 5
      GROUP BY 1 ORDER BY page"""))

  /** Conditional aggregation — the ok/error split-channel shape (F6 error
    * quarantine TicketProcessor.php:450-461 as count/avg over predicates). */
  private val q25 = Q(
    "q25_conditional_agg",
    (s, dir) => Tables(s, dir).events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("value") >= 100, lit(1))).as("n_high"),
        round(avg(when(col("value") < 100, col("value"))), 2).as("avg_low"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type, count(*) AS n_total,
      count(CASE WHEN value >= 100 THEN 1 END) AS n_high,
      round(avg(CASE WHEN value < 100 THEN value END), 2) AS avg_low
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Exact distinct counts (A1 total_count accounting, SC:62-63) — the
    * exact baseline the HLL variant (TextQueries) approximates. */
  private val q26 = Q(
    "q26_distinct_counts",
    (s, dir) => Tables(s, dir).lineitem
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders")),
    Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
      count(DISTINCT l_suppkey) AS n_supps,
      count(DISTINCT l_orderkey) AS n_orders FROM lineitem"""))

  /** Two-level aggregation: per-order rollup then distribution over the
    * rollup — the heavy-key groupBy pattern AQE handles under skew. */
  private val q27 = Q(
    "q27_order_size_histogram",
    (s, dir) => Tables(s, dir).lineitem
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
      .groupBy(col("n_lines"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_lines")),
    Some("""SELECT n_lines, count(*) AS n_orders FROM
      (SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey)
      GROUP BY n_lines ORDER BY n_lines"""))

  /** Semi-structured JSON access via get_json_object (the raw-JSON
    * fallback path S7, SURVEY §2.7 note) — vs DuckDB's JSON extension. */
  private val q28 = Q(
    "q28_json_extract",
    (s, dir) => Tables(s, dir).events
      .filter(col("event_id") < 1000)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("k_mod")),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      count(*) AS n, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      FROM events WHERE event_id < 1000 GROUP BY 1 ORDER BY k_mod"""))

  /** Exact interpolated percentiles (both engines use linear
    * interpolation: Spark `percentile`, DuckDB `quantile_cont`). */
  private val q29 = Q(
    "q29_price_percentiles",
    (s, dir) => Tables(s, dir).orders
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 2).as("p75"))
      .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus,
      round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
      round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
      round(quantile_cont(o_totalprice, 0.75), 2) AS p75
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Scalar-subquery filter (TPC-H Q22 flavor): customers above the
    * global positive-balance average. Spark side broadcasts the 1-row
    * aggregate rather than re-running it per row. */
  private val q2a = Q(
    "q2a_above_avg_balance",
    (s, dir) => {
      val t = Tables(s, dir)
      val avgBal = t.customer.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("global_avg"))
      t.customer
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("global_avg"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rich"), round(sum(col("c_acctbal")), 2).as("total_bal"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(*) AS n_rich,
      round(sum(c_acctbal), 2) AS total_bal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** argmax aggregation: the top-revenue part per brand via max_by
    * (DuckDB arg_max), with deterministic key tiebreak via max_by on a
    * composed comparable. */
  private val q2b = Q(
    "q2b_brand_top_part",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem.select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"))
        .groupBy(col("p_brand"))
        .agg(expr("max_by(p_partkey, struct(rev, -p_partkey))").as("top_partkey"),
          round(max(col("rev")), 2).as("top_rev"))
      .orderBy(col("p_brand"))
    },
    Some("""WITH r AS (SELECT p_brand, p_partkey,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_partkey),
      w AS (SELECT *, row_number() OVER (PARTITION BY p_brand
        ORDER BY rev DESC, p_partkey) AS rn FROM r)
      SELECT p_brand, p_partkey AS top_partkey, rev AS top_rev
      FROM w WHERE rn = 1 ORDER BY p_brand"""))

  /** Salted equi-join on a PATHOLOGICALLY skewed key
    * (operators.Skew.saltedEquiJoin — SURVEY §7.4's "one viral ticket"
    * device): l_returnflag has THREE distinct values, so a plain
    * shuffle join lands the whole fact table on ≤3 reducers; the salt
    * spreads each flag over 16 buckets keyed by the line's own
    * (orderkey, linenumber) identity while the 3-row dim replicates per
    * bucket. The dim side carries a shuffle_hash hint — a dim this
    * small would otherwise broadcast, which sidesteps the very skew
    * the query demonstrates (broadcast IS the right plan for a tiny
    * dim; the salt is for dims past broadcast size — NOTES §skew).
    * Join semantics are salt-invariant, so the oracle is the plain SQL
    * join. Per-flag output is all-deterministic arithmetic: max is
    * fold-order-exact, /2 is one IEEE op. PlanSpec pins the salted
    * shuffle join (no broadcast, __salt in the join keys). */
  private val q129 = Q(
    "q129_salted_skew_join",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
      val dim = li.groupBy(col("l_returnflag"))
        .agg(max(col("l_extendedprice")).as("flag_max"))
        .hint("shuffle_hash")
      graft.operators.Skew.saltedEquiJoin(
          li, dim, "l_returnflag", "l_returnflag",
          saltSource = col("l_orderkey") * 100 + col("l_linenumber"),
          buckets = 16)
        .filter(col("l_extendedprice") > col("flag_max") / 2)
        .groupBy(col("l_returnflag"), col("flag_max"))
        .agg(count(lit(1)).as("n_above"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH d AS (SELECT l_returnflag, max(l_extendedprice) AS flag_max
        FROM lineitem GROUP BY l_returnflag)
      SELECT l.l_returnflag, d.flag_max, CAST(count(*) AS BIGINT) AS n_above
      FROM lineitem l JOIN d ON l.l_returnflag = d.l_returnflag
      WHERE l.l_extendedprice > d.flag_max / 2
      GROUP BY l.l_returnflag, d.flag_max
      ORDER BY l.l_returnflag"""))

  /** Per-dataset memo of the paged-JSON rendering of `orders` — the
    * fixture materialized ONCE into the reference's page-per-file layout
    * (`page-<n>.json` JSON-lines + `meta.json` manifest,
    * SyncCustomers.php:57-83) so the DSv2 source can be graded end-to-end
    * against real files. Page n holds exactly the o_orderkey values with
    * floor(key/50) == n — q24's page function — so the V2 `page` column
    * agrees with q24's derived one and the same oracle applies. Only the
    * FIXED page window 0-9 (keys < 500) is materialized — the graded
    * range (2-5) plus pruned neighbors on both sides — so the driver-side
    * fixture write stays O(1) in corpus size at any SF (a production
    * deployment's page layout/REST API already exists; nothing here is
    * part of the graded scan plan). */
  private val pagedOrdersDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def pagedOrdersDir(s: SparkSession, dir: String): String =
    pagedOrdersDirs.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-q131-pages").toString
      val keys = Tables(s, dir).orders.select(col("o_orderkey"))
        .filter(col("o_orderkey") < 500L)
      // ONE partitioned JSON write renders every page file (the q142
      // device): partitionBy drops the pg column from the record bodies,
      // so each pg=N dir holds exactly page N's {"o_orderkey":k} lines.
      // Driver-side work is O(pages) renames + a 1-row aggregate collect
      // — never a collect of the page DATA (the r9 version collected all
      // keys and wrote files in a driver loop; bounded here, but the
      // pattern must not be the template).
      val tmp = java.nio.file.Files.createTempDirectory("graft-q131-part").toString
      keys.withColumn("pg", floor(col("o_orderkey") / 50).cast("int"))
        .coalesce(1).write.partitionBy("pg").mode("overwrite").json(tmp)
      val pgRe = "pg=(\\d+)".r
      val pageDirs = Option(new java.io.File(tmp).listFiles)
        .getOrElse(Array.empty).flatMap(d => d.getName match {
          case pgRe(n) => Some(n.toInt -> d)
          case _ => None
        })
      pageDirs.foreach { case (p, d) =>
        val part = Option(d.listFiles).getOrElse(Array.empty)
          .find(_.getName.endsWith(".json"))
          .getOrElse(throw new IllegalStateException(s"no json part for page $p"))
        java.nio.file.Files.move(
          part.toPath, java.nio.file.Paths.get(s"$out/page-$p.json"))
      }
      val total = keys.count()
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/meta.json"),
        s"""{"pagination":{"total_count":$total,"total_pages":${pageDirs.length}}}"""
          .getBytes("UTF-8"))
      out
    })

  /** q24's page-range scan re-expressed THROUGH the DSv2 paged source
    * (sources.v2.PagedJsonSource, format "graft-pages"): the
    * `page BETWEEN 2 AND 5` predicate is pushed into the scan builder
    * (SupportsPushDownFilters on the synthetic page column), so pruned
    * pages are never opened — partition-per-page planning, the
    * reference's `--startPage/--stopPage` (F4, SyncTickets.php:162-189)
    * done at PLANNING time. Same aggregate and SAME ORACLE as q24 (the
    * paged layout is a faithful re-rendering of `orders`); PlanSpec
    * additionally pins that the executed scan lists exactly pages 2-5. */
  private val q131 = Q(
    "q131_v2_page_scan",
    (s, dir) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "o_orderkey", org.apache.spark.sql.types.LongType)))
      s.read.format("graft-pages").schema(schema)
        .load(pagedOrdersDir(s, dir))
        .filter(col("page").between(2, 5))
        .groupBy(col("page").cast("long").as("page"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("page"))
    },
    Some("""SELECT CAST(floor(o_orderkey / 50) AS BIGINT) AS page, count(*) AS n,
      min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM orders WHERE CAST(floor(o_orderkey / 50) AS BIGINT) BETWEEN 2 AND 5
      GROUP BY 1 ORDER BY page"""))

  /** q131's scan through the source's LIVE-HTTP backend — the reference's
    * actual modality (paginated REST, SyncCustomers.php:57-83) graded in
    * CORRECTNESS, not just spec'd: the same page fixture is served by a
    * loopback HTTP server started inside the query body, the scan plans
    * from the remote manifest (count-first A1), fetches page bodies over
    * the wire, and the pushed page-range means pruned pages are NEVER
    * REQUESTED (require()-asserted against the server's request log —
    * planning-time pruning observed at the network layer, the strongest
    * form of the F4 claim). HTTP page numbering is 1-based request order
    * (listPages maps the manifest count to page-1..page-N), so the pushed
    * range is [3,6] and the output re-derives q24's 0-based key page from
    * the data — SAME ORACLE as q131. The result is eagerly materialized
    * (localCheckpoint) before the server stops, so the returned frame is
    * wire-independent. */
  private val q156 = Q(
    "q156_v2_page_scan_live_http",
    (s, dir) => {
      import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
      val fixture = pagedOrdersDir(s, dir)
      val filePages = Option(new java.io.File(fixture).listFiles)
        .getOrElse(Array.empty).map(_.getName)
        .flatMap { n => "page-(\\d+)\\.json".r.findFirstMatchIn(n).map(_.group(1).toInt) }
        .sorted
      require(filePages.toSeq == (0 until filePages.length),
        s"q156 needs a dense 0..N-1 page fixture, got ${filePages.toSeq}")
      val requested = java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
      val server = HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/api", new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val p = ex.getRequestURI.getPath
          requested.add(p)
          val re = ".*page-(\\d+)\\.json".r
          val f = p match {
            // http page n (1-based request order) serves file page n-1
            case re(n) => new java.io.File(fixture, s"page-${n.toInt - 1}.json")
            case _ => new java.io.File(fixture, "meta.json")
          }
          if (f.exists()) {
            val bytes = java.nio.file.Files.readAllBytes(f.toPath)
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
          } else ex.sendResponseHeaders(404, -1)
          ex.close()
        }
      })
      server.start()
      try {
        val base = s"http://127.0.0.1:${server.getAddress.getPort}/api"
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "o_orderkey", org.apache.spark.sql.types.LongType)))
        val res = s.read.format("graft-pages").schema(schema).load(base)
          .filter(col("page").between(3, 6)) // http 3..6 == key pages 2..5
          .groupBy(floor(col("o_orderkey") / 50).cast("long").as("page"))
          .agg(count(lit(1)).as("n"),
            min(col("o_orderkey")).as("min_key"),
            max(col("o_orderkey")).as("max_key"))
          .orderBy(col("page"))
          .localCheckpoint(true)
        val pagesHit = scala.jdk.CollectionConverters
          .ListHasAsScala(requested).asScala.filter(_.contains("page-")).toSeq
        require(pagesHit.nonEmpty && pagesHit.forall(p =>
            (3 to 6).exists(n => p.endsWith(s"page-$n.json"))),
          s"pruned pages were requested over the wire: $pagesHit")
        res
      } finally server.stop(0)
    },
    Some("""SELECT CAST(floor(o_orderkey / 50) AS BIGINT) AS page, count(*) AS n,
      min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM orders WHERE CAST(floor(o_orderkey / 50) AS BIGINT) BETWEEN 2 AND 5
      GROUP BY 1 ORDER BY page"""))

  /** COMPLETE COUNT(*) pushdown into the DSv2 paged source: the
    * reference's count-first planning call (A1, SyncCustomers.php:44-49)
    * promoted from a statistics estimate to the ANSWER — the scan
    * builder implements SupportsPushDownAggregates, a bare COUNT(*)
    * over the unpruned table builds a one-row manifest-count scan, and
    * ZERO pages are listed, opened, or fetched (SinkSourceSpec proves
    * the no-requests claim over live HTTP; page-pruned or grouped
    * counts refuse and scan normally). The body require()s the pushed
    * scan shape off the executed plan. At 100 TB-of-API this is the
    * difference between one meta round-trip and paging the entire
    * remote corpus to count it. */
  private val q217 = Q(
    "q217_count_pushdown",
    (s, dir) => {
      val pages = pagedOrdersDir(s, dir)
      val schema = StructType(Seq(StructField("o_orderkey", LongType)))
      s.read.format("graft-pages").schema(schema).load(pages)
        .createOrReplaceTempView("graft_pages_q217")
      val out = s.sql("SELECT count(*) AS n_rows FROM graft_pages_q217")
      val p = out.queryExecution.executedPlan.toString
      require(p.contains("from manifest"),
        s"COUNT(*) was not pushed into the paged scan:\n${p.take(1200)}")
      out
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows
      FROM orders WHERE o_orderkey < 500"""))

  /** Per-dataset memo of the FIXED-page-size rendering of `orders` —
    * q131's layout with the reference API's actual invariant added: rows
    * are chunked in request order into pages of exactly `per_page` (the
    * reference pins per_page=50/10 on every list call,
    * SyncCustomers.php:60, SyncTickets.php:172), numbered 1..P, with the
    * manifest carrying per_page — the shape that licenses exact pruned
    * COUNT apportionment with zero page fetches. Page size 23 is chosen
    * to not divide the row count, so the short-last-page correction is
    * genuinely exercised. Fixture-side only (same O(1)-in-corpus caveat
    * as pagedOrdersDir). Memo value: (dir, total rows). */
  private val pagedOrdersFixedDirs =
    scala.collection.concurrent.TrieMap.empty[String, (String, Long)]
  private val FixedPageSize = 23
  private def pagedOrdersFixedDir(
      s: SparkSession, dir: String): (String, Long) =
    pagedOrdersFixedDirs.getOrElseUpdate(dir, {
      val out = java.nio.file.Files.createTempDirectory("graft-q226-pages").toString
      val keys = Tables(s, dir).orders.select(col("o_orderkey"))
        .filter(col("o_orderkey") < 500L)
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("o_orderkey"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-q226-part").toString
      keys.withColumn("pg",
          (floor((row_number().over(w) - 1) / FixedPageSize) + 1).cast("int"))
        .coalesce(1).write.partitionBy("pg").mode("overwrite").json(tmp)
      val pgRe = "pg=(\\d+)".r
      val pageDirs = Option(new java.io.File(tmp).listFiles)
        .getOrElse(Array.empty).flatMap(d => d.getName match {
          case pgRe(n) => Some(n.toInt -> d)
          case _ => None
        })
      pageDirs.foreach { case (p, d) =>
        val part = Option(d.listFiles).getOrElse(Array.empty)
          .find(_.getName.endsWith(".json"))
          .getOrElse(throw new IllegalStateException(s"no json part for page $p"))
        java.nio.file.Files.move(
          part.toPath, java.nio.file.Paths.get(s"$out/page-$p.json"))
      }
      val total = keys.count()
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/meta.json"),
        s"""{"pagination":{"total_count":$total,"total_pages":${pageDirs.length},"per_page":$FixedPageSize}}"""
          .getBytes("UTF-8"))
      (out, total)
    })

  /** PAGE-PRUNED COUNT answered from the manifest alone — q217's
    * pushdown extended to the `--startPage/--stopPage` shape
    * ([[graft.sources.v2.PagedJson.apportionedCount]]): under the
    * fixed-page-size layout a pruned `[start, stop]` count is exactly
    * `full_pages·per_page + short-last-page rows`, computable from
    * total_count/total_pages/per_page with ZERO page fetches. Graded
    * over LIVE HTTP with the pruned range including the short last page
    * (the correction term is exercised, not just the easy full-pages
    * product), and the no-fetch claim require()d against the server's
    * request log — meta.json may be requested, page bodies never. At
    * 100 TB-of-API: one meta round-trip instead of paging the pruned
    * remainder of the corpus to count it. */
  private val q226 = Q(
    "q226_count_pushdown_pruned",
    (s, dir) => {
      import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
      val (fixture, _) = pagedOrdersFixedDir(s, dir)
      val requested = java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
      val server = HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/api", new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val p = ex.getRequestURI.getPath
          requested.add(p)
          val f = new java.io.File(fixture, p.split("/").last)
          if (f.exists()) {
            val bytes = java.nio.file.Files.readAllBytes(f.toPath)
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
          } else ex.sendResponseHeaders(404, -1)
          ex.close()
        }
      })
      server.start()
      try {
        val base = s"http://127.0.0.1:${server.getAddress.getPort}/api"
        val schema = StructType(Seq(StructField("o_orderkey", LongType)))
        s.read.format("graft-pages").schema(schema).load(base)
          .createOrReplaceTempView("graft_pages_q226")
        // pages >= 2: drops exactly one full first page, keeps the short
        // last page inside the range — the apportionment's both terms
        val q = s.sql(
          "SELECT count(*) AS n_rows FROM graft_pages_q226 WHERE page >= 2")
        val p = q.queryExecution.executedPlan.toString
        require(p.contains("from manifest"),
          s"pruned COUNT was not answered by the manifest:\n${p.take(1200)}")
        // eager materialization so the returned frame is wire-independent
        // (the plan pin above reads the PRE-checkpoint plan — a
        // localCheckpoint replaces it with a LogicalRDD)
        val out = q.localCheckpoint(true)
        val pagesHit = scala.jdk.CollectionConverters
          .ListHasAsScala(requested).asScala.filter(_.contains("page-")).toSeq
        require(pagesHit.isEmpty,
          s"a manifest-answered count fetched pages: $pagesHit")
        out
      } finally server.stop(0)
    },
    Some(s"""SELECT CAST(CASE WHEN count(*) > 23 THEN count(*) - 23
        ELSE 0 END AS BIGINT) AS n_rows
      FROM orders WHERE o_orderkey < 500"""))

  /** Per-dataset memo of the bucketed fact tables (lineitem/orders
    * bucketed + sorted on their join keys): a deployment buckets at
    * ingest ONCE and every later join rides the layout, so the graded
    * query must not re-write the tables per bench rep. Table names are
    * dir-scoped to keep multiple SF dirs in one session distinct.
    *
    * The memo stores catalog table NAMES, which are only meaningful in a
    * catalog that actually holds them — a fresh SparkSession in the same
    * JVM (new test suite, bench re-entry) starts with an empty in-memory
    * catalog, so every hit is re-validated with `catalog.tableExists`
    * and re-materialized on a miss instead of failing table-not-found.
    * Bucket count rides [[graft.GraftSession.defaultBuckets]] (rows +
    * parallelism), not a constant: at the fixture SFs the cores term
    * binds, at 100 TB the rows term takes over.
    *
    * ONE implementation for both graded pairs (q158 same-count, q160
    * epoch-drifted) — the tableExists/remove/rebuild revalidation is
    * subtle enough that two copies would silently diverge.
    * `ordBucketDivisor` = 1 keeps the co-joined family on ONE derived
    * count (largest member sets it; mismatched counts would re-shuffle
    * a side), 2 models the earlier-epoch layout q160 grades. */
  private def memoBucketedPair(
      memo: scala.collection.concurrent.TrieMap[String, (String, String)],
      s: org.apache.spark.sql.SparkSession, dir: String, qTag: String,
      ordCol: String, ordBucketDivisor: Int): (String, String) = {
    def build(): (String, String) = {
      val tag = Integer.toHexString(dir.hashCode)
      val base = java.nio.file.Files
        .createTempDirectory(s"graft-$qTag-buckets").toString
      val t = Tables(s, dir)
      val (li, ord) = (s"graft_${qTag}_li_$tag", s"graft_${qTag}_ord_$tag")
      val buckets = graft.sources.Bucketing.derivedBuckets(
        t.lineitem, clusterCores = s.sparkContext.defaultParallelism)
      graft.sources.Bucketing.writeBucketed(
        t.lineitem.select(col("l_orderkey"), col("l_extendedprice")),
        li, "l_orderkey", buckets, s"$base/li")
      graft.sources.Bucketing.writeBucketed(
        t.orders.select(col("o_orderkey"), col(ordCol)),
        ord, "o_orderkey", buckets / ordBucketDivisor, s"$base/ord")
      (li, ord)
    }
    val (li, ord) = memo.getOrElseUpdate(dir, build())
    if (s.catalog.tableExists(li) && s.catalog.tableExists(ord)) (li, ord)
    else {
      memo.remove(dir)
      memo.getOrElseUpdate(dir, build())
    }
  }

  private val bucketedTabs =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def bucketedOrdersLineitem(
      s: org.apache.spark.sql.SparkSession, dir: String): (String, String) =
    memoBucketedPair(bucketedTabs, s, dir, "q158", "o_orderdate",
      ordBucketDivisor = 1)

  /** The bucketed co-located join GRADED (sources.Bucketing, spec-only
    * through r9): lineitem ⋈ orders with both sides bucketed + sorted on
    * the join key — the 100 TB big-big join shape where the per-query
    * exchange is amortized into the ingest-time layout. The body
    * require()s the executed join subplan carries ZERO Exchange and is
    * bucket-aware, with broadcast disabled so the claim is about
    * co-location, not about the dimension fitting in memory (at sf
    * fixtures Spark would otherwise broadcast). Revenue-by-year
    * aggregate on top; plain-SQL oracle.
    *
    * CONTRACT: the set/restore of `autoBroadcastJoinThreshold` mutates
    * SESSION state — safe because the harness runs registered queries
    * sequentially on one session (Verify/Bench/specs all do) and the
    * restore is in `finally`; a concurrent runner sharing the session
    * would race the conf and must clone the session first
    * (`spark.newSession()` confs are per-session). */
  private val q158 = Q(
    "q158_bucketed_join",
    (s, dir) => {
      val (li, ord) = bucketedOrdersLineitem(s, dir)
      val old = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val j = graft.sources.Bucketing.bucketedJoin(
          s, li, ord, "l_orderkey", "o_orderkey")
        val p = j.queryExecution.executedPlan.toString
        require(!p.contains("Exchange"),
          s"bucketed join planned a shuffle:\n${p.take(1200)}")
        require(p.contains("Bucketed: true"), "scan is not bucket-aware")
        j.groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy(col("o_year"))
          // materialize under the no-broadcast conf so the executed join
          // matches the asserted plan (the conf is restored in finally)
          .localCheckpoint(true)
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        round(sum(l_extendedprice), 2) AS revenue,
        CAST(count(*) AS BIGINT) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY o_year"""))

  /** Per-dataset memo of the EPOCH-DRIFTED bucketed pair for q160:
    * lineitem at the currently-derived bucket count, orders at HALF of
    * it — the layout a real deployment accumulates when a table family
    * is re-bucketed as the corpus doubles. Rides [[memoBucketedPair]]. */
  private val bucketedDriftTabs =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def bucketedDriftTables(
      s: org.apache.spark.sql.SparkSession, dir: String): (String, String) =
    memoBucketedPair(bucketedDriftTabs, s, dir, "q160", "o_orderpriority",
      ordBucketDivisor = 2)

  /** The bucket-count DIVISIBILITY claim of
    * [[graft.GraftSession.defaultBuckets]] graded: that derivation
    * rounds to powers of two precisely so tables bucketed at different
    * EPOCHS (the corpus doubled, the count doubled) stay mutually
    * divisible — and `spark.sql.bucketing.coalesceBucketsInJoin` can
    * then co-locate a 2ⁿ ⋈ 2ⁿ⁻¹ join by reading the wider side's bucket
    * pairs together, with NO Exchange on either side (without it, the
    * mismatched counts would re-shuffle a side and the ingest-time
    * layout would be worthless across epochs). The body require()s zero
    * Exchange in the executed plan with broadcast disabled; a sort on
    * the coalesced side is expected and allowed (two sorted buckets read
    * as one partition are merely locally unsorted — cheap, no network).
    * Same sequential-session conf contract as q158. */
  private val q160 = Q(
    "q160_bucket_coalesced_join",
    (s, dir) => {
      val (li, ord) = bucketedDriftTables(s, dir)
      val oldB = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val oldC = s.conf.get("spark.sql.bucketing.coalesceBucketsInJoin.enabled")
      try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
        val j = graft.sources.Bucketing.bucketedJoin(
          s, li, ord, "l_orderkey", "o_orderkey")
        val p = j.queryExecution.executedPlan.toString
        require(!p.contains("Exchange"),
          s"epoch-drifted bucketed join planned a shuffle:\n${p.take(1200)}")
        require(p.contains("Coalesced"),
          s"wider side was not bucket-coalesced:\n${p.take(1200)}")
        j.groupBy(col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
          .localCheckpoint(true)
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldB)
        s.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", oldC)
      }
    },
    Some("""SELECT o_orderpriority,
        round(sum(l_extendedprice), 2) AS revenue,
        CAST(count(*) AS BIGINT) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY o_orderpriority"""))

  /** Runtime Bloom-filter join pruning (Catalyst's InjectRuntimeFilter)
    * — the third leg of the engine's big-join story: q129 salts skew,
    * q158/q160 amortize the shuffle into ingest-time layout, and this
    * one handles the SELECTIVE-DIMENSION case where neither applies —
    * a fact ⋈ filtered-dim join where the dim predicate can't reach the
    * fact scan as a static pushdown. Spark builds a Bloom filter from
    * the filtered creation side at runtime and injects
    * `bloom_filter_might_contain` into the fact side's scan stage, so
    * most fact rows die BEFORE the shuffle instead of after it — at
    * 100 TB that's the difference between shuffling the full fact table
    * and shuffling the ~matching fraction (one-sided: false positives
    * only, the join stays exact, which is why the oracle is plain SQL).
    * The body lowers the application-side threshold (sized for real
    * clusters, fixture scans are far below it) and require()s the
    * injected predicate in the executed plan; same sequential-session
    * conf contract as q158. */
  private val q163 = Q(
    "q163_runtime_bloom_join",
    (s, dir) => {
      val keys = Seq(
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold")
      val old = keys.map(k => k -> s.conf.get(k))
      try {
        s.conf.set(keys(0), "true")
        s.conf.set(keys(1), "0") // fixture scans sit far below the 10GB default
        s.conf.set(keys(2), "-1") // SMJ: the shuffle the filter exists to starve
        val t = Tables(s, dir)
        val dim = t.orders
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderdate"))
        val res = t.lineitem
          .select(col("l_orderkey"), col("l_extendedprice"))
          .join(dim, col("l_orderkey") === col("o_orderkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy(col("o_year"))
        val p = res.queryExecution.executedPlan.toString
        require(p.contains("might_contain"),
          s"runtime bloom filter was not injected:\n${p.take(1200)}")
        // materialize under the conf so the executed plan is the
        // asserted one (restored in finally)
        res.localCheckpoint(true)
      } finally old.foreach { case (k, v) => s.conf.set(k, v) }
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        round(sum(l_extendedprice), 2) AS revenue,
        CAST(count(*) AS BIGINT) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1 ORDER BY o_year"""))

  /** Per-dataset memo of the YEAR-PARTITIONED lineitem layout for q164 —
    * the hive-partitioned fact shape every 100 TB warehouse stores its
    * event data in (our flat fixture parquet can't exhibit partition
    * pruning, so the layout is materialized once per dataset). */
  private val dppFactDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def yearPartitionedLineitem(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val path = dppFactDirs.getOrElseUpdate(dir, {
      val base = java.nio.file.Files
        .createTempDirectory("graft-q164-fact").toString
      Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_extendedprice"),
          year(col("l_shipdate")).as("l_year"))
        .write.partitionBy("l_year").mode("overwrite").parquet(base)
      base
    })
    if (new java.io.File(path).isDirectory) path
    else { dppFactDirs.remove(dir); yearPartitionedLineitem(s, dir) }
  }

  /** Dynamic partition pruning graded — the scan-side sibling of q163's
    * runtime Bloom filter: when the fact table is PARTITIONED on the
    * join column and the dim side's qualifying keys only exist at
    * runtime (here: order-years with above-median order counts, a
    * predicate over an aggregate no static optimizer can fold), Catalyst
    * injects a `dynamicpruning` subquery into the fact scan's
    * PartitionFilters — whole partitions are never listed, opened, or
    * read. At 100 TB this is the difference between scanning every
    * date partition and scanning the qualifying ones; the body
    * require()s the injected filter in the executed plan. The median
    * threshold is computed driver-side (a 1-row scalar over a
    * years-count frame — model-sized, like every sanctioned collect),
    * and the dim aggregate itself is what makes the pruning dynamic.
    * Oracle re-derives the median gate and the join in plain SQL. */
  private val q164 = Q(
    "q164_dynamic_partition_pruning",
    (s, dir) => {
      val fact = s.read.parquet(yearPartitionedLineitem(s, dir))
      val dim0 = Tables(s, dir).orders
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(count(lit(1)).as("c"))
      val med = dim0.agg(percentile(col("c"), lit(0.5))).head().getDouble(0)
      val dim = dim0.filter(col("c") > med).select(col("o_year"))
      val res = fact
        .join(dim, col("l_year") === col("o_year"))
        .groupBy(col("l_year").cast("int").as("l_year"))
        .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("l_year"))
      val p = res.queryExecution.executedPlan.toString
      require(p.contains("dynamicpruning"),
        s"partition filter was not dynamically injected:\n${p.take(1200)}")
      res
    },
    Some("""WITH d AS (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
          count(*) AS c FROM orders GROUP BY 1),
      m AS (SELECT median(c) AS med FROM d),
      k AS (SELECT o_year FROM d, m WHERE c > med)
      SELECT CAST(year(l_shipdate) AS INT) AS l_year,
        round(sum(l_extendedprice), 2) AS revenue,
        CAST(count(*) AS BIGINT) AS n
      FROM lineitem JOIN k ON CAST(year(l_shipdate) AS INT) = k.o_year
      GROUP BY 1 ORDER BY l_year"""))

  /** AQE skew-join split graded — the runtime counterpart of q129's
    * manual salting: the fact side's join key is folded so ~95% of rows
    * land on one hot key (-1, absent from the fixture's real keys), and
    * Spark's OptimizeSkewedJoin splits the oversized shuffle partition
    * into advisory-sized chunks at runtime, duplicating the dim side's
    * matching partition — same effect as salting, zero query rewrite.
    * The body sizes the skew thresholds to the fixture (the defaults
    * are cluster-scaled: 256 MB advisory, median×5 factor) and
    * require()s BOTH markers in the executed final plan:
    * `SortMergeJoin(skew=true)` and a `skewed` AQEShuffleRead. Two
    * constraints found while probing, both real scale facts:
    *  - map-output sizes are COMPRESSED, so a constant synthetic hot
    *    key with a compressible payload never crosses the threshold —
    *    the fact side ships l_extendedprice (incompressible doubles);
    *  - the split unit is an UPSTREAM MAP OUTPUT: AQE divides a skewed
    *    partition into groups of mapper blocks, so a hot partition fed
    *    by ONE mapper is unsplittable and the rule skips it silently.
    *    A 100 TB fact scan has thousands of mappers; the fixture's
    *    single parquet file has one, so the fact side is
    *    repartition(8)'d to restore the real mapper fan-in (this also
    *    documents the production caveat: AQE cannot fix skew that a
    *    single upstream task produces — that case still needs q129's
    *    salting).
    * The split is correctness-neutral (the dim partition is replicated
    * per chunk), so the oracle is plain SQL. */
  private val q165 = Q(
    "q165_aqe_skew_join",
    (s, dir) => {
      val keys = Seq(
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold")
      val old = keys.map(k => k -> s.conf.get(k))
      try {
        s.conf.set(keys(0), "true")
        s.conf.set(keys(1), "16KB") // fixture-scale; default 256MB is cluster-sized
        s.conf.set(keys(2), "16KB")
        s.conf.set(keys(3), "-1")
        val t = Tables(s, dir)
        val fact = t.lineitem.repartition(8).select(
          when(col("l_orderkey") % lit(20) =!= lit(0), lit(-1L))
            .otherwise(col("l_orderkey")).as("k"),
          col("l_extendedprice"))
        val dim = t.orders
          .filter(col("o_orderkey") % lit(20) === lit(0))
          .select(col("o_orderkey").as("k"), col("o_orderpriority"))
          .unionByName(s.range(1).select(
            lit(-1L).as("k"), lit("HOT").as("o_orderpriority")))
        val res = fact.join(dim, Seq("k"))
          .groupBy(col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
        // AQE finalizes the plan only when THIS queryExecution runs
        // (localCheckpoint spawns its own execution and would leave
        // res's adaptive plan un-finalized) — collect the priority-count
        // result (≤7 rows) and assert on the final plan
        val rows = res.collect()
        val p = res.queryExecution.executedPlan.toString
        require(p.contains("skew=true"),
          s"AQE did not mark the join skewed:\n${p.take(1200)}")
        require(p.contains("skewed"),
          s"no skewed AQEShuffleRead in the final plan:\n${p.take(1200)}")
        s.createDataFrame(java.util.Arrays.asList(rows: _*), res.schema)
      } finally old.foreach { case (k, v) => s.conf.set(k, v) }
    },
    Some("""WITH f AS (SELECT CASE WHEN l_orderkey % 20 <> 0 THEN -1
            ELSE l_orderkey END AS k, l_extendedprice FROM lineitem),
      d AS (SELECT o_orderkey AS k, o_orderpriority FROM orders
            WHERE o_orderkey % 20 = 0
            UNION ALL SELECT -1, 'HOT')
      SELECT o_orderpriority,
        round(sum(l_extendedprice), 2) AS revenue,
        CAST(count(*) AS BIGINT) AS n
      FROM f JOIN d ON f.k = d.k
      GROUP BY 1 ORDER BY o_orderpriority"""))

  /** AQE runtime join re-planning graded — the fourth adaptive device
    * (after coalescing, the q165 skew split, and the q164/q163 runtime
    * filters): a fact ⋈ filtered-dim join whose dim-side FILTER is
    * hash-gated, so the static optimizer cannot estimate its
    * selectivity and plans a shuffle join — then the materialized
    * runtime size reveals the filtered dim is broadcast-small and AQE
    * rewrites the running query to a BroadcastHashJoin, eliminating
    * the fact side's shuffle mid-flight. At 100 TB this is the common
    * "dim is huge pre-filter, tiny post-filter" shape where no amount
    * of static planning can pick the right join. The fixture models the
    * estimate gap with the two SEPARATE thresholds Spark has for
    * exactly this split: the static `autoBroadcastJoinThreshold` is
    * dropped below the dim's scan size (so the initial plan is the SMJ
    * a big dim gets), the `adaptive.autoBroadcastJoinThreshold` stays
    * above the filtered size (so the runtime rewrite can fire). The
    * body require()s BOTH halves off the finalized adaptive plan:
    * SortMergeJoin in the initial plan, BroadcastHashJoin in the final
    * plan. Join is exact either way; plain-SQL oracle. */
  private val q166 = Q(
    "q166_aqe_join_replan",
    (s, dir) => {
      val keys = Seq(
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold")
      // getOption: the adaptive threshold is UNSET by default (null) —
      // a get/set round-trip would throw on restore
      val old = keys.map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set(keys(0), "1KB")
        s.conf.set(keys(1), "4MB")
        val t = Tables(s, dir)
        val dim = t.orders
          .filter(pmod(xxhash64(col("o_orderkey")), lit(50)) === lit(0))
          .select(col("o_orderkey"), col("o_orderpriority"))
        val res = t.lineitem
          .select(col("l_orderkey"), col("l_extendedprice"))
          .join(dim, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
        val rows = res.collect() // finalize the adaptive plan
        val p = res.queryExecution.executedPlan.toString
        val parts = p.split("== Initial Plan ==")
        require(parts.length == 2 && parts(1).contains("SortMergeJoin"),
          s"static plan was not the shuffle join:\n${p.take(1200)}")
        require(parts(0).contains("BroadcastHashJoin"),
          s"AQE did not re-plan to broadcast at runtime:\n${p.take(1200)}")
        s.createDataFrame(java.util.Arrays.asList(rows: _*), res.schema)
      } finally old.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    },
    Some {
      // the hash gate re-derived with the closed-formula XXH64 device
      // (q75/q134's idiom): signed pmod of XXH64(o_orderkey, 42) by 50
      import TextQueries.XxhashSqlGen._
      val base = "base AS (SELECT o_orderkey, o_orderpriority, " +
        s"CASE WHEN o_orderkey < 0 THEN o_orderkey + $big " +
        "ELSE CAST(o_orderkey AS HUGEINT) END AS v FROM orders)"
      val (c1, last1) = stages("q", "v", "42::HUGEINT", "base")
      (Seq(base) ++ c1).mkString("WITH ", ",\n", ",\n") + s"""
      d AS (SELECT o_orderkey, o_orderpriority FROM $last1
        WHERE ((CASE WHEN hq >= 9223372036854775808::HUGEINT
                THEN hq - $big ELSE hq END) % 50 + 50) % 50 = 0)
      SELECT o_orderpriority,
        round(sum(l_extendedprice), 2) AS revenue,
        CAST(count(*) AS BIGINT) AS n
      FROM lineitem JOIN d ON l_orderkey = d.o_orderkey
      GROUP BY 1 ORDER BY o_orderpriority"""
    })

  /** Key-sharded JSON fixture pair for q168, one write per dataset dir
    * (fact + dim `partitionBy(shard)` layouts under a temp base); the
    * memo revalidates the directories still exist — the q158 catalog
    * idiom applied to a filesystem fixture. Shard count rides the same
    * [[graft.sources.Bucketing.derivedBuckets]] derivation as the
    * bucketed-join family: one count for the co-joined pair. */
  private val keyedDirs =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def keyedJsonPair(
      s: org.apache.spark.sql.SparkSession, dir: String): (String, String) = {
    def build(): (String, String) = {
      val base = java.nio.file.Files
        .createTempDirectory("graft-q168-keyed").toString
      val t = Tables(s, dir)
      val shards = graft.sources.Bucketing.derivedBuckets(
        t.lineitem, clusterCores = s.sparkContext.defaultParallelism).toLong
      t.lineitem.select(col("l_orderkey"), col("l_extendedprice"),
          pmod(xxhash64(col("l_orderkey")), lit(shards)).cast("int").as("shard"))
        .write.partitionBy("shard").json(s"$base/fact")
      t.orders.select(col("o_orderkey"), col("o_orderpriority"),
          pmod(xxhash64(col("o_orderkey")), lit(shards)).cast("int").as("shard"))
        .write.partitionBy("shard").json(s"$base/dim")
      (s"$base/fact", s"$base/dim")
    }
    val (f, d) = keyedDirs.getOrElseUpdate(dir, build())
    if (new java.io.File(f).isDirectory && new java.io.File(d).isDirectory)
      (f, d)
    else { keyedDirs.remove(dir); keyedDirs.getOrElseUpdate(dir, build()) }
  }

  /** Storage-partitioned join (SPARK-37375) graded — the CONNECTOR leg of
    * the co-location story: q158/q160 prove shuffle-free big-big joins
    * through Hive bucketing (catalog tables); this proves the same claim
    * for a path-based DataSource V2 source with NO metastore — the
    * engine's `graft-keyed` source reports `KeyGroupedPartitioning` over
    * `identity(shard)` (sources/v2/KeyedJsonSource) and each shard
    * directory carries its key via `HasPartitionKey`, so Catalyst aligns
    * the two sides' partitions at planning time and the fact ⋈ dim join
    * runs with ZERO Exchange. This is the Iceberg-era layout contract at
    * 100 TB: co-location travels with the data layout, not with a
    * catalog registration. Three confs gate it, set/restored in-body
    * (q158's sequential-session contract): `v2.bucketing.enabled` (off
    * by default), `requireAllClusterKeysForCoPartition=false` (the join
    * keys (shard, key) are a SUPERSET of the partition keys — with the
    * default `true`, partition-keys ⊊ join-keys forces a shuffle), and
    * broadcast disabled so the claim is co-location. The shard id is
    * write-time-materialized pmod(xxhash64(key), S) — shard equality is
    * implied by key equality, so the oracle is the plain key equi-join. */
  private val q168 = Q(
    "q168_storage_partitioned_join",
    (s, dir) => {
      val (factDir, dimDir) = keyedJsonPair(s, dir)
      val keys = Seq(
        "spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.requireAllClusterKeysForCoPartition",
        "spark.sql.autoBroadcastJoinThreshold")
      val old = keys.map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set(keys(0), "true")
        s.conf.set(keys(1), "false")
        s.conf.set(keys(2), "-1")
        val factSchema = StructType(Seq(
          StructField("l_orderkey", LongType),
          StructField("l_extendedprice", DoubleType),
          StructField("shard", IntegerType)))
        val dimSchema = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderpriority", StringType),
          StructField("shard", IntegerType)))
        val fact = s.read.format("graft-keyed").schema(factSchema)
          .option("keycol", "shard").load(factDir)
        val dim = s.read.format("graft-keyed").schema(dimSchema)
          .option("keycol", "shard").load(dimDir)
        val j = fact.join(dim,
          fact("shard") === dim("shard")
            && col("l_orderkey") === col("o_orderkey"))
        val p = j.queryExecution.executedPlan.toString
        require(!p.contains("Exchange"),
          s"storage-partitioned join planned a shuffle:\n${p.take(1200)}")
        require(p.contains("SortMergeJoin"),
          s"expected a co-partitioned SMJ:\n${p.take(1200)}")
        j.groupBy(col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
          // materialize under the SPJ confs so the executed join matches
          // the asserted plan (confs are restored in finally)
          .localCheckpoint(true)
      } finally old.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    },
    Some("""SELECT o_orderpriority,
        round(sum(l_extendedprice), 2) AS revenue,
        CAST(count(*) AS BIGINT) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY o_orderpriority"""))

  /** q168's SPJ with the fixture produced by the CONNECTOR'S OWN WRITER
    * (sources/v2 KeyedJsonWrite) instead of Spark's partitionBy: the
    * write declares `RequiresDistributionAndOrdering(clustered(shard))`,
    * so Spark shuffles ONCE at ingest and every shard directory is
    * written whole under the temp-dir/driver-commit protocol; the read
    * side then reports the layout via KeyGroupedPartitioning and the
    * fact ⋈ dim join runs with ZERO Exchange. This is the lakehouse
    * amortization graded end to end IN ONE CONNECTOR: the ingest
    * exchange is the last shuffle these tables' join keys ever see.
    * Same confs/oracle as q168. */
  private val keyedWrittenDirs =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def keyedWrittenPair(
      s: org.apache.spark.sql.SparkSession, dir: String): (String, String) = {
    def build(): (String, String) = {
      val base = java.nio.file.Files
        .createTempDirectory("graft-q176-keyed").toString
      val t = Tables(s, dir)
      val shards = graft.sources.Bucketing.derivedBuckets(
        t.lineitem, clusterCores = s.sparkContext.defaultParallelism).toLong
      t.lineitem.select(col("l_orderkey"), col("l_extendedprice"),
          pmod(xxhash64(col("l_orderkey")), lit(shards)).cast("int").as("shard"))
        .write.format("graft-keyed").option("keycol", "shard")
        .mode("append").save(s"$base/fact")
      t.orders.select(col("o_orderkey"), col("o_orderpriority"),
          pmod(xxhash64(col("o_orderkey")), lit(shards)).cast("int").as("shard"))
        .write.format("graft-keyed").option("keycol", "shard")
        .mode("append").save(s"$base/dim")
      (s"$base/fact", s"$base/dim")
    }
    val (f, d) = keyedWrittenDirs.getOrElseUpdate(dir, build())
    if (new java.io.File(f).isDirectory && new java.io.File(d).isDirectory)
      (f, d)
    else { keyedWrittenDirs.remove(dir); keyedWrittenDirs.getOrElseUpdate(dir, build()) }
  }

  private val q176 = Q(
    "q176_keyed_write_spj",
    (s, dir) => {
      val (factDir, dimDir) = keyedWrittenPair(s, dir)
      // the writer's commit protocol must leave no temp residue
      for (d <- Seq(factDir, dimDir))
        require(!new java.io.File(d).listFiles().exists(_.getName.startsWith("_tmp")),
          s"uncommitted write residue under $d")
      val keys = Seq(
        "spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.requireAllClusterKeysForCoPartition",
        "spark.sql.autoBroadcastJoinThreshold")
      val old = keys.map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set(keys(0), "true")
        s.conf.set(keys(1), "false")
        s.conf.set(keys(2), "-1")
        val factSchema = StructType(Seq(
          StructField("l_orderkey", LongType),
          StructField("l_extendedprice", DoubleType),
          StructField("shard", IntegerType)))
        val dimSchema = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderpriority", StringType),
          StructField("shard", IntegerType)))
        val fact = s.read.format("graft-keyed").schema(factSchema)
          .option("keycol", "shard").load(factDir)
        val dim = s.read.format("graft-keyed").schema(dimSchema)
          .option("keycol", "shard").load(dimDir)
        val j = fact.join(dim,
          fact("shard") === dim("shard")
            && col("l_orderkey") === col("o_orderkey"))
        val p = j.queryExecution.executedPlan.toString
        require(!p.contains("Exchange"),
          s"writer-produced layout must SPJ shuffle-free:\n${p.take(1200)}")
        j.groupBy(col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
          .localCheckpoint(true)
      } finally old.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    },
    Some("""SELECT o_orderpriority,
        round(sum(l_extendedprice), 2) AS revenue,
        CAST(count(*) AS BIGINT) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY o_orderpriority"""))

  /** GK approximate quantiles over the largest table's price column —
    * q29's exact-percentile surface at the 100 TB operating point: one
    * pass of mergeable summaries instead of per-group value buffering.
    * The oracle is the rank-bound verdict (Sketches.gkQuantiles scaladoc):
    * cuts ride 1:1 from the export, DuckDB counts each cut's exact rank
    * window [count(<cut), count(<=cut)] against lineitem and re-derives
    * `rank_ok` = the window intersects [⌊(p−ε)N⌋, ⌈(p+ε)N⌉] — the
    * Greenwald-Khanna guarantee itself, ε = 0.01. */
  private val q132 = Q(
    "q132_gk_quantiles",
    (s, dir) => Sketches.gkQuantiles(
      Tables(s, dir).lineitem, "l_extendedprice",
      Seq(0.01, 0.25, 0.5, 0.75, 0.99), relErr = 0.01),
    Some("""WITH fx AS (SELECT p, cut
        FROM read_parquet('__VERIFY_OUT__/q132_gk_quantiles/*.parquet')),
      agg AS (SELECT f.p, f.cut,
          sum(CASE WHEN l.l_extendedprice < f.cut THEN 1 ELSE 0 END) AS rank_lo,
          sum(CASE WHEN l.l_extendedprice <= f.cut THEN 1 ELSE 0 END) AS rank_hi,
          count(*) AS n
        FROM fx f CROSS JOIN lineitem l GROUP BY f.p, f.cut)
      SELECT p, cut,
        (rank_hi >= floor((p - 0.01) * n) AND rank_lo <= ceil((p + 0.01) * n)) AS rank_ok
      FROM agg"""))

  /** Per-GROUP GK quantiles — q132's scale path as a grouped aggregate
    * (Spark's `percentile_approx`, a map-side-mergeable GK summary per
    * group): the per-domain length-distribution shape a 100 TB curation
    * report needs, with no per-group value buffering (contrast q29's
    * exact `percentile`). Token counts per language, ε = 1/accuracy =
    * 0.01. Oracle = the q132 rank-bound verdict PER GROUP: cuts ride
    * 1:1, DuckDB re-counts each cut's exact rank window within its
    * language stratum and re-derives `rank_ok` against ±εN_lang. */
  private val q136 = Q(
    "q136_grouped_quantiles",
    (s, dir) => {
      val probs = Seq(0.25, 0.5, 0.75)
      Tables(s, dir).documents
        .select(col("lang"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"))
        .groupBy(col("lang"))
        .agg(percentile_approx(col("n_tokens"),
          array(probs.map(lit): _*), lit(100)).as("cuts"))
        .select(col("lang"), posexplode(col("cuts")).as(Seq("i", "cut")))
        .select(col("lang"),
          element_at(array(probs.map(lit): _*), col("i") + 1).as("p"),
          col("cut"), lit(true).as("rank_ok"))
        .orderBy(col("lang"), col("p"))
    },
    Some("""WITH fx AS (SELECT lang, p, cut
        FROM read_parquet('__VERIFY_OUT__/q136_grouped_quantiles/*.parquet')),
      t AS (SELECT lang, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
        FROM documents),
      agg AS (SELECT f.lang, f.p, f.cut,
          sum(CASE WHEN t.n < f.cut THEN 1 ELSE 0 END) AS rank_lo,
          sum(CASE WHEN t.n <= f.cut THEN 1 ELSE 0 END) AS rank_hi,
          count(*) AS n
        FROM fx f JOIN t ON t.lang = f.lang GROUP BY f.lang, f.p, f.cut)
      SELECT lang, p, cut,
        (rank_hi >= floor((p - 0.01) * n) AND rank_lo <= ceil((p + 0.01) * n)) AS rank_ok
      FROM agg ORDER BY lang, p"""))

  /** Z-order (Morton) clustering key over `(l_partkey, l_suppkey)` —
    * the write-time layout device ([[graft.operators.Layout]]): range-
    * partitioning by this value bounds BOTH key columns per output file,
    * so parquet min/max stats prune two-dimensional filters that a
    * single-column sort only serves for its leading key. Graded on the
    * z-value itself (pure bit algebra — exact cross-engine); the layout
    * mechanics (range exchange, in-partition sort, measured per-file
    * span shrink vs a lexicographic sort) are LayoutSpec's territory.
    * The DuckDB oracle re-interleaves the 21 bit lanes via a
    * generate_series sum — same disjoint-bit addition, exact BIGINT. */
  private val q139 = Q(
    "q139_zorder_key",
    (s, dir) => Tables(s, dir).lineitem
      .filter(col("l_orderkey") < 1000L)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        Layout.zValue(col("l_partkey"), col("l_suppkey")).as("zval"))
      .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
        CAST(sum((((l.l_partkey >> i.i) & 1) << (2 * i.i + 1))
               + (((l.l_suppkey >> i.i) & 1) << (2 * i.i))) AS BIGINT) AS zval
      FROM lineitem l CROSS JOIN generate_series(0, 20) AS i(i)
      WHERE l.l_orderkey < 1000
      GROUP BY 1, 2, 3, 4
      ORDER BY l.l_orderkey, l.l_linenumber"""))

  /** Fuzzy entity matching ([[graft.operators.Dedup.editDistancePairs]]):
    * every customer-name pair within Levenshtein distance 1 — the
    * record-linkage primitive (near-identical names/titles/URLs) as a
    * blocked equi-join, never an all-pairs scan. Blocking = the FastSS
    * ≤1-deletion neighborhood, chosen over positional segments because
    * entity strings share long constant affixes ("Customer#…") that make
    * any segment a single hot block. The oracle BRUTE-FORCES all pairs in
    * DuckDB, so blocking completeness is hash-verified, not assumed
    * (Spark and DuckDB implement the same classic Levenshtein). */
  private val q143 = Q(
    "q143_fuzzy_name_pairs",
    (s, dir) => graft.operators.Dedup.editDistancePairs(
        Tables(s, dir).customer, col("c_name"), col("c_custkey"), k = 1)
      .orderBy(col("id_a"), col("id_b")),
    Some("""SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
      ORDER BY id_a, id_b"""))

  /** The fuzzy join STEERED by the pre-join advisory at its BROADCAST
    * operating point ([[graft.operators.Dedup.editDistancePairsAdvised]]
    * → [[graft.plans.JoinAdvisor.adviseSelf]]): one sketch pass over the
    * supplier-name variant keys sees a dimension-sized frame, advises
    * broadcast, and the operator executes it — the r13 verdict's "the
    * advisory only matters if the engine's own joins consume it" closed
    * in the graded path. The body require()s BOTH halves off the real
    * artifacts: the advice says broadcast AND the executed variant join
    * IS a BroadcastHashJoin (the q158/q160 plan-pin pattern). Results are
    * strategy-independent, so the brute-force oracle grades the steered
    * plan exactly like q143 grades the static one. */
  private val q223 = Q(
    "q223_advised_fuzzy_broadcast",
    (s, dir) => {
      val (advice, pairs) = graft.operators.Dedup.editDistancePairsAdvised(
        Tables(s, dir).supplier, col("s_name"), col("s_suppkey"), k = 1)
      require(advice.strategy == "broadcast",
        s"dimension-sized variant frame must advise broadcast: $advice")
      val res = pairs.orderBy(col("id_a"), col("id_b"))
      val variantJoins = res.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("Join") && l.contains("[v#"))
        .mkString("\n")
      require(variantJoins.contains("BroadcastHashJoin"),
        s"executed variant join must match the advisory:\n$variantJoins")
      res
    },
    Some("""SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
        CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
      FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
      WHERE levenshtein(a.s_name, b.s_name) <= 1
      ORDER BY id_a, id_b"""))

  /** The same steered fuzzy join at its SALT operating point: broadcast
    * disallowed (broadcastMaxRows=0 — past-dimension sides) and the fair
    * share computed for a 100 TB deployment's shuffle width
    * (targetPartitions=200k ≈ scaleDefaults' clusterCores×3 at ~1000
    * executors), where the zero-padded entity names' hot deletion-variant
    * blocks genuinely dominate a reducer — the advisory must pick salt,
    * size the buckets, and the operator must execute the salted join
    * (plan-pinned: the variant join carries the `__salt` key and is NOT
    * a broadcast). maxSaltBuckets=8 keeps the test-scale replication
    * cheap; the SAME brute-force oracle as q143 proves salting moved
    * shuffle placement, never semantics. */
  private val q224 = Q(
    "q224_advised_fuzzy_salted",
    (s, dir) => {
      // maxHotShare lifted (r16): at sf0.1 the variant frame's hot
      // share is a measured 0.009 — 11× under the default demotion
      // ceiling — but at sf0.001 the zero-padded prefixes dominate the
      // tiny corpus (share ~0.26) and the ceiling would demote; this
      // query grades the salted EXECUTION, and the crossover economics
      // are JoinAdvisorSpec's pin
      val (advice, pairs) = graft.operators.Dedup.editDistancePairsAdvised(
        Tables(s, dir).customer, col("c_name"), col("c_custkey"), k = 1,
        broadcastMaxRows = 0L, skewFactor = 1.5, minSaltOutputRows = 100L,
        maxSaltBuckets = 8, targetPartitions = Some(200000),
        maxHotShare = 1.0)
      require(advice.strategy == "salt" && advice.saltBuckets >= 2,
        s"hot variant blocks at 200k-partition fair share must salt: $advice")
      val res = pairs.orderBy(col("id_a"), col("id_b"))
      val variantJoins = res.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("Join") && l.contains("[v#"))
        .mkString("\n")
      require(variantJoins.contains("__salt"),
        s"executed variant join must carry the salt key:\n$variantJoins")
      require(!variantJoins.contains("BroadcastHashJoin"),
        s"salted join must not broadcast a past-dimension side:\n$variantJoins")
      res
    },
    Some("""SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
      ORDER BY id_a, id_b"""))

  /** Snapshot-and-restore for session confs a fixture must set (ADVICE
    * r16: q233/q234 left six aggressive `spark.graft.advisor.*`
    * thresholds on the shared session — any future conf-reading query
    * would inherit them depending on run order). The restore runs in a
    * finally around the BODY; a body that must keep its advised plan
    * through the driver's write-time re-optimization returns
    * `ofRows(optimizedPlan)` (markers already stripped, rewrite already
    * applied, hints ride the logical Joins) so the restored defaults
    * can never re-advise it. */
  private def withSessionConfs[A](s: SparkSession)(kvs: (String, String)*)(
      body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    kvs.foreach { case (k, v) => s.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** The advisory consumed through PLAIN SQL TEXT at its BROADCAST
    * operating point — the r15 verdict's "promote the advisory from
    * hand-wired consumers to a Catalyst rule": a GRAFT_ADVISE hint in
    * the query ([[graft.plans.GraftAdviseHintRule]] →
    * [[graft.plans.AdvisedEquiJoinRewrite]]) routes the orders⋈customer
    * equi-join through the sketch pass, which sees a dimension-sized
    * customer side and executes a BROADCAST hint. Causality is pinned
    * by materializing the plan at autoBroadcastJoinThreshold=-1 (size-
    * based broadcast disabled, restored after the pin): the
    * BroadcastHashJoin in the executed plan can only have come from the
    * rule's verdict. Thresholds are set EXPLICITLY (not defaults) so a
    * sibling query's sticky advisor confs cannot flip the verdict.
    * Results are strategy-independent; the oracle grades the plain
    * aggregate. */
  private val q232 = Q(
    "q232_advised_sql_broadcast",
    (s, dir) => {
      Tables(s, dir).orders.createOrReplaceTempView("graft_orders_q232")
      Tables(s, dir).customer.createOrReplaceTempView("graft_customer_q232")
      withSessionConfs(s)(
        "spark.graft.advisor.broadcastMaxRows" -> "1000000",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val res = s.sql("""
          SELECT /*+ GRAFT_ADVISE */ c_mktsegment,
            CAST(count(*) AS BIGINT) AS n_orders,
            round(sum(o_totalprice), 2) AS revenue
          FROM graft_orders_q232 JOIN graft_customer_q232
            ON o_custkey = c_custkey
          GROUP BY c_mktsegment ORDER BY c_mktsegment""")
        val p = res.queryExecution.executedPlan.toString
        require(p.contains("BroadcastHashJoin"),
          "with size-based broadcast disabled, only the GRAFT_ADVISE " +
            s"verdict can broadcast — it did not:\n${p.take(1200)}")
        // the OPTIMIZED plan rides out (marker stripped, broadcast hint
        // on the logical join): materialization never re-advises, so
        // the restored session defaults cannot flip the graded plan
        org.apache.spark.sql.GraftColumnBridge
          .ofRows(s, res.queryExecution.optimizedPlan)
      }
    },
    Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        round(sum(o_totalprice), 2) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** The SQL-surface advisory at its SALT operating point: a
    * manufactured hot key (every 10th orderkey folds to orderkey 1, so
    * ~10% of lineitem carries one key) under q224's threshold shape —
    * broadcast disallowed, 100 TB-deployment fair share
    * (targetPartitions=200000) — makes
    * [[graft.plans.AdvisedEquiJoinRewrite]] rewrite the join written as
    * PLAIN SQL into the TARGETED-salt union: hot-key rows split off,
    * the left leg salted by xxhash64 over its columns, the right leg
    * replicated buckets×, cold remainder joined plain, shuffle_hash
    * pinned on both legs. Plan-pinned (salt key present, Union present,
    * no broadcast); the oracle re-derives the aggregate from the same
    * fold in DuckDB, proving the rewrite moved shuffle placement, never
    * semantics. The advisor confs are restored in a finally block
    * (they must stay set through the driver's write-time
    * re-optimization of THIS query's plan, so the restore runs in the
    * returned-DataFrame wrapper, not around the sql() call) — a future
    * marker-carrying query must inherit the session DEFAULTS, not this
    * fixture's aggressive thresholds. The body lifts maxHotShare to
    * 1.0 (shipped default 0.1): at the 200k-partition fair share the
    * degenerate corrected estimate marks the WHOLE frame breaching at
    * fixture SFs, and the measured demotion ceiling would correctly
    * route to shuffle+AQE — this query grades the salted EXECUTION;
    * the ceiling's own economics are JoinAdvisorSpec's. */
  private val q233 = Q(
    "q233_advised_sql_salted",
    (s, dir) => {
      Tables(s, dir).lineitem.createOrReplaceTempView("graft_lineitem_q233")
      Tables(s, dir).orders.createOrReplaceTempView("graft_orders_q233")
      withSessionConfs(s)(
        "spark.graft.advisor.broadcastMaxRows" -> "0",
        "spark.graft.advisor.skewFactor" -> "1.5",
        "spark.graft.advisor.minSaltOutputRows" -> "100",
        "spark.graft.advisor.maxSaltBuckets" -> "8",
        "spark.graft.advisor.targetPartitions" -> "200000",
        // ceiling lifted (r16): at the 200k-partition fair share of 1,
        // EVERY key's corrected output breaches the 1.5× skew test at
        // fixture SFs, so the breaching "hot mass" is the whole frame
        // and the measured demotion ceiling would (correctly, for that
        // degenerate estimate) route to shuffle+AQE — this query grades
        // the salted EXECUTION; the ceiling itself is JoinAdvisorSpec's
        "spark.graft.advisor.maxHotShare" -> "1.0") {
      // the hot key is hot on BOTH sides, with the right multiplicity
      // CONSTANT (3 VALUES rows + any real orderkey-1 row): a hot key
      // against a single right row is a 600-row reducer no advisory
      // should salt — the corrected right frequency correctly floors to
      // ~1·collisions and the verdict at sf0.001 was shuffle, which
      // Catalyst then broadcast (the r16 fixture lesson); the constant
      // fan-out keeps the verdict salt at every SF while the output
      // stays linear in lineitem
      val res = s.sql("""
        SELECT /*+ GRAFT_ADVISE */ k, CAST(count(*) AS BIGINT) AS n,
          round(sum(l_extendedprice), 2) AS amt
        FROM (SELECT CASE WHEN l_orderkey % 10 = 0 THEN 1
                ELSE l_orderkey END AS k, l_extendedprice
              FROM graft_lineitem_q233) l
        JOIN (SELECT o_orderkey AS k FROM graft_orders_q233
              UNION ALL
              SELECT 1 AS k FROM (VALUES (1), (2), (3)) AS t(x)) o
          USING (k)
        GROUP BY k ORDER BY k""")
      val p = res.queryExecution.executedPlan.toString
      require(p.contains("__gsalt"),
        s"executed join must carry the salt key:\n${p.take(1500)}")
      require(p.contains("Union"),
        s"targeted salting splits hot/cold legs under a Union:\n" +
          p.take(1500))
      require(!p.contains("BroadcastHashJoin"),
        s"salted join must not broadcast a past-dimension side:\n" +
          p.take(1500))
      // ship the OPTIMIZED plan (salt rewrite applied, marker gone):
      // write-time re-optimization under the RESTORED defaults can
      // never re-advise the graded salted shape away
      org.apache.spark.sql.GraftColumnBridge
        .ofRows(s, res.queryExecution.optimizedPlan)
      }
    },
    Some("""SELECT k, CAST(count(*) AS BIGINT) AS n,
        round(sum(l_extendedprice), 2) AS amt
      FROM (SELECT CASE WHEN l_orderkey % 10 = 0 THEN 1
              ELSE l_orderkey END AS k, l_extendedprice
            FROM lineitem) l
      JOIN (SELECT o_orderkey AS k FROM orders
            UNION ALL
            SELECT 1 AS k FROM (VALUES (1), (2), (3)) AS t(x)) o
        USING (k)
      GROUP BY k ORDER BY k"""))

  /** The SQL-surface advisory's salt path on a LEFT OUTER join — the
    * join-type-legality half of the r16 rule: LeftOuter forces the
    * RIGHT side to replicate (its unmatched rows never emit, so
    * replication cannot distort multiplicity), unmatched LEFT rows
    * (odd orderkeys — the right side keeps only even ones plus the
    * hot key's constant VALUES fan-out) must emit null-padded exactly
    * once, and NULL-keyed left rows (every 97th orderkey) ride the
    * cold leg — dropping them was the one way this rewrite could
    * silently lose rows, so the fixture makes them load-bearing. Same
    * q233 conf shape; the DuckDB oracle re-derives the whole aggregate
    * including the NULL-key group and the matched-count column. */
  private val q234 = Q(
    "q234_advised_sql_outer_salted",
    (s, dir) => {
      Tables(s, dir).lineitem.createOrReplaceTempView("graft_lineitem_q234")
      Tables(s, dir).orders.createOrReplaceTempView("graft_orders_q234")
      withSessionConfs(s)(
        "spark.graft.advisor.broadcastMaxRows" -> "0",
        "spark.graft.advisor.skewFactor" -> "1.5",
        "spark.graft.advisor.minSaltOutputRows" -> "100",
        "spark.graft.advisor.maxSaltBuckets" -> "8",
        "spark.graft.advisor.targetPartitions" -> "200000",
        "spark.graft.advisor.maxHotShare" -> "1.0") {
      val res = s.sql("""
        SELECT /*+ GRAFT_ADVISE */ k, CAST(count(*) AS BIGINT) AS n,
          CAST(count(k2) AS BIGINT) AS matched,
          round(sum(l_extendedprice), 2) AS amt
        FROM (SELECT CASE WHEN l_orderkey % 97 = 0 THEN CAST(NULL AS BIGINT)
                WHEN l_orderkey % 10 = 0 THEN 1
                ELSE l_orderkey END AS k, l_extendedprice
              FROM graft_lineitem_q234) l
        LEFT JOIN (SELECT o_orderkey AS k2 FROM graft_orders_q234
                   WHERE o_orderkey % 2 = 0
                   UNION ALL
                   SELECT 1 AS k2 FROM (VALUES (1), (2), (3)) AS t(x)) o
          ON l.k = o.k2
        GROUP BY k ORDER BY k""")
      val p = res.queryExecution.executedPlan.toString
      require(p.contains("__gsalt"),
        s"executed outer join must carry the salt key:\n${p.take(1500)}")
      require(p.contains("Union"),
        s"targeted salting splits hot/cold legs under a Union:\n" +
          p.take(1500))
      require(!p.contains("BroadcastHashJoin"),
        s"salted join must not broadcast a past-dimension side:\n" +
          p.take(1500))
      // optimized plan out + confs restored — see q233
      org.apache.spark.sql.GraftColumnBridge
        .ofRows(s, res.queryExecution.optimizedPlan)
      }
    },
    Some("""SELECT k, CAST(count(*) AS BIGINT) AS n,
        CAST(count(k2) AS BIGINT) AS matched,
        round(sum(l_extendedprice), 2) AS amt
      FROM (SELECT CASE WHEN l_orderkey % 97 = 0 THEN CAST(NULL AS BIGINT)
              WHEN l_orderkey % 10 = 0 THEN 1
              ELSE l_orderkey END AS k, l_extendedprice
            FROM lineitem) l
      LEFT JOIN (SELECT o_orderkey AS k2 FROM orders
                 WHERE o_orderkey % 2 = 0
                 UNION ALL
                 SELECT 1 AS k2 FROM (VALUES (1), (2), (3)) AS t(x)) o
        ON l.k = o.k2
      GROUP BY k ORDER BY k"""))

  /** The SQL-surface advisory's salt path on a FULL OUTER join — the
    * LAST row of the GRAFT_ADVISE type table (r16 verdict #4). A full
    * outer cannot take the one-sided salt shape directly (both sides'
    * unmatched rows emit; a replicated unmatched row would emit once
    * per bucket), so [[graft.plans.AdvisedEquiJoinRewrite]] decomposes
    * it by the outer-union identity — (A ⟕ B) ∪all null-pad(B ▷ A) —
    * and salts each leg under its own one-sided legality. The fixture
    * makes every failure mode load-bearing:
    *  - NULL keys on BOTH sides (every 97th lineitem orderkey, every
    *    89th odd orders key) must each emit exactly once, null-padded —
    *    they ride each leg's cold route;
    *  - unmatched LEFT rows (even non-fold orderkeys — the right side
    *    keeps odd keys only) emit from the outer leg exactly once;
    *  - unmatched RIGHT rows, including HOT ones (at the 200k-partition
    *    fair share every key breaches, so an odd right key whose left
    *    twin was nulled by the %97 rule is hot AND unmatched), must
    *    emit exactly once from the anti leg — a replicated unmatched
    *    row would emit buckets× and the n_right column reds;
    *  - matched pairs (odd non-fold keys + the constant VALUES fan-out
    *    on the hot key 1) emit exactly once, from the outer leg only
    *    (the anti leg must exclude matched right rows).
    * Same q233/q234 conf shape (restored in the finally); plan-pinned:
    * salt key present, Union present, no broadcast. The DuckDB oracle
    * re-derives the whole aggregate — per-group total, left-presence,
    * right-presence and amount — including both NULL-key populations
    * collapsing into one NULL group under coalesce(k, k2). */
  private val q235 = Q(
    "q235_advised_sql_full_outer_salted",
    (s, dir) => {
      Tables(s, dir).lineitem.createOrReplaceTempView("graft_lineitem_q235")
      Tables(s, dir).orders.createOrReplaceTempView("graft_orders_q235")
      withSessionConfs(s)(
        "spark.graft.advisor.broadcastMaxRows" -> "0",
        "spark.graft.advisor.skewFactor" -> "1.5",
        "spark.graft.advisor.minSaltOutputRows" -> "100",
        "spark.graft.advisor.maxSaltBuckets" -> "8",
        "spark.graft.advisor.targetPartitions" -> "200000",
        "spark.graft.advisor.maxHotShare" -> "1.0") {
      val res = s.sql("""
        SELECT /*+ GRAFT_ADVISE */ coalesce(k, k2) AS kk,
          CAST(count(*) AS BIGINT) AS n,
          CAST(count(l_extendedprice) AS BIGINT) AS n_left,
          CAST(count(rv) AS BIGINT) AS n_right,
          round(sum(l_extendedprice), 2) AS amt
        FROM (SELECT CASE WHEN l_orderkey % 97 = 0 THEN CAST(NULL AS BIGINT)
                WHEN l_orderkey % 10 = 0 THEN 1
                ELSE l_orderkey END AS k, l_extendedprice
              FROM graft_lineitem_q235) l
        FULL OUTER JOIN (
          SELECT CASE WHEN o_orderkey % 89 = 0 THEN CAST(NULL AS BIGINT)
                 ELSE o_orderkey END AS k2, 1 AS rv
          FROM graft_orders_q235 WHERE o_orderkey % 2 = 1
          UNION ALL
          SELECT 1 AS k2, 1 AS rv FROM (VALUES (1), (2), (3)) AS t(x)) o
          ON l.k = o.k2
        GROUP BY coalesce(k, k2) ORDER BY kk""")
      val p = res.queryExecution.executedPlan.toString
      require(p.contains("__gsalt"),
        s"executed full-outer join must carry the salt key:\n${p.take(1500)}")
      require(p.contains("Union"),
        s"the outer-union decomposition must be present:\n${p.take(1500)}")
      require(!p.contains("BroadcastHashJoin"),
        s"salted full outer must not broadcast a past-dimension side:\n" +
          p.take(1500))
      // the decomposed plan contains only LeftOuter/LeftAnti joins, so
      // ANY "FullOuter" render means the rewrite did not fire (r17
      // ADVICE: join nodes render as "SortMergeJoin [k], [k2], FullOuter"
      // — the earlier "SortMergeJoin(FullOuter" pattern could never match)
      require(!p.contains("FullOuter"),
        s"the FullOuter node itself must be decomposed away:\n${p.take(1500)}")
      // optimized plan out + confs restored — see q233
      org.apache.spark.sql.GraftColumnBridge
        .ofRows(s, res.queryExecution.optimizedPlan)
      }
    },
    Some("""SELECT coalesce(k, k2) AS kk,
        CAST(count(*) AS BIGINT) AS n,
        CAST(count(l_extendedprice) AS BIGINT) AS n_left,
        CAST(count(rv) AS BIGINT) AS n_right,
        round(sum(l_extendedprice), 2) AS amt
      FROM (SELECT CASE WHEN l_orderkey % 97 = 0 THEN CAST(NULL AS BIGINT)
              WHEN l_orderkey % 10 = 0 THEN 1
              ELSE l_orderkey END AS k, l_extendedprice
            FROM lineitem) l
      FULL OUTER JOIN (
        SELECT CASE WHEN o_orderkey % 89 = 0 THEN CAST(NULL AS BIGINT)
               ELSE o_orderkey END AS k2, 1 AS rv
        FROM orders WHERE o_orderkey % 2 = 1
        UNION ALL
        SELECT 1 AS k2, 1 AS rv FROM (VALUES (1), (2), (3)) AS t(x)) o
        ON l.k = o.k2
      GROUP BY coalesce(k, k2) ORDER BY kk"""))

  /** Column-level table profile ([[graft.operators.Profiling.profile]])
    * over `orders` — per-column row/null/distinct counts, min/max, and a
    * q40-style verdict that the HLL sketch tracks the exact distinct.
    * The oracle re-derives every exact metric per column (min/max
    * round-trip through string casts that both engines render
    * identically for longs, strings, and dates) and asserts the verdict
    * TRUE. */
  private val q154 = Q(
    "q154_table_profile", {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderdate", "o_orderpriority", "o_totalprice")
      (s, dir) => graft.operators.Profiling.profile(
          Tables(s, dir).orders, cols)
        .orderBy(col("column"))
    },
    Some {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderdate", "o_orderpriority", "o_totalprice")
      cols.map { c =>
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_nulls,
        CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
        CAST(min($c) AS VARCHAR) AS min_value,
        CAST(max($c) AS VARCHAR) AS max_value,
        TRUE AS approx_ok FROM orders"""
      }.mkString("", "\n      UNION ALL\n      ", "\n      ORDER BY \"column\"")
    })

  /** Multi-level aggregation via ROLLUP (§2.9 analytic surface): one pass
    * produces (year, priority), (year), and grand-total rows — on a
    * cluster this is ONE shuffle with partial aggregation per grouping
    * level (Catalyst's Expand feeds a single hash aggregate), not three
    * separate scans+shuffles of a 100 TB fact table. `grouping()` flags
    * disambiguate a real NULL group from a subtotal row; NULL group keys
    * are additionally rendered as 'ALL' so the row set is total-orderable
    * on both engines. */
  private val q179 = Q(
    "q179_rollup_agg",
    (s, dir) => Tables(s, dir).orders
      .select(year(col("o_orderdate")).as("yr_raw"),
        col("o_orderpriority"), col("o_totalprice"))
      .rollup(col("yr_raw"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"),
        grouping(col("yr_raw")).cast("int").as("g_yr"),
        grouping(col("o_orderpriority")).cast("int").as("g_pri"))
      .select(
        coalesce(col("yr_raw").cast("string"), lit("ALL")).as("yr"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("g_yr"), col("g_pri"), col("revenue"), col("n_orders"))
      .orderBy(col("yr"), col("priority")),
    Some("""SELECT coalesce(CAST(yr_raw AS VARCHAR), 'ALL') AS yr,
        coalesce(o_orderpriority, 'ALL') AS priority,
        CAST(GROUPING(yr_raw) AS INTEGER) AS g_yr,
        CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pri,
        round(sum(o_totalprice), 2) AS revenue,
        CAST(count(*) AS BIGINT) AS n_orders
      FROM (SELECT year(o_orderdate) AS yr_raw, o_orderpriority,
              o_totalprice FROM orders)
      GROUP BY ROLLUP (yr_raw, o_orderpriority)
      ORDER BY yr, priority"""))

  /** GROUPING SETS with disjoint sets — the general form ROLLUP/CUBE
    * specialize: per-type totals, per-hour totals, and the grand total
    * in ONE shuffle (Expand replicates each input row once per set, so
    * the cost is #sets × scan, never #sets × shuffle). The hour axis and
    * type axis never co-occur, which neither rollup nor cube can
    * express. */
  private val q180 = Q(
    "q180_grouping_sets",
    (s, dir) => Tables(s, dir).events
      .select(col("event_type"), hour(col("ts")).as("hr_raw"), col("value"))
      .groupingSets(
        Seq(Seq(col("event_type")), Seq(col("hr_raw")), Seq()),
        col("event_type"), col("hr_raw"))
      .agg(round(sum(col("value")), 4).as("total_value"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("etype"),
        coalesce(col("hr_raw").cast("string"), lit("ALL")).as("hr"),
        col("total_value"), col("n"))
      .orderBy(col("etype"), col("hr")),
    Some("""SELECT coalesce(event_type, 'ALL') AS etype,
        coalesce(CAST(hr_raw AS VARCHAR), 'ALL') AS hr,
        round(sum(value), 4) AS total_value,
        CAST(count(*) AS BIGINT) AS n
      FROM (SELECT event_type, hour(ts) AS hr_raw, value FROM events)
      GROUP BY GROUPING SETS ((event_type), (hr_raw), ())
      ORDER BY etype, hr"""))

  /** PIVOT: long→wide reshape with an EXPLICIT value list — the form
    * that scales. Spark's values-less pivot runs a driver-side distinct
    * first (a full extra job over the fact table at 100 TB); pinning the
    * five priorities makes the reshape a single map-side conditional
    * aggregation fused into the group-by shuffle. Oracle = the
    * equivalent conditional aggregation (the portable expansion of
    * PIVOT). */
  private val q181 = Q(
    "q181_pivot_priority",
    (s, dir) => Tables(s, dir).orders
      .select(
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM")
          .as("month"),
        col("o_orderpriority"), col("o_totalprice"))
      .groupBy(col("month"))
      .pivot(col("o_orderpriority"),
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(round(sum(col("o_totalprice")), 2))
      .orderBy(col("month")),
    Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS "1-URGENT",
        round(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 2) AS "2-HIGH",
        round(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 2) AS "3-MEDIUM",
        round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 2) AS "4-NOT SPECIFIED",
        round(sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2) AS "5-LOW"
      FROM orders GROUP BY 1 ORDER BY month"""))

  /** UNPIVOT (melt): wide→long reshape of per-flag aggregates into
    * (flag, measure, value) rows. Unpivot is a zero-shuffle map-side
    * Expand — each input row emits one row per measure — so at scale it
    * rides whatever partitioning the input already has; only the
    * upstream aggregate shuffles. Oracle = the UNION ALL expansion. */
  private val q182 = Q(
    "q182_unpivot_measures",
    (s, dir) => Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure")),
    Some("""WITH w AS (SELECT l_returnflag,
        round(sum(l_quantity), 2) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_price,
        round(avg(l_discount), 4) AS avg_disc
      FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
      UNION ALL
      SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM w
      UNION ALL
      SELECT l_returnflag, 'avg_disc' AS measure, avg_disc AS value FROM w
      ORDER BY l_returnflag, measure"""))

  /** Triangle participation counts over the co-purchase graph (parts
    * sharing an order). Triangle counting is the standard graph-quality
    * probe next to CC-dedup ([[graft.operators.Dedup]]) and PageRank
    * ([[graft.operators.Graph]]): clustering structure of a similarity
    * graph. Edges derive from a self-join bounded per order (orders have
    * ~4 lines, so the edge fan-out is constant); enumeration uses
    * degree-ordered orientation — each edge points low→high (degree, id)
    * — which bounds every node's out-degree by O(sqrt(|E|)) and keeps the
    * wedge join from exploding on skewed hubs at 100 TB, where naive
    * id-ordering dies on one high-degree low-id node. Per-node counts are
    * orientation-invariant, so the oracle enumerates id-ordered. */
  private val q184 = Q(
    "q184_triangle_counts",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_partkey"))
      val a = li.select(col("l_orderkey"), col("l_partkey").as("u"))
      val b = li.select(col("l_orderkey"), col("l_partkey").as("v"))
      val edges = a.join(b, Seq("l_orderkey"))
        .filter(col("u") < col("v"))
        .select(col("u"), col("v")).distinct()
      graft.operators.Graph.triangleCounts(edges, "u", "v")
        .orderBy(col("node"))
    },
    Some("""WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1 JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      FROM (SELECT unnest([a, b, c]) AS node FROM t)
      GROUP BY node ORDER BY node"""))

  /** Synchronous label propagation over the co-purchase graph
    * ([[graft.operators.Graph.labelPropagation]], 2 rounds): the
    * community detector next to q184's triangles and q56/q73's connected
    * components — CC merges everything reachable, LPA splits the
    * connected graph into dense regions. The operator's determinism
    * contract (sync rounds, ties to the MINIMUM label, no RNG) is what
    * makes a full oracle possible at all: DuckDB re-derives both rounds
    * by unrolling vote → count → row_number-tie-break per round — an
    * async or RNG-seeded LPA has no restatable answer. Per-round cost is
    * one edges ⋈ labels shuffle + two keyed aggregations (Pregel plan);
    * the symmetric edge closure is checkpointed once. */
  private val q208 = Q(
    "q208_label_propagation",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_partkey"))
      val a = li.select(col("l_orderkey"), col("l_partkey").as("u"))
      val b = li.select(col("l_orderkey"), col("l_partkey").as("v"))
      // NO .distinct() here (the oracle's e0 keeps it): labelPropagation
      // dedups the normalized closure internally, so a caller-side
      // distinct would shuffle the same 3M-row pair stream twice for an
      // identical label result — this was half of q208's #1-shuffle-mover
      // rank and the r13/r14 envelope flags
      val edges = a.join(b, Seq("l_orderkey"))
        .filter(col("u") < col("v"))
        .select(col("u"), col("v"))
      graft.operators.Graph.labelPropagation(edges, "u", "v", rounds = 2)
        .orderBy(col("node"))
    },
    Some("""WITH e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      und AS (SELECT u AS a, v AS b FROM e0
        UNION SELECT v AS a, u AS b FROM e0),
      l0 AS (SELECT DISTINCT a AS node, a AS lab FROM und),
      c1 AS (SELECT und.a AS node, l.lab, count(*) AS cnt
        FROM und JOIN l0 l ON l.node = und.b GROUP BY 1, 2),
      l1 AS (SELECT node, lab FROM (SELECT node, lab, row_number()
          OVER (PARTITION BY node ORDER BY cnt DESC, lab ASC) AS rn
        FROM c1) WHERE rn = 1),
      c2 AS (SELECT und.a AS node, l.lab, count(*) AS cnt
        FROM und JOIN l1 l ON l.node = und.b GROUP BY 1, 2),
      l2 AS (SELECT node, lab FROM (SELECT node, lab, row_number()
          OVER (PARTITION BY node ORDER BY cnt DESC, lab ASC) AS rn
        FROM c2) WHERE rn = 1)
      SELECT CAST(node AS BIGINT) AS node, CAST(lab AS BIGINT) AS label
      FROM l2 ORDER BY node"""))

  /** 2-D Pareto frontier ([[graft.operators.Profiling.paretoFrontier]]):
    * the parts of one brand that are cheapest for their size — no other
    * part has (price ≤, size ≥) with one strict. The oracle restates
    * dominance as the NAIVE quadratic NOT EXISTS self-join (exactly what
    * the operator must never execute); the engine's plan is
    * groupBy(price) partial-combine → one running-max window over the
    * distinct-price frame → semi-join back, linear in rows with the
    * single-partition pass bounded by |distinct prices|. */
  private val q209 = Q(
    "q209_pareto_frontier",
    (s, dir) => {
      val parts = Tables(s, dir).part
        .filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      graft.operators.Profiling
        .paretoFrontier(parts, col("p_retailprice"), col("p_size"))
        .orderBy(col("p_partkey"))
    },
    Some("""WITH b AS (SELECT p_partkey, p_retailprice, p_size
        FROM part WHERE p_brand = 'Brand#23')
      SELECT p_partkey, p_retailprice, p_size FROM b r
      WHERE NOT EXISTS (SELECT 1 FROM b s
        WHERE s.p_retailprice <= r.p_retailprice AND s.p_size >= r.p_size
          AND (s.p_retailprice < r.p_retailprice OR s.p_size > r.p_size))
      ORDER BY p_partkey"""))

  /** Value-window suite: first_value / last_value / nth_value /
    * lag-with-default / lead over one (priority, price) window — the
    * §2.9 navigation surface q189's rank suite doesn't touch. The
    * classic last_value trap is the POINT of the query: with the
    * default RANGE UNBOUNDED PRECEDING..CURRENT ROW frame, last_value
    * is just the current row — the window must be widened to
    * UNBOUNDED FOLLOWING explicitly (done identically in both
    * engines). All five functions share one sort; ordering includes
    * the unique key so navigation is tie-deterministic. */
  private val q214 = Q(
    "q214_window_value_suite",
    (s, dir) => {
      val sorted = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val full = sorted.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir).orders
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"),
          first(col("o_orderkey")).over(full).as("cheapest_key"),
          last(col("o_orderkey")).over(full).as("priciest_key"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_key"),
          lag(col("o_totalprice"), 1, -1.0).over(sorted).as("prev_price"),
          lead(col("o_totalprice"), 1).over(sorted).as("next_price"))
        .orderBy(col("o_orderpriority"), col("o_totalprice"),
          col("o_orderkey"))
    },
    Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
        first_value(o_orderkey) OVER wf AS cheapest_key,
        last_value(o_orderkey) OVER wf AS priciest_key,
        nth_value(o_orderkey, 2) OVER wf AS second_key,
        lag(o_totalprice, 1, -1.0) OVER ws AS prev_price,
        lead(o_totalprice, 1) OVER ws AS next_price
      FROM orders
      WINDOW ws AS (PARTITION BY o_orderpriority
          ORDER BY o_totalprice, o_orderkey),
        wf AS (PARTITION BY o_orderpriority
          ORDER BY o_totalprice, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_orderpriority, o_totalprice, o_orderkey"""))

  /** Exact distinct-count at scale via BITMAPS (the roaring-bitmap
    * idea in pure SQL): users map to (word = id/64, bit = id%64),
    * per-(event_type, word) partial `bit_or` folds every occurrence
    * into one long — map-side combining, merge-order-free — and
    * popcounts sum to the EXACT distinct count. The 100 TB contrast
    * to q40's HLL: same two-level mergeable-aggregation plan, but the
    * state is domain/8 bytes per group instead of 2^p registers, and
    * the answer is exact, not ±1%/√m — the right tool when the id
    * domain is dense and bounded (user tables, doc shards). The raw
    * stream never shuffles: only (type, word) partials cross the
    * exchange. */
  private val q215 = Q(
    "q215_bitmap_distinct",
    (s, dir) => {
      val ev = graft.sources.Tables(s, dir).events
      // arithmetic shift + pmod, NOT `/` + `%`: Column `/` is double
      // division (truncates toward zero, loses exactness past 2^53) and
      // `%` follows the sign — both diverge from floor semantics on
      // negative ids. `id >> 6` IS exact floor division by 64 over the
      // whole long domain (both engines' >> is the arithmetic shift),
      // and pmod keeps the bit index in [0, 64) — (w, bit) stays a
      // total bijection over ANY id domain, not just the fixture's
      // non-negative one.
      ev.select(col("event_type"),
          shiftright(col("user_id"), 6).as("w"),
          // the Scala shiftleft() helper takes a literal shift only;
          // the SQL form shifts by a column
          expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 64) AS INT))")
            .as("m"))
        .groupBy(col("event_type"), col("w"))
        .agg(bit_or(col("m")).as("bm"))
        .groupBy(col("event_type"))
        .agg(sum(bit_count(col("bm")).cast("long")).as("n_users"),
          count(lit(1)).as("n_words"))
        .orderBy(col("event_type"))
    },
    Some("""WITH b AS (SELECT event_type, user_id >> 6 AS w,
          CAST(1::UBIGINT << CAST(((user_id % 64) + 64) % 64 AS INTEGER)
            AS UBIGINT) AS m
        FROM events),
      bm AS (SELECT event_type, w, bit_or(m) AS bm
        FROM b GROUP BY 1, 2)
      SELECT event_type, CAST(sum(bit_count(bm)) AS BIGINT) AS n_users,
        CAST(count(*) AS BIGINT) AS n_words
      FROM bm GROUP BY event_type ORDER BY event_type"""))

  /** Distribution-rank window suite: ntile / percent_rank / cume_dist
    * per priority partition — the §2.9 window surface beyond rank and
    * running sums (q12-q15). All four functions share ONE window
    * (partition, order) so Catalyst evaluates them in a single sort +
    * Window node — no extra shuffle per function. The ratios are exact
    * integer divisions computed identically by any engine, so they ship
    * raw (no rounding, no repr half-boundary risk). Ordering includes
    * the unique key: distribution functions are tie-SENSITIVE, and a
    * non-total order would make the whole result nondeterministic. */
  private val q189 = Q(
    "q189_window_suite",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables(s, dir).orders
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"),
          row_number().over(w).as("rn"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy(col("o_orderpriority"), col("rn"))
    },
    Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
        CAST(row_number() OVER w AS INTEGER) AS rn,
        CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        percent_rank() OVER w AS pct_rank,
        cume_dist() OVER w AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
        ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderpriority, rn"""))

  /** Interval×interval overlap join
    * ([[graft.operators.Temporal.intervalOverlapJoin]]): sampled order
    * activity windows [orderdate, +7d] against campaign weeks
    * [week, +13d] — both sides bucket-exploded, equi-joined on the
    * bucket, deduped by the first-shared-bucket ownership rule (no
    * distinct pass). Oracle = the plain inequality overlap join, which
    * DuckDB runs natively (IEJoin); the rewrite must reproduce it
    * row-for-row. */
  private val q191 = Q(
    "q191_interval_overlap_join",
    (s, dir) => {
      val day = 86400L
      val o = Tables(s, dir).orders
      val a = o.filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey").as("aid"),
          unix_timestamp(col("o_orderdate")).as("af"),
          (unix_timestamp(col("o_orderdate")) + lit(7L * day)).as("at"))
      val b = o.select(date_trunc("week", col("o_orderdate")).as("w"))
        .distinct()
        .select(unix_timestamp(col("w")).as("bf"),
          (unix_timestamp(col("w")) + lit(13L * day)).as("bt"))
      // width derived from BOTH sides' span distributions (7d activity
      // windows, 13d campaign weeks) — deriveBucketWidth2's GK pass
      // replaces the hand-picked constant; any derived width is exact
      // (the residual predicate decides matches), the derivation just
      // bounds the explosion
      val width = graft.operators.Temporal.deriveBucketWidth2(
        a, col("af"), col("at"), b, col("bf"), col("bt"))
      require(width >= 7L * day && width <= 13L * day + 1,
        s"derived width $width outside the two span modes [7d, 13d]")
      graft.operators.Temporal.intervalOverlapJoin(
          a, col("af"), col("at"), b, col("bf"), col("bt"),
          bucketWidth = width)
        .orderBy(col("aid"), col("bf"))
    },
    Some("""WITH a AS (SELECT o_orderkey AS aid, epoch(o_orderdate) AS af,
          epoch(o_orderdate + INTERVAL 7 DAY) AS at
        FROM orders WHERE o_orderkey % 50 = 0),
      b AS (SELECT DISTINCT epoch(date_trunc('week', o_orderdate)) AS bf,
          epoch(date_trunc('week', o_orderdate) + INTERVAL 13 DAY) AS bt
        FROM orders)
      SELECT CAST(aid AS BIGINT) AS aid, CAST(af AS BIGINT) AS af,
        CAST(at AS BIGINT) AS at, CAST(bf AS BIGINT) AS bf,
        CAST(bt AS BIGINT) AS bt
      FROM a JOIN b ON af <= bt AND bf <= at
      ORDER BY aid, bf"""))

  /** Array higher-order functions (§2.9's nested-data surface):
    * per-order price lists folded with aggregate(), reshaped with
    * transform(), gated with filter()/exists() — the lambda expressions
    * stay inside codegen, no UDF. Float determinism: the list is
    * sort_array()ed FIRST, so the left fold's IEEE addition order is
    * pinned on both engines (DuckDB's list_sum/list_transform walk the
    * same sorted list left-to-right) — an unordered collect_list fold
    * would be partitioning-dependent. */
  private val q195 = Q(
    "q195_array_hof",
    (s, dir) => Tables(s, dir).lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_extendedprice"))).as("prices"))
      .select(col("l_orderkey"),
        size(col("prices")).as("n_items"),
        aggregate(col("prices"), lit(0.0), (acc, x) => acc + x)
          .as("total"),
        element_at(col("prices"), -1).as("max_price"),
        size(filter(col("prices"), _ > 40000.0)).as("n_over_40k"),
        exists(col("prices"), _ > 50000.0).as("any_over_50k"),
        aggregate(transform(col("prices"), x => x * 0.9), lit(0.0),
          (acc, x) => acc + x).as("discounted_total"))
      .orderBy(col("l_orderkey")),
    Some("""WITH p AS (SELECT l_orderkey,
          list_sort(list(l_extendedprice)) AS prices
        FROM lineitem GROUP BY l_orderkey)
      SELECT l_orderkey,
        CAST(len(prices) AS INTEGER) AS n_items,
        list_sum(prices) AS total,
        prices[-1] AS max_price,
        CAST(len(list_filter(prices, x -> x > 40000.0)) AS INTEGER)
          AS n_over_40k,
        len(list_filter(prices, x -> x > 50000.0)) > 0 AS any_over_50k,
        list_sum(list_transform(prices, x -> x * 0.9))
          AS discounted_total
      FROM p ORDER BY l_orderkey"""))

  /** Schema-evolution read (mergeSchema): a corpus written across two
    * schema epochs — v1 lacks a column v2 added — reads back as ONE
    * frame with the union schema, v1 rows null-filled. The ingestion
    * reality of any years-old 100 TB lake: schemas drift, history is
    * never rewritten. mergeSchema reconciles footers at planning time
    * (one extra metadata pass, no data rewrite); pruning/pushdown still
    * apply per file. */
  private val q196 = Q(
    "q196_schema_evolution",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val base = java.nio.file.Files
        .createTempDirectory("graft-q196-epochs").toString
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"))
        .write.mode("overwrite").parquet(s"$base/epoch1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$base/epoch2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$base/epoch1", s"$base/epoch2")
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang,
        CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE NULL END AS n_chars
      FROM documents ORDER BY doc_id"""))

  /** RANGE-frame time window (vs q13's ROWS frame): trailing 7-day
    * revenue per customer — the frame is defined by the ORDER-BY
    * VALUE's distance, not row position, so same-day peers all join the
    * frame and gaps in the calendar shrink it. Spark's rangeBetween
    * needs a numeric order key (epoch seconds); DuckDB's RANGE …
    * INTERVAL over the timestamp is the same window contents, peers
    * included, on both engines. One sort shuffle, exactly q13's scale
    * shape. */
  private val q201 = Q(
    "q201_range_frame_window",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-7L * 86400L, 0L)
      Tables(s, dir).orders
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
          round(sum(col("o_totalprice")).over(w), 2).as("rev_7d"),
          count(lit(1)).over(w).as("n_7d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
        strftime(o_orderdate, '%Y-%m-%d') AS day,
        round(sum(o_totalprice) OVER w, 2) AS rev_7d,
        count(*) OVER w AS n_7d
      FROM orders WHERE o_custkey < 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""))

  /** Referential-integrity audit — the data-quality gate a warehouse
    * runs before trusting a snapshot: orphan counts per FK edge
    * (lineitem→orders, orders→customer, customer→nation,
    * lineitem→part/supplier), each an anti-join COUNT (no payload
    * shuffle — only keys move), plus the parent row count for rate
    * context. One row per FK edge regardless of corpus size. */
  private val q203 = Q(
    "q203_fk_audit",
    (s, dir) => {
      val t = Tables(s, dir)
      // One lazy aggregate per edge, unioned into a SINGLE job (r18):
      // the former shape ran TEN sequential driver-side count() actions
      // (orphan count + row count per edge), serializing ten jobs where
      // one suffices and leaving the cluster idle between them (guide
      // §1.2-1 / §2.6). The left-join-count form is exact because the
      // parent side is key-distinct by construction (distinct() below),
      // so join cardinality == child cardinality and a null hit IS the
      // left_anti verdict.
      def audit(name: String, child: DataFrame, ck: String,
          parent: DataFrame, pk: String): DataFrame =
        child.select(col(ck).as("k"))
          .join(parent.select(col(pk).as("k")).distinct()
            .withColumn("__hit", lit(1)), Seq("k"), "left")
          .agg(count(lit(1)).as("child_rows"),
            // coalesce (r18 ADVICE): sum over ZERO rows is NULL where
            // the old count()-based form returned 0 — an empty child
            // table must keep reporting 0 orphans, not NULL
            coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)),
              lit(0L)).as("orphans"))
          .select(lit(name).as("fk_edge"), col("child_rows"), col("orphans"))
      Seq(
        audit("lineitem->orders", t.lineitem, "l_orderkey",
          t.orders, "o_orderkey"),
        audit("lineitem->part", t.lineitem, "l_partkey", t.part, "p_partkey"),
        audit("lineitem->supplier", t.lineitem, "l_suppkey",
          t.supplier, "s_suppkey"),
        audit("orders->customer", t.orders, "o_custkey",
          t.customer, "c_custkey"),
        audit("customer->nation", t.customer, "c_nationkey",
          t.nation, "n_nationkey"))
        .reduce(_.unionByName(_))
        .orderBy(col("fk_edge"))
    },
    Some("""SELECT 'customer->nation' AS fk_edge,
        CAST((SELECT count(*) FROM customer) AS BIGINT) AS child_rows,
        CAST((SELECT count(*) FROM customer c WHERE NOT EXISTS
          (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
          AS BIGINT) AS orphans
      UNION ALL SELECT 'lineitem->orders',
        (SELECT count(*) FROM lineitem),
        (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      UNION ALL SELECT 'lineitem->part',
        (SELECT count(*) FROM lineitem),
        (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
      UNION ALL SELECT 'lineitem->supplier',
        (SELECT count(*) FROM lineitem),
        (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
      UNION ALL SELECT 'orders->customer',
        (SELECT count(*) FROM orders),
        (SELECT count(*) FROM orders o WHERE NOT EXISTS
          (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      ORDER BY fk_edge"""))

  /** CUBE — completes the multi-level-agg trio (ROLLUP q179, GROUPING
    * SETS q180): ALL 2² combinations of (status, priority) in one
    * Expand+partial-agg shuffle. The grouping_id() bitmask disambiguates
    * every level in one integer — the column a BI layer keys its
    * drill-down cache on. */
  private val q204 = Q(
    "q204_cube_agg",
    (s, dir) => Tables(s, dir).orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"),
        grouping_id().cast("int").as("gid"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("revenue"), col("n_orders"))
      .orderBy(col("status"), col("priority")),
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        coalesce(o_orderpriority, 'ALL') AS priority,
        CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
          AS INTEGER) AS gid,
        round(sum(o_totalprice), 2) AS revenue,
        CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority"""))

  override val all: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14,
    q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25, q26, q27, q28,
    q29, q2a, q2b, q129, q131, q132, q136, q139, q143, q154, q156, q158,
    q160, q163, q164, q165, q166, q168, q176, q179, q180, q181, q182,
    q184, q189, q191, q195, q196, q201, q203, q204, q208, q209, q214,
    q215, q217, q223, q224, q226, q232, q233, q234, q235)
}
