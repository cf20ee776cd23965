package graft.queries

import graft.Tables
import graft.operators.GlobalRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Num._

/** Extended relational surface: top-N joins, rollup, semi joins, pivot,
  * set operations, and an as-of join — operators beyond the reference's
  * inventory that a complete warehouse engine needs (and that Spark
  * expresses natively; SURVEY §2.4 notes the absent families).
  */
object RelationalExt extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** TPC-H Q3-shaped: selective join + grouped revenue + top-10 ordered
    * limit (compiles to TakeOrderedAndProject — no global sort at scale). */
  private def q34(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
      .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("order_date"))
      .agg(d2d(sum(dec(col("l_extendedprice"), 2) * (dec(lit(1), 2) - dec(col("l_discount"), 6))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }
  private val q34Sql =
    s"""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |  ${d2dSql("SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,6))))")} AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** ROLLUP hierarchy totals with 'ALL' labels (subtotal + grand total in
    * one pass — partial-aggregating, no reference analog). */
  private def q35(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .rollup(col("yr"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("revenue"))
      .select(
        coalesce(col("yr").cast("string"), lit("ALL")).as("yr_label"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority_label"),
        col("n_orders"), col("revenue"))
      .orderBy("yr_label", "priority_label")
  }
  private val q35Sql =
    s"""SELECT
       |  COALESCE(CAST(yr AS VARCHAR), 'ALL') AS yr_label,
       |  COALESCE(o_orderpriority, 'ALL') AS priority_label,
       |  COUNT(*) AS n_orders, ${dsumSql("o_totalprice", 2)} AS revenue
       |FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderpriority, o_totalprice FROM orders) t
       |GROUP BY ROLLUP(yr, o_orderpriority)
       |ORDER BY yr_label, priority_label""".stripMargin

  /** CUBE over (status, priority) with grouping_id — all 4 grouping sets in
    * one partial-aggregating pass (completes the grouping-sets family next
    * to q35's ROLLUP). grouping_id bit order (first cube column = MSB) is
    * the shared Spark/DuckDB/Postgres convention. */
  private def q51(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status_label"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority_label"),
        col("gid"), col("n_orders"), col("revenue"))
      .orderBy("status_label", "priority_label")
  }
  private val q51Sql =
    s"""SELECT
       |  COALESCE(o_orderstatus, 'ALL') AS status_label,
       |  COALESCE(o_orderpriority, 'ALL') AS priority_label,
       |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
       |  COUNT(*) AS n_orders, ${dsumSql("o_totalprice", 2)} AS revenue
       |FROM orders
       |GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY status_label, priority_label""".stripMargin

  /** Two-phase salted aggregation through the exact-decimal gate: phase 1
    * aggregates per (key, salt=pmod(event_id,16)) so a hot key spreads over
    * 16 reducers, phase 2 merges the 16 partials — the skew-survival shape
    * (operator twin: graft.operators.Skew.saltedSumCount). Decimal partial
    * sums are associative-exact, so the oracle is the DIRECT single-phase
    * aggregation: salting provably changes cost, not results. */
  private def q55(s: SparkSession, d: String): DataFrame = {
    val partial = t(s, d, "events")
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(sum(Num.dec(col("value"), 6)).as("psum"), count(lit(1)).as("pn"))
    // Num.d2d (string-bridged), not .cast("double"): the direct
    // BigDecimal.doubleValue disagrees with the oracle's d2dSql in the
    // last ulp once the merged sum exceeds 53 significand bits.
    partial.groupBy(col("event_type"))
      .agg(Num.d2d(sum(col("psum"))).as("total_value"),
        sum(col("pn")).as("n_events"))
      .orderBy("event_type")
  }
  private val q55Sql =
    s"""SELECT event_type, ${dsumSql("value", 6)} AS total_value,
       |  COUNT(*) AS n_events
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The at-scale approximate twin of q13's exact stats: HLL++
    * approx_count_distinct (order-independent, mergeable — the A6
    * "documented alternative" in SURVEY §2.5) and approx_percentile
    * sketches, one pass, no global sort.
    *
    * Sketch INTERNALS are engine-specific, so the raw estimates can never
    * hash-match a DuckDB oracle. Instead the output carries (a) the exact
    * columns riding the same pass (count, distinct users, min/max) and
    * (b) tolerance BOOLEANS evaluated Spark-side against exact answers —
    * HLL++ within its 3·rsd envelope, the percentile sketch's median
    * inside the exact 45th..55th percentile band (its rank error bound is
    * 1e-4), quartiles monotone. The oracle recomputes the exact columns
    * and emits literal TRUE for the booleans — a full-frame hash check
    * that fails if the sketches ever leave tolerance (the previous
    * rows-only gate carried no value signal at all). */
  private def q56(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events")
      .select(col("event_type"), col("user_id"), col("value").cast("double").as("v"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("v")).as("min_value"),
        max(col("v")).as("max_value"),
        approx_count_distinct(col("user_id")).as("cd_approx"),
        expr("approx_percentile(v, array(0.25, 0.5, 0.75), 10000)").as("pcts"),
        // pct-bound: per-event-type tolerance band for the sketch under
        // test — this query's POINT is exact-vs-approx comparison, so the
        // exact side cannot itself be sampled; grouped buffer is the
        // documented q44 wide-buffer class.
        expr("percentile(v, array(0.45, 0.55))").as("band"))
      .select(col("event_type"), col("n_events"), col("n_users"),
        col("min_value"), col("max_value"),
        (abs(col("cd_approx") - col("n_users")).cast("double") /
          col("n_users") <= 0.15).as("hll_within_tol"),
        (col("pcts").getItem(1) >= col("band").getItem(0) &&
          col("pcts").getItem(1) <= col("band").getItem(1)).as("p50_within_tol"),
        (col("pcts").getItem(0) <= col("pcts").getItem(1) &&
          col("pcts").getItem(1) <= col("pcts").getItem(2)).as("pcts_monotone"))
      .orderBy("event_type")
  }
  private val q56Sql =
    """SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  MIN(CAST(value AS DOUBLE)) AS min_value,
      |  MAX(CAST(value AS DOUBLE)) AS max_value,
      |  TRUE AS hll_within_tol, TRUE AS p50_within_tol, TRUE AS pcts_monotone
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Value-window family (first_value / nth_value / last_value over an
    * explicit full-partition frame): per nation, the richest, runner-up,
    * and poorest customers in one windowed pass. Completes the W-coverage
    * beyond rank/lag/ntile (q07/q08/q46). */
  private def q57(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "customer")
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .withColumn("richest_cust", first(col("c_custkey")).over(wf))
      .withColumn("second_cust", nth_value(col("c_custkey"), 2).over(wf))
      .withColumn("poorest_cust", last(col("c_custkey")).over(wf))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_nationkey"), col("richest_cust"), col("second_cust"),
        col("poorest_cust"))
      .orderBy("c_nationkey")
  }
  private val q57Sql =
    """SELECT c_nationkey, richest_cust, second_cust, poorest_cust FROM (
      |  SELECT c_nationkey,
      |    FIRST_VALUE(c_custkey) OVER wf AS richest_cust,
      |    NTH_VALUE(c_custkey, 2) OVER wf AS second_cust,
      |    LAST_VALUE(c_custkey) OVER wf AS poorest_cust,
      |    ROW_NUMBER() OVER wo AS rn
      |  FROM customer
      |  WINDOW
      |    wf AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      |    wo AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      |) t WHERE rn = 1 ORDER BY c_nationkey""".stripMargin

  /** Array aggregation family: per-nation balances collected, sorted
    * descending, top-3 sliced out as columns (collect_list/sort_array/
    * slice/getItem — the array-column manipulation surface). */
  private def q58(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer")
      .groupBy(col("c_nationkey"))
      .agg(slice(sort_array(collect_list(col("c_acctbal")), asc = false), 1, 3).as("top3"),
        count(lit(1)).as("n_custs"))
      .select(col("c_nationkey"),
        col("top3").getItem(0).as("top1_bal"),
        col("top3").getItem(1).as("top2_bal"),
        col("top3").getItem(2).as("top3_bal"),
        col("n_custs"))
      .orderBy("c_nationkey")
  }
  private val q58Sql =
    """SELECT c_nationkey,
      |  l[1] AS top1_bal, l[2] AS top2_bal, l[3] AS top3_bal, n_custs
      |FROM (SELECT c_nationkey, list_sort(list(c_acctbal), 'DESC') AS l,
      |        COUNT(*) AS n_custs
      |      FROM customer GROUP BY c_nationkey) t
      |ORDER BY c_nationkey""".stripMargin

  /** Gap sessionization via the NATIVE session_window operator (batch mode)
    * — the idiomatic Spark form of q19's manual lag/cumsum arithmetic, and
    * the same operator the streaming path uses. Boundary semantics (found
    * empirically at sf0.1 — an exactly-1800s gap): session_window MERGES an
    * event landing exactly on the window end, i.e. a new session requires
    * gap > 30min, same as q19's manual form; the oracle encodes the strict
    * > boundary. Timestamps floored to seconds on both sides so the
    * grouping is integer-exact. */
  private def q59(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events")
      .select(col("user_id"),
        timestamp_seconds(unix_timestamp(col("ts"))).as("tss"))
      .groupBy(col("user_id"), session_window(col("tss"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("sw").getField("start")).as("session_start_sec"),
        unix_timestamp(col("sw").getField("end")).as("session_end_sec"),
        col("n_events"))
      .orderBy("user_id", "session_start_sec")
  }
  private val q59Sql =
    """WITH e AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |g AS (
      |  SELECT user_id, sec,
      |    CASE WHEN LAG(sec) OVER w IS NULL OR sec - LAG(sec) OVER w > 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)),
      |sess AS (
      |  SELECT user_id, sec,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec
      |                      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g)
      |SELECT user_id, MIN(sec) AS session_start_sec,
      |  MAX(sec) + 1800 AS session_end_sec, COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start_sec""".stripMargin

  /** FULL OUTER join (the one join family not yet exercised): per-nation
    * customer counts vs supplier counts, null-extended on both sides and
    * coalesced — the classic reconciliation shape. Keys restricted to
    * disjoint-ish subsets so both null sides actually occur. */
  private def q60(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer").filter(col("c_nationkey") < 15)
      .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_customers"))
    val su = t(s, d, "supplier").filter(col("s_nationkey") >= 10)
      .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_suppliers"))
    c.join(su, col("nk_c") === col("nk_s"), "full_outer")
      .select(
        coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy("nationkey")
  }
  private val q60Sql =
    """SELECT COALESCE(nk_c, nk_s) AS nationkey,
      |  COALESCE(n_customers, 0) AS n_customers,
      |  COALESCE(n_suppliers, 0) AS n_suppliers
      |FROM (SELECT c_nationkey AS nk_c, COUNT(*) AS n_customers
      |      FROM customer WHERE c_nationkey < 15 GROUP BY 1) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS nk_s, COUNT(*) AS n_suppliers
      |      FROM supplier WHERE s_nationkey >= 10 GROUP BY 1) s
      |ON nk_c = nk_s
      |ORDER BY nationkey""".stripMargin

  /** Multiset set operations (INTERSECT ALL / EXCEPT ALL): duplicate-
    * preserving semantics the q38 DISTINCT variants don't cover — the
    * difference matters for row-level reconciliation. */
  private def q61(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
    val su = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
    val inter = c.intersectAll(su)
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect_all"))
    val diff = c.exceptAll(su)
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except_all"))
    inter.unionByName(diff)
      .select(col("op"), col("nationkey"), col("n"))
      .orderBy("op", "nationkey")
  }
  private val q61Sql =
    """SELECT 'intersect_all' AS op, nationkey, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT ALL
      |  SELECT s_nationkey FROM supplier) t GROUP BY nationkey
      |UNION ALL
      |SELECT 'except_all' AS op, nationkey, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  EXCEPT ALL
      |  SELECT s_nationkey FROM supplier) t GROUP BY nationkey
      |ORDER BY op, nationkey""".stripMargin

  /** RANGE-based window frame (value distance, not row count — q45 covers
    * ROWS): each order's count of same-priority orders priced within
    * ±10000, computed per priority ordered by price. Long-typed order
    * column keeps the frame arithmetic integer-exact in both engines. */
  private def q62(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("price_l"))
      .rangeBetween(-10000L, 10000L)
    t(s, d, "orders")
      // floor, not a bare cast: DuckDB CAST(DOUBLE AS BIGINT) rounds while
      // Spark truncates — floor() agrees in both engines.
      .select(col("o_orderkey"), col("o_orderpriority"),
        floor(col("o_totalprice")).as("price_l"))
      .withColumn("n_similar", count(lit(1)).over(w))
      .select(col("o_orderkey"), col("o_orderpriority"), col("price_l"),
        col("n_similar"))
      .orderBy("o_orderkey")
  }
  private val q62Sql =
    """SELECT o_orderkey, o_orderpriority, price_l,
      |  COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY price_l
      |                 RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
      |    AS n_similar
      |FROM (SELECT o_orderkey, o_orderpriority,
      |        CAST(floor(o_totalprice) AS BIGINT) AS price_l FROM orders) t
      |ORDER BY o_orderkey""".stripMargin

  /** TPC-H Q5-shaped six-way star-snowflake join: local-supplier revenue
    * per nation for one region and one order year. Exercises deep join
    * ordering — two fact-fact shuffle joins (orders⋈lineitem⋈supplier)
    * with the c_nationkey = s_nationkey colocation predicate, dims
    * broadcast, date filter pushed to the orders scan. */
  private def q63(s: SparkSession, d: String): DataFrame = {
    val asiaNations = t(s, d, "nation")
      .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    t(s, d, "customer")
      .join(t(s, d, "orders"),
        col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(t(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(d2d(sum(dec(col("l_extendedprice"), 2) * (dec(lit(1), 2) - dec(col("l_discount"), 6))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }
  private val q63Sql =
    s"""SELECT n_name,
      |  ${d2dSql("SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,6))))")} AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NOT-IN-with-
    * NULLs trap made explicit. Keys are nulled on one value per side so the
    * null<=>null bucket genuinely joins; a plain = join would silently drop
    * those rows. */
  private def q64(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
      .select(nullif(col("c_nationkey"), lit(3)).as("nk"))
      .groupBy(col("nk")).agg(count(lit(1)).as("n_customers"))
    val su = t(s, d, "supplier")
      .select(nullif(col("s_nationkey"), lit(3)).as("nk_s"))
      .groupBy(col("nk_s")).agg(count(lit(1)).as("n_suppliers"))
    c.join(su, col("nk") <=> col("nk_s"), "left")
      .select(col("nk").as("nationkey_or_null"), col("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy(asc_nulls_first("nationkey_or_null"))
  }
  private val q64Sql =
    """SELECT nk AS nationkey_or_null, n_customers,
      |  COALESCE(n_suppliers, 0) AS n_suppliers
      |FROM (SELECT nullif(c_nationkey, 3) AS nk, COUNT(*) AS n_customers
      |      FROM customer GROUP BY 1) c
      |LEFT JOIN (SELECT nullif(s_nationkey, 3) AS nk_s, COUNT(*) AS n_suppliers
      |           FROM supplier GROUP BY 1) s
      |ON nk IS NOT DISTINCT FROM nk_s
      |ORDER BY nationkey_or_null NULLS FIRST""".stripMargin

  /** Z-order (Morton) layout: orders clustered on (custkey, price-band) via
    * the graft_zorder codegen expression, split into 16 layout chunks, and
    * each chunk's bounding box reported — the per-file min/max stats a
    * z-ordered writer would produce (tight boxes on BOTH dims → file
    * skipping for filters on either). Chunk assignment is exact NTILE
    * semantics computed from the scale-safe bucketed global rank
    * (GlobalRank — a real writer's repartitionByRange(z) +
    * sortWithinPartitions(z) has the same two-pass shape), deterministic
    * for the oracle. The encoding is plain bit arithmetic, so the oracle
    * reproduces it exactly (ZOrderUtil.mortonSql). */
  private def q65(s: SparkSession, d: String): DataFrame = {
    // NOT checkpointed despite GlobalRank's three-branch evaluation:
    // measured at sf0.1, re-scanning the narrow projection + recomputing
    // the codegen'd interleave (1.5 s) beats materializing it (1.8 s) —
    // the "cheap scan inputs pass as-is" side of the contract.
    val zd = t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("x"),
        floor(col("o_totalprice") / 1000).as("y"))
      .withColumn("z", expr("graft_zorder(x, y)"))
    GlobalRank.withRank(zd, col("z"), descending = false,
        tieBreakers = Seq(col("o_orderkey")), rnName = "rn",
        totalName = Some("n"))
      .withColumn("chunk", GlobalRank.ntileFromRank(16).cast("int"))
      .groupBy(col("chunk"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .orderBy("chunk")
  }
  private val q65Sql = {
    val z = graft.functions.ZOrderUtil.mortonSql(
      "o_custkey", "CAST(floor(o_totalprice / 1000) AS BIGINT)")
    s"""SELECT chunk, COUNT(*) AS n_rows,
       |  MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
       |FROM (
       |  SELECT CAST(NTILE(16) OVER (ORDER BY z, o_orderkey) AS INTEGER) AS chunk, x, y
       |  FROM (SELECT o_orderkey, o_custkey AS x,
       |          CAST(floor(o_totalprice / 1000) AS BIGINT) AS y,
       |          $z AS z
       |        FROM orders) t1) t2
       |GROUP BY chunk ORDER BY chunk""".stripMargin
  }

  /** Native unpivot/melt (wide metrics → long rows), the inverse of q37's
    * pivot: per-nation metric columns melted to (nation, metric, value).
    * Spark's Dataset.unpivot emits the column name as the metric label;
    * the oracle is the equivalent UNION ALL (engine-portable melt). */
  private def q66(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).cast("double").as("n_customers"),
        davg(col("c_acctbal"), 2).as("avg_bal"))
      .unpivot(
        Array(col("c_nationkey")),
        Array(col("n_customers"), col("avg_bal")),
        "metric", "value")
      .orderBy("c_nationkey", "metric")
  }
  private val q66Sql =
    s"""WITH wide AS (
       |  SELECT c_nationkey,
       |    CAST(COUNT(*) AS DOUBLE) AS n_customers,
       |    ${davgSql("c_acctbal", 2)} AS avg_bal
       |  FROM customer GROUP BY c_nationkey)
       |SELECT c_nationkey, metric, value FROM (
       |  SELECT c_nationkey, 'n_customers' AS metric, n_customers AS value FROM wide
       |  UNION ALL
       |  SELECT c_nationkey, 'avg_bal' AS metric, avg_bal AS value FROM wide) t
       |ORDER BY c_nationkey, metric""".stripMargin

  /** LEFT SEMI join (EXISTS): customers with ≥1 1996 order, per nation. */
  private def q36(s: SparkSession, d: String): DataFrame = {
    val orders96 = t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    t(s, d, "customer")
      .join(orders96, col("c_custkey") === col("o_custkey"), "left_semi")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("active_customers"))
      .orderBy("n_name")
  }
  private val q36Sql =
    """SELECT n_name, COUNT(*) AS active_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** PIVOT: per-year order-status histogram as wide columns (Spark pivot ≡
    * conditional aggregation; absent combos coalesced to 0 for parity). */
  private def q37(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .groupBy(col("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("yr"),
        coalesce(col("F"), lit(0L)).as("status_f"),
        coalesce(col("O"), lit(0L)).as("status_o"),
        coalesce(col("P"), lit(0L)).as("status_p"))
      .orderBy("yr")
  }
  private val q37Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_f,
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_o,
      |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_p
      |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin

  /** Set operations: nations appearing as customer vs supplier homes —
    * INTERSECT / EXCEPT / UNION with distinct semantics. */
  private def q38(s: SparkSession, d: String): DataFrame = {
    val custN = t(s, d, "customer").select(col("c_nationkey").as("nationkey")).distinct()
    val suppN = t(s, d, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
    val both = custN.intersect(suppN).withColumn("membership", lit("both"))
    val custOnly = custN.except(suppN).withColumn("membership", lit("customer_only"))
    val suppOnly = suppN.except(custN).withColumn("membership", lit("supplier_only"))
    both.union(custOnly).union(suppOnly)
      .select(col("membership"), col("nationkey"))
      .orderBy("membership", "nationkey")
  }
  private val q38Sql =
    """WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
      |s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      |SELECT 'both' AS membership, nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s) t
      |UNION ALL
      |SELECT 'customer_only', nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s) t
      |UNION ALL
      |SELECT 'supplier_only', nationkey FROM (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c) t
      |ORDER BY membership, nationkey""".stripMargin

  /** As-of (backward) join: each purchase matched to the same user's most
    * recent strictly-earlier click. Implemented as the union+ordered-window
    * pattern — one shuffle on user_id, no range-join pair blowup; the shape
    * that scales to 100 TB event streams. */
  private def q39(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_sec",
        last(when(col("event_type") === "click", col("sec")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("sec").as("purchase_sec"), col("click_id"), col("click_sec"),
        (col("sec") - col("click_sec")).as("gap_sec"))
      .orderBy("purchase_id")
  }
  private val q39Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |m AS (
      |  SELECT user_id, event_id, event_type, sec,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER w AS click_id,
      |    last_value(CASE WHEN event_type = 'click' THEN sec END IGNORE NULLS)
      |      OVER w AS click_sec
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id AS purchase_id, user_id, sec AS purchase_sec,
      |       click_id, click_sec, sec - click_sec AS gap_sec
      |FROM m WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin

  /** FORWARD as-of join — the other direction of the family (q39/q49 are
    * backward): each click attributes to the NEXT purchase strictly after
    * it per user (click→conversion lag). Same merge-pass shape — one
    * union-ordered window partitioned by user, `first value ignore nulls`
    * over the FOLLOWING frame — so it scales identically; clicks with no
    * later purchase keep null attribution (left semantics). */
  private def q86(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    e.withColumn("purchase_id",
        first(when(col("event_type") === "purchase", col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn("purchase_sec",
        first(when(col("event_type") === "purchase", col("sec")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("sec").as("click_sec"), col("purchase_id"), col("purchase_sec"),
        (col("purchase_sec") - col("sec")).as("lag_sec"))
      .orderBy("click_id")
  }
  private val q86Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |m AS (
      |  SELECT user_id, event_id, event_type, sec,
      |    first_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
      |      OVER w AS purchase_id,
      |    first_value(CASE WHEN event_type = 'purchase' THEN sec END IGNORE NULLS)
      |      OVER w AS purchase_sec
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
      |                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
      |SELECT event_id AS click_id, user_id, sec AS click_sec,
      |       purchase_id, purchase_sec, purchase_sec - sec AS lag_sec
      |FROM m WHERE event_type = 'click' ORDER BY click_id""".stripMargin

  /** vw_monthly_trends intent (the reference drops the view at
    * complete_data_pipeline_fixed.py:99 and documents it at
    * project_README.md:308-311 but never creates it — SURVEY §1.1):
    * per-(entity, month) volume + average with month-over-month LAG,
    * window partitioned by the entity so it never buffers
    * data-proportional input. Domain twin: Marts.monthlyTrends. */
  private def q87(s: SparkSession, d: String): DataFrame = {
    val m = t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        davg(col("o_totalprice"), 2).as("m_avg_price"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("order_month"))
    m.withColumn("prev_m_avg_price", lag(col("m_avg_price"), 1).over(w))
      .withColumn("price_mom", col("m_avg_price") - col("prev_m_avg_price"))
      .orderBy("n_name", "order_month")
  }
  private val q87Sql =
    s"""SELECT n_name, order_month, n_orders, m_avg_price,
       |  LAG(m_avg_price, 1) OVER w AS prev_m_avg_price,
       |  m_avg_price - LAG(m_avg_price, 1) OVER w AS price_mom
       |FROM (
       |  SELECT n_name, strftime(o_orderdate, '%Y-%m') AS order_month,
       |         COUNT(*) AS n_orders, ${davgSql("o_totalprice", 2)} AS m_avg_price
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1, 2) m
       |WINDOW w AS (PARTITION BY n_name ORDER BY order_month)
       |ORDER BY n_name, order_month""".stripMargin

  /** q39's backward as-of join executed by the NATIVE AsOfJoin operator
    * (graft.plans: LogicalPlan + SparkStrategy + SparkPlan via
    * SparkSessionExtensions) instead of the union+window emulation: one
    * hash exchange per side, a sort, and an O(1)-state merge pass per
    * partition — no union relation, no window buffering. Same oracle as
    * q39, so the custom operator is held to the exact-hash gate. */
  private def q49(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), col("event_type"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("sec"))
    // Right side aliased to fresh names/exprIds (self-source as-of join).
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("sec").as("click_sec"))
    graft.plans.AsOf.join(purchases, clicks,
        keys = Seq("user_id" -> "c_user"),
        order = Seq("sec" -> "click_sec", "event_id" -> "click_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("sec").as("purchase_sec"), col("click_id"), col("click_sec"),
        (col("sec") - col("click_sec")).as("gap_sec"))
      .orderBy("purchase_id")
  }

  /** Exact interpolated percentiles per group (Spark `percentile` ≡ DuckDB
    * `quantile_cont` bit-for-bit — verified on this data; the scale
    * alternative is approx_percentile, documented not oracled). */
  private def q44(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events")
      .select(col("event_type"), col("value").cast("double").as("v"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // pct-bound: grouped by event_type (small enum); the per-group
        // buffer is the documented wide-buffer boundary — approx_percentile
        // (q56's tolerance-oracle pattern) is the swap-in when one group
        // outgrows an executor.
        expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.75)").as("p75"))
      .orderBy("event_type")
  }
  private val q44Sql =
    """SELECT event_type, COUNT(*) AS n,
      |  quantile_cont(CAST(value AS DOUBLE), 0.25) AS p25,
      |  quantile_cont(CAST(value AS DOUBLE), 0.5) AS p50,
      |  quantile_cont(CAST(value AS DOUBLE), 0.75) AS p75
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Explicit ROWS frame: trailing-4-event rolling sum/avg per user
    * (the reference uses only default frames, SURVEY §2.6 — this covers
    * bounded frames; decimal accumulation keeps cross-engine parity). */
  private def q45(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    t(s, d, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), col("value"))
      .withColumn("rolling_sum", sum(dec(col("value"), 6)).over(w).cast("double"))
      .withColumn("rolling_n", count(lit(1)).over(w))
      .withColumn("rolling_avg", col("rolling_sum") / col("rolling_n"))
      .select(col("event_id"), col("user_id"), col("rolling_sum"),
        col("rolling_n"), col("rolling_avg"))
      .orderBy("event_id")
  }
  private val q45Sql =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS rolling_sum,
      |  COUNT(*) OVER w AS rolling_n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS rolling_avg
      |FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events) e
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Distribution windows: ntile quartiles, percent_rank, cume_dist over a
    * total order (none exist in the reference — SURVEY §2.6 notes the gap).
    *
    * Computed ARITHMETICALLY from the scale-safe two-pass global rank
    * (graft.operators.GlobalRank) instead of `ntile/percent_rank/cume_dist
    * OVER (ORDER BY …)`, whose single-partition window funnels the whole
    * table through one task. The order (acctbal DESC, custkey) is a total
    * order — no ties — so rank = row_number, cume_dist = rn/n,
    * percent_rank = (rn-1)/(n-1), and NTILE follows the standard SQL
    * bucket-size rule (first n%b buckets get one extra row), all exact
    * integer/IEEE arithmetic identical to the window builtins. */
  private def q46(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer").select(col("c_custkey"), col("c_acctbal"))
    val rn = col("rn"); val n = col("n")
    GlobalRank.withRank(cust, col("c_acctbal"), descending = true,
        tieBreakers = Seq(col("c_custkey")), rnName = "rn",
        totalName = Some("n"))
      .withColumn("quartile", GlobalRank.ntileFromRank(4).cast("int"))
      .withColumn("pct_rank",
        when(n === 1, 0.0).otherwise(
          (rn - 1).cast("double") / (n - 1).cast("double")))
      .withColumn("cume", rn.cast("double") / n.cast("double"))
      .select(col("c_custkey"), col("c_acctbal"), col("quartile"),
        col("pct_rank"), col("cume"))
      .orderBy("c_custkey")
  }
  private val q46Sql =
    """SELECT c_custkey, c_acctbal,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Date arithmetic family: add/diff/truncate-to-boundary
    * (complements q11's extract family). */
  private def q47(s: SparkSession, d: String): DataFrame = {
    val od = col("o_orderdate").cast("date")
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        date_add(od, 30).as("due_date"),
        add_months(od, 3).as("quarter_later"),
        last_day(od).as("month_end"),
        datediff(lit("2002-01-01").cast("date"), od).as("days_to_epoch_end"),
        (od === last_day(od)).as("is_month_end"))
      .orderBy("o_orderkey")
  }
  private val q47Sql =
    """SELECT o_orderkey,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS quarter_later,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_epoch_end,
      |  CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE)) AS is_month_end
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Null-handling scalar family: nullif / coalesce chains / greatest-least
    * with nulls / null-safe equality (P6's imputation generalized). */
  private def q48(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer")
      .select(
        col("c_custkey"),
        nullif(col("c_mktsegment"), lit("MACHINERY")).as("seg_or_null"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("REDACTED")).as("seg_coalesced"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
        least(col("c_acctbal"), lit(5000.0)).as("bal_cap"),
        col("c_mktsegment").eqNullSafe(lit("MACHINERY")).as("is_machinery"))
      .orderBy("c_custkey")
  }
  /** Explicit GROUPING SETS — the non-hierarchical member of the family
    * (q35 ROLLUP, q51 CUBE): two independent single-column slices plus the
    * full cross, skipping the grand total — a set CUBE cannot express
    * without a post-filter. SQL surface (GROUPING SETS has no DataFrame
    * API); one partial-aggregating pass, same as cube/rollup. gid breaks
    * the label tie between a (status, ALL) slice row and a cross row whose
    * priority happens to be NULL. */
  private def q70(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status_label,
        |  coalesce(o_orderpriority, 'ALL') AS priority_label,
        |  cast(grouping_id(o_orderstatus, o_orderpriority) as int) AS gid,
        |  count(1) AS n_orders,
        |  cast(cast(sum(cast(o_totalprice as decimal(18,2))) as string) as double) AS revenue
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |                        (o_orderstatus, o_orderpriority))
        |ORDER BY status_label, priority_label, gid""".stripMargin)
  }
  private val q70Sql =
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS status_label,
       |  coalesce(o_orderpriority, 'ALL') AS priority_label,
       |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
       |  COUNT(*) AS n_orders, ${dsumSql("o_totalprice", 2)} AS revenue
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
       |                        (o_orderstatus, o_orderpriority))
       |ORDER BY status_label, priority_label, gid""".stripMargin

  /** Interval-overlap join — the true two-sided range join missing from
    * q16's static bucket lookup: user sessions (gap-sessionized, q19's
    * definition) joined to "busy hours" (hours whose event count exceeds
    * 1.2x the mean — an integer-exact n*H*5 > N*6 comparison, portable
    * across engines and scale factors). The Spark side is the SCALE path:
    * each session explodes into the hour buckets it spans (sessions are
    * bounded, so fan-out is small) and equi-joins the broadcast busy-hour
    * table — no theta join ever executes; the oracle states the same
    * semantics as a plain overlap theta join (s_start <= h_end AND
    * h_start <= s_end), which is provably identical for closed integer
    * intervals: s_start <= hb*3600+3599 iff floor(s_start/3600) <= hb, and
    * hb*3600 <= s_end iff hb <= floor(s_end/3600). */
  private def q72(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val sess = e
      .withColumn("prev", lag(col("sec"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev").isNull || col("sec") - col("prev") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("sec")).as("s_start"), max(col("sec")).as("s_end"))
    val h = e.groupBy(expr("sec div 3600").as("hb"))
      .agg(count(lit(1)).as("n_events"))
    val tot = h.agg(count(lit(1)).as("hh"), sum(col("n_events")).as("nn"))
    val busy = graft.Scalars.withScalar(h, tot)
      .filter(col("n_events") * col("hh") * 5 > col("nn") * 6)
      .select(col("hb"), col("n_events"))
    sess
      .withColumn("hb", explode(sequence(expr("s_start div 3600"), expr("s_end div 3600"))))
      .join(broadcast(busy), "hb")
      .select(col("user_id"), col("session_id").cast("int").as("session_id"),
        col("s_start"), col("s_end"),
        (col("hb") * 3600).as("hour_start"), col("n_events"))
      .orderBy("user_id", "session_id", "hour_start")
  }
  private val q72Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |g AS (
      |  SELECT user_id, event_id, sec,
      |    CASE WHEN LAG(sec) OVER w IS NULL OR sec - LAG(sec) OVER w > 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      |sess AS (
      |  SELECT user_id, sec,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
      |  FROM g),
      |si AS (
      |  SELECT user_id, session_id, MIN(sec) AS s_start, MAX(sec) AS s_end
      |  FROM sess GROUP BY user_id, session_id),
      |h AS (SELECT sec // 3600 AS hb, COUNT(*) AS n_events FROM e GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS hh, SUM(n_events) AS nn FROM h),
      |busy AS (SELECT hb, n_events FROM h, tot WHERE n_events * hh * 5 > nn * 6)
      |SELECT s.user_id, s.session_id, s.s_start, s.s_end,
      |  b.hb * 3600 AS hour_start, b.n_events
      |FROM si s JOIN busy b
      |  ON s.s_start <= b.hb * 3600 + 3599 AND b.hb * 3600 <= s.s_end
      |ORDER BY user_id, session_id, hour_start""".stripMargin

  /** Bloom-pruned semi join (the explicit form of AQE's runtime-filter
    * pruning, exposed as graft.operators.BloomFilter): the selective
    * build side (urgent finished orders) aggregates into an 8 KB bitmap
    * that broadcasts to the probe side, whose rows are pre-filtered by
    * codegen'd bit arithmetic BEFORE the shuffle — at scale the probe
    * shuffle carries only might-match rows. False positives are removed
    * by the exact semi join behind the filter, so the oracle is the plain
    * IN-subquery; the bloom provably cannot change results. */
  private def q74(s: SparkSession, d: String): DataFrame = {
    val build = t(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    graft.operators.BloomFilter
      .semiJoin(t(s, d, "lineitem"), "l_orderkey", build, "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity"), 2).as("total_qty"))
      .orderBy("l_returnflag")
  }
  private val q74Sql =
    s"""SELECT l_returnflag, COUNT(*) AS n_items,
       |  ${dsumSql("l_quantity", 2)} AS total_qty
       |FROM lineitem
       |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
       |                     WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F')
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Argmax/argmin AGGREGATES (max_by/min_by): per nation, the richest and
    * poorest customer plus the grand count — one hash aggregate with
    * partial/final merge, no window sort anywhere (the aggregate dual of
    * q57's first/nth/last window forms and q43's correlated-subquery max).
    * Ordering key is struct(acctbal, custkey) so ties break
    * deterministically INSIDE the aggregate; the oracle states the same
    * winner via ROW_NUMBER with the identical tiebreak (DuckDB 1.0's
    * arg_max has no composite-key form). */
  private def q76(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer")
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_customers"),
        max_by(col("c_custkey"), struct(col("c_acctbal"), col("c_custkey"))).as("richest_cust"),
        max(col("c_acctbal")).as("max_bal"),
        min_by(col("c_custkey"), struct(col("c_acctbal"), col("c_custkey"))).as("poorest_cust"),
        min(col("c_acctbal")).as("min_bal"))
      .orderBy("c_nationkey")
  }
  private val q76Sql =
    """WITH rich AS (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey DESC) AS rd,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal ASC, c_custkey ASC) AS ra
      |  FROM customer),
      |agg AS (
      |  SELECT c_nationkey, COUNT(*) AS n_customers,
      |    MAX(c_acctbal) AS max_bal, MIN(c_acctbal) AS min_bal
      |  FROM customer GROUP BY c_nationkey)
      |SELECT a.c_nationkey, a.n_customers,
      |  r.c_custkey AS richest_cust, a.max_bal,
      |  p.c_custkey AS poorest_cust, a.min_bal
      |FROM agg a
      |JOIN rich r ON a.c_nationkey = r.c_nationkey AND r.rd = 1
      |JOIN rich p ON a.c_nationkey = p.c_nationkey AND p.ra = 1
      |ORDER BY a.c_nationkey""".stripMargin

  /** Conditional-aggregate surface (count_if / bool_and / bool_or /
    * filtered sums) — predicates aggregated directly in one hash-agg pass,
    * no pre-pivot or self-join. DuckDB states the same via FILTER clauses
    * and its bool_and/bool_or. */
  private def q77(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        count_if(col("o_orderstatus") === "F").as("n_finished"),
        dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(lit(0.0)), 2).as("finished_revenue"),
        bool_and(col("o_totalprice") > 0.0).as("all_positive"),
        bool_or(col("o_totalprice") > 400000.0).as("any_jumbo"))
      .orderBy("o_orderpriority")
  }
  private val q77Sql =
    s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
       |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       |  ${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END", 2)} AS finished_revenue,
       |  bool_and(o_totalprice > 0.0) AS all_positive,
       |  bool_or(o_totalprice > 400000.0) AS any_jumbo
       |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Exact distributed second-moment statistics: Pearson correlation and
    * least-squares slope/intercept of (quantity, extendedprice) per return
    * flag, from five DECIMAL-exact sums (n, Σx, Σy, Σxy, Σx², Σy²) — the
    * only shuffle is the hash agg of exact partials, so the result is
    * independent of partitioning/AQE re-plans (Spark's built-in corr()
    * accumulates doubles in partition order and is NOT reproducible at
    * scale). Each sum crosses to double through the string bridge
    * (Num.d2d), and the remaining arithmetic is identically-parenthesized
    * IEEE double ops — division and sqrt are correctly rounded, so both
    * engines produce bit-identical statistics. */
  private def q79(s: SparkSession, d: String): DataFrame = {
    val x = dec(col("l_quantity"), 2)
    val y = dec(col("l_extendedprice"), 2)
    val sums = t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        d2d(sum(x)).as("sx"), d2d(sum(y)).as("sy"),
        d2d(sum(x * y)).as("sxy"),
        d2d(sum(x * x)).as("sxx"), d2d(sum(y * y)).as("syy"))
    sums
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dy", col("n") * col("syy") - col("sy") * col("sy"))
      .select(col("l_returnflag"), col("n").cast("bigint").as("n_items"),
        (col("num") / sqrt(col("dx") * col("dy"))).as("corr_qty_price"),
        (col("num") / col("dx")).as("slope"),
        ((col("sy") - (col("num") / col("dx")) * col("sx")) / col("n")).as("intercept"))
      .orderBy("l_returnflag")
  }
  private val q79Sql = {
    val sx = d2dSql("SUM(CAST(l_quantity AS DECIMAL(18,2)))")
    val sy = d2dSql("SUM(CAST(l_extendedprice AS DECIMAL(18,2)))")
    val sxy = d2dSql("SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))")
    val sxx = d2dSql("SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)))")
    val syy = d2dSql("SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))")
    s"""WITH sums AS (
       |  SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
       |    $sx AS sx, $sy AS sy, $sxy AS sxy, $sxx AS sxx, $syy AS syy
       |  FROM lineitem GROUP BY l_returnflag),
       |m AS (
       |  SELECT l_returnflag, n, sx, sy,
       |    n * sxy - sx * sy AS num,
       |    n * sxx - sx * sx AS dx,
       |    n * syy - sy * sy AS dy
       |  FROM sums)
       |SELECT l_returnflag, CAST(n AS BIGINT) AS n_items,
       |  num / sqrt(dx * dy) AS corr_qty_price,
       |  num / dx AS slope,
       |  (sy - (num / dx) * sx) / n AS intercept
       |FROM m ORDER BY l_returnflag""".stripMargin
  }

  /** Pareto 80/20: the smallest prefix of customers (by revenue, ties by
    * custkey) that covers 80% of total revenue. The keep rule is
    * (cum - rev) * 5 < total * 4 — "the prefix BEFORE this row hadn't
    * reached 80% yet" — evaluated entirely in DECIMAL (cumulative window
    * sum of exact decimals, integer scaling instead of a 0.8 double), so
    * the crossing row is engine-exact. The global sort is over the
    * customer AGGREGATE (one row per customer), never the fact table. */
  private def q80(s: SparkSession, d: String): DataFrame = {
    // Materialized once: GlobalRank evaluates its input in three branches
    // (boundaries, counts, window) — without the checkpoint this per-
    // customer aggregation would re-shuffle orders three times.
    val rev = t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"), 2)).as("rev"))
      .localCheckpoint(true)
    // Scale-safe form of the running sum: bucketed global rank + exact
    // decimal prefix sums (graft.operators.GlobalRank) instead of an
    // unpartitioned window — one row per customer is still billions of
    // rows at 100 TB. The offset+local running sum is cast back to the
    // plain window sum's decimal type so the emitted strings (and thus
    // the d2d doubles) are unchanged.
    val total = rev.agg(sum(col("rev")).cast("decimal(28,2)").as("total"))
    val ranked = GlobalRank.withRank(rev, col("rev"), descending = true,
        tieBreakers = Seq(col("o_custkey")), rnName = "rn",
        prefixSum = Some((col("rev"), "cum0")))
      .withColumn("cum", col("cum0").cast("decimal(28,2)"))
    graft.Scalars.withScalar(ranked, total)
      .filter((col("cum") - col("rev")) * 5 < col("total") * 4)
      .withColumn("rnk", col("rn").cast("int"))
      .select(col("o_custkey"), d2d(col("rev")).as("revenue"),
        d2d(col("cum")).as("cum_revenue"), col("rnk"))
      .orderBy("rnk")
  }
  private val q80Sql =
    """WITH rev AS (
      |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY o_custkey),
      |c AS (
      |  SELECT o_custkey, rev,
      |    SUM(rev) OVER (ORDER BY rev DESC, o_custkey
      |                   ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(rev) OVER () AS total,
      |    CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS INTEGER) AS rnk
      |  FROM rev)
      |SELECT o_custkey,
      |  CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
      |  CAST(CAST(cum AS VARCHAR) AS DOUBLE) AS cum_revenue, rnk
      |FROM c WHERE (cum - rev) * 5 < total * 4
      |ORDER BY rnk""".stripMargin

  /** Time-weighted average (step-function TWA): each event's value holds
    * until the user's next event; TWA = Σ value·Δt / (last − first). The
    * per-interval contribution is DECIMAL(value) × BIGINT(Δt) — exact, so
    * the aggregation is order-independent (a double Σ value·Δt would
    * drift under shuffle-merge reordering); only the final division runs
    * in doubles (correctly rounded, engine-identical). Single-event users
    * (zero span) are excluded. One window pass + one hash agg, all
    * partitioned by user. */
  private def q81(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    t(s, d, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), dec(col("value"), 6).as("v"))
      .withColumn("nxt", lead(col("sec"), 1).over(w))
      .withColumn("contrib", col("v") * (col("nxt") - col("sec")))
      .groupBy(col("user_id"))
      .agg(sum(col("contrib")).as("total"),
        (max(col("sec")) - min(col("sec"))).as("span"),
        count(lit(1)).as("n_events"))
      .filter(col("span") > 0)
      .select(col("user_id"), col("n_events"), col("span"),
        (d2d(col("total")) / col("span")).as("twa_value"))
      .orderBy("user_id")
  }
  private val q81Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |    CAST(value AS DECIMAL(18,6)) AS v
      |  FROM events),
      |g AS (
      |  SELECT user_id, sec, v,
      |    LEAD(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS nxt
      |  FROM e),
      |a AS (
      |  SELECT user_id, SUM(v * (nxt - sec)) AS total,
      |    MAX(sec) - MIN(sec) AS span, COUNT(*) AS n_events
      |  FROM g GROUP BY user_id)
      |SELECT user_id, n_events, span,
      |  CAST(CAST(total AS VARCHAR) AS DOUBLE) / span AS twa_value
      |FROM a WHERE span > 0 ORDER BY user_id""".stripMargin

  /** Geographic rollup — the vw_geographic_analysis BI-view shape
    * (complete_data_pipeline_fixed.py:281-291; Marts.geographicAnalysis is
    * the domain twin): fact grouped by the geography of its dimension
    * chain, volume-ordered. Join strategy is per-dim: customer is
    * fact-scale (NOT broadcast — shuffle join, AQE-managed), nation is the
    * genuinely small dim and broadcasts. Decimal-exact avgs via Num. */
  private def q82(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_totalprice"))
      .join(t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"), col("c_acctbal")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation").select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("city"))
      .agg(
        count(lit(1)).as("total_orders"),
        davg(col("o_totalprice"), 2).as("avg_order_value"),
        davg(col("c_acctbal"), 4).as("avg_acctbal"),
        countDistinct(col("o_custkey")).as("active_customers"))
      .orderBy(col("total_orders").desc, col("city"))
  }
  private val q82Sql =
    s"""SELECT n_name AS city, COUNT(*) AS total_orders,
       |  ${davgSql("o_totalprice", 2)} AS avg_order_value,
       |  ${davgSql("c_acctbal", 4)} AS avg_acctbal,
       |  COUNT(DISTINCT o_custkey) AS active_customers
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |            JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name
       |ORDER BY total_orders DESC, city""".stripMargin

  private val q48Sql =
    """SELECT c_custkey,
      |  nullif(c_mktsegment, 'MACHINERY') AS seg_or_null,
      |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'REDACTED') AS seg_coalesced,
      |  greatest(c_acctbal, CAST(0.0 AS DOUBLE)) AS bal_floor,
      |  least(c_acctbal, CAST(5000.0 AS DOUBLE)) AS bal_cap,
      |  c_mktsegment IS NOT DISTINCT FROM 'MACHINERY' AS is_machinery
      |FROM customer ORDER BY c_custkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q34_topn_join", q34, Some(q34Sql)),
    Q("q35_rollup", q35, Some(q35Sql)),
    Q("q51_cube", q51, Some(q51Sql)),
    Q("q55_salted_agg", q55, Some(q55Sql)),
    Q("q56_approx_stats", q56, Some(q56Sql)),
    Q("q57_value_windows", q57, Some(q57Sql)),
    Q("q58_array_topk", q58, Some(q58Sql)),
    Q("q59_session_window", q59, Some(q59Sql)),
    Q("q60_full_outer", q60, Some(q60Sql)),
    Q("q61_set_ops_all", q61, Some(q61Sql)),
    Q("q62_range_frame", q62, Some(q62Sql)),
    Q("q63_tpch_q5", q63, Some(q63Sql)),
    Q("q64_null_safe_join", q64, Some(q64Sql)),
    Q("q65_zorder_layout", q65, Some(q65Sql)),
    Q("q66_unpivot", q66, Some(q66Sql)),
    Q("q70_grouping_sets", q70, Some(q70Sql)),
    Q("q72_interval_join", q72, Some(q72Sql)),
    Q("q74_bloom_semi_join", q74, Some(q74Sql)),
    Q("q76_argmax_agg", q76, Some(q76Sql)),
    Q("q77_cond_agg", q77, Some(q77Sql)),
    Q("q79_exact_corr", q79, Some(q79Sql)),
    Q("q80_pareto", q80, Some(q80Sql)),
    Q("q81_time_weighted_avg", q81, Some(q81Sql)),
    Q("q82_geo_rollup", q82, Some(q82Sql)),
    Q("q36_semi_join", q36, Some(q36Sql)),
    Q("q37_pivot", q37, Some(q37Sql)),
    Q("q38_set_ops", q38, Some(q38Sql)),
    Q("q39_asof_join", q39, Some(q39Sql)),
    Q("q49_asof_native", q49, Some(q39Sql)),
    Q("q86_asof_forward", q86, Some(q86Sql)),
    Q("q87_monthly_trends", q87, Some(q87Sql)),
    Q("q44_percentiles", q44, Some(q44Sql)),
    Q("q45_rolling_frame", q45, Some(q45Sql)),
    Q("q46_distribution_windows", q46, Some(q46Sql)),
    Q("q47_date_arithmetic", q47, Some(q47Sql)),
    Q("q48_null_handling", q48, Some(q48Sql)))
}
