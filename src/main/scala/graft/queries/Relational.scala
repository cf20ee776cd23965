package graft.queries

import graft.Tables
import graft.operators.GlobalRank
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Num._

/** Relational operator surface (SURVEY.md §2.1–§2.7) re-expressed over the
  * driver testdata tables. Each query demonstrates one operator family from
  * the reference inventory; citations in each scaladoc point into
  * /root/reference.
  *
  * Scale notes: every dim join here broadcasts (region/nation/tier tables are
  * tiny); fact-fact joins shuffle on their keys; aggregates are partial
  * (map-side) by construction since all are built-in hash aggregates.
  */
object Relational extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** A1/A2 hash aggregate with conditional counts + exact stddev
    * (reference: mart_comprehensive_bank_analysis.sql:10-51,
    * phase2_transformation_pipeline.py:405-418). TPC-H Q1-shaped. */
  private def q01(s: SparkSession, d: String): DataFrame = {
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("1999-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        d2d(sum(dec(col("l_extendedprice"), 2) * (dec(lit(1), 2) - dec(col("l_discount"), 6))))
          .as("sum_disc_price"),
        davg(col("l_quantity"), 2).as("avg_qty"),
        davg(col("l_extendedprice"), 2).as("avg_price"),
        dstddev(col("l_quantity"), 2).as("std_qty"),
        count(when(col("l_quantity") > 25, 1)).as("big_qty_count"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }
  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity", 2)} AS sum_qty,
       |  ${dsumSql("l_extendedprice", 2)} AS sum_base_price,
       |  ${d2dSql("SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,6))))")} AS sum_disc_price,
       |  ${davgSql("l_quantity", 2)} AS avg_qty,
       |  ${davgSql("l_extendedprice", 2)} AS avg_price,
       |  ${dstddevSql("l_quantity", 2)} AS std_qty,
       |  COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS big_qty_count,
       |  COUNT(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-09-02'
       |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** P2/P3 predicate filters feeding a scan with pushdown (TPC-H Q6-shaped;
    * reference hand-pushes filters into extract SQL,
    * phase2_transformation_pipeline.py:71-80). */
  private def q02(s: SparkSession, d: String): DataFrame = {
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice"), 2) * dec(col("l_discount"), 6))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }
  private val q02Sql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** J1/J5/A9 star join: fact ⋈ broadcast dims, multi-column group
    * (reference BI views, complete_data_pipeline_fixed.py:269-291). */
  private def q03(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice"), 2).as("revenue"),
        davg(col("o_totalprice"), 2).as("avg_order_value"))
      .orderBy("r_name", "n_name")
  }
  private val q03Sql =
    s"""SELECT r_name, n_name, COUNT(*) AS n_orders,
       |  ${dsumSql("o_totalprice", 2)} AS revenue,
       |  ${davgSql("o_totalprice", 2)} AS avg_order_value
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Left join + null-filter / anti-join idiom (reference J1's
    * `WHERE bank_key IS NOT NULL` after LEFT,
    * complete_data_pipeline_fixed.py:254-256): customers with no orders. */
  private def q04(s: SparkSession, d: String): DataFrame = {
    val orders96 = t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val noOrders = t(s, d, "customer")
      .join(orders96, col("c_custkey") === col("o_custkey"), "left")
      .filter(col("o_orderkey").isNull)
    noOrders
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("quiet_customers"))
      .orderBy("n_name")
  }
  private val q04Sql =
    """SELECT n_name, COUNT(*) AS quiet_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** D2/D3 distinct projection for dim builds
    * (complete_data_pipeline_fixed.py:210-213, dim_bank.sql:16). */
  private def q05(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_mktsegment").as("segment"), col("n_name"))
      .orderBy("segment", "n_name")
  }
  private val q05Sql =
    """SELECT segment, n_name FROM (
      |  SELECT DISTINCT c_mktsegment AS segment, c_nationkey FROM customer
      |) s JOIN nation ON s.c_nationkey = n_nationkey
      |ORDER BY segment, n_name""".stripMargin

  /** D1 deterministic keep-first dedup: one row per l_orderkey, winner =
    * lowest l_linenumber (reference run_phase2_transformation.py:70-74 keeps
    * pandas file order; here the ordering column is explicit). */
  private def q06(s: SparkSession, d: String): DataFrame = {
    // l_linenumber is not unique within an order in this dataset; the full
    // tiebreak chain makes the keep-first winner deterministic (SURVEY §7.4.2).
    val w = Window.partitionBy(col("l_orderkey")).orderBy(
      col("l_linenumber"), col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    t(s, d, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
      .orderBy("l_orderkey")
  }
  private val q06Sql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
      |  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
      |         ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |           ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS rn
      |  FROM lineitem) t WHERE rn = 1 ORDER BY l_orderkey""".stripMargin

  /** W2 gapped RANK + per-group top-N
    * (phase2_transformation_pipeline.py:462, mart:131-132). */
  private def q07(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t(s, d, "customer")
      .withColumn("bal_rank", rank().over(w))
      .filter(col("bal_rank") <= 3)
      .select(col("c_nationkey"), col("bal_rank"), col("c_custkey"), col("c_acctbal"))
      .orderBy("c_nationkey", "bal_rank", "c_custkey")
  }
  private val q07Sql =
    """SELECT c_nationkey, CAST(bal_rank AS INTEGER) AS bal_rank, c_custkey, c_acctbal FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |         RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_rank
      |  FROM customer) t WHERE bal_rank <= 3
      |ORDER BY c_nationkey, bal_rank, c_custkey""".stripMargin

  /** W3/A5 aggregate-then-LAG trend (mart_comprehensive:91-107): monthly
    * revenue with prior-month delta. */
  private def q08(s: SparkSession, d: String): DataFrame = {
    val monthly = t(s, d, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(dsum(col("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
    val w = Window.orderBy(col("order_month"))
    monthly
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("revenue_delta", col("revenue") - col("prev_revenue"))
      .orderBy("order_month")
  }
  private val q08Sql =
    s"""SELECT order_month, revenue, n_orders,
       |  LAG(revenue, 1) OVER (ORDER BY order_month) AS prev_revenue,
       |  revenue - LAG(revenue, 1) OVER (ORDER BY order_month) AS revenue_delta
       |FROM (
       |  SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       |         ${dsumSql("o_totalprice", 2)} AS revenue, COUNT(*) AS n_orders
       |  FROM orders GROUP BY 1) m ORDER BY order_month""".stripMargin

  /** W1 surrogate-key assignment via global ROW_NUMBER over a tiny distinct
    * dim (complete_data_pipeline_fixed.py:150,186; dim_bank.sql:89). Safe
    * here (5 rows); for fact-scale keys see the scale note in SURVEY §7.4. */
  private def q09(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer")
      .select(col("c_mktsegment").as("segment")).distinct()
      .withColumn("segment_key", row_number().over(Window.orderBy(col("segment"))))
      .select(col("segment_key"), col("segment"))
      .orderBy("segment_key")
  }
  private val q09Sql =
    """SELECT CAST(ROW_NUMBER() OVER (ORDER BY segment) AS INTEGER) AS segment_key, segment
      |FROM (SELECT DISTINCT c_mktsegment AS segment FROM customer) t
      |ORDER BY segment_key""".stripMargin

  /** §2.7 string surface: trim/lower/upper/replace/substring/length/
    * split-count/concat_ws/LIKE (complete_data_pipeline_fixed.py:115-135,
    * dim_branch.sql:22-68, stg_raw_reviews.sql:36). */
  private def q10(s: SparkSession, d: String): DataFrame = {
    t(s, d, "part")
      .select(
        col("p_partkey"),
        lower(trim(col("p_name"))).as("name_norm"),
        upper(col("p_brand")).as("brand_up"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
        length(col("p_name")).as("name_len"),
        size(split(col("p_name"), " ")).as("n_words"),
        concat_ws("_", col("p_brand"), col("p_size").cast("string")).as("brand_size_id"),
        substring(col("p_type"), 1, 6).as("type_prefix"),
        regexp_replace(col("p_type"), " ", "_").as("type_slug"),
        col("p_name").contains("green").as("has_green"))
      .orderBy("p_partkey")
  }
  private val q10Sql =
    """SELECT p_partkey,
      |  lower(trim(p_name)) AS name_norm,
      |  upper(p_brand) AS brand_up,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
      |  CAST(length(p_name) AS INTEGER) AS name_len,
      |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
      |  p_brand || '_' || CAST(p_size AS VARCHAR) AS brand_size_id,
      |  substring(p_type, 1, 6) AS type_prefix,
      |  replace(p_type, ' ', '_') AS type_slug,
      |  contains(p_name, 'green') AS has_green
      |FROM part ORDER BY p_partkey""".stripMargin

  /** §2.7 date surface: date_key YYYYMMDD, extract family, PG-semantics DOW
    * (= Spark dayofweek-1), month/day names, weekend flag, date_trunc
    * (dim_date.sql:30-54, run_phase2_transformation.py:158-161). */
  private def q11(s: SparkSession, d: String): DataFrame = {
    val od = col("o_orderdate")
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        (year(od) * 10000 + month(od) * 100 + dayofmonth(od)).as("date_key"),
        year(od).as("yr"),
        quarter(od).as("qtr"),
        month(od).as("mo"),
        (dayofweek(od) - 1).as("dow"),
        date_format(od, "MMMM").as("month_name"),
        date_format(od, "EEEE").as("day_name"),
        dayofweek(od).isin(1, 7).as("is_weekend"),
        date_trunc("month", od).cast("date").as("month_start"),
        od.cast("date").as("order_date"))
      .orderBy("o_orderkey")
  }
  private val q11Sql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS INTEGER) AS date_key,
      |  CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      |  CAST(month(o_orderdate) AS INTEGER) AS mo,
      |  CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
      |  monthname(o_orderdate) AS month_name,
      |  dayname(o_orderdate) AS day_name,
      |  dayofweek(o_orderdate) IN (0, 6) AS is_weekend,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  CAST(o_orderdate AS DATE) AS order_date
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** §2.7 threshold CASE ladders — the reference's semantic core
    * (int_nlp_analytics.sql:10-79, stg_nlp_enriched_reviews.sql:68-83):
    * ordered, overlapping-range bucket assignment. */
  private def q12(s: SparkSession, d: String): DataFrame = {
    val tp = col("o_totalprice")
    val tier = when(tp >= 300000, "platinum")
      .when(tp >= 150000, "gold")
      .when(tp >= 50000, "silver")
      .otherwise("bronze")
    val prio = when(col("o_orderpriority").startsWith("1") ||
        col("o_orderpriority").startsWith("2"), "high")
      .when(col("o_orderpriority").startsWith("3"), "medium")
      .otherwise("low")
    t(s, d, "orders")
      .withColumn("price_tier", tier)
      .withColumn("priority_class", prio)
      .groupBy("price_tier", "priority_class")
      .agg(count(lit(1)).as("n_orders"), dsum(tp, 2).as("revenue"))
      .orderBy("price_tier", "priority_class")
  }
  private val q12Sql =
    s"""SELECT
       |  CASE WHEN o_totalprice >= 300000 THEN 'platinum'
       |       WHEN o_totalprice >= 150000 THEN 'gold'
       |       WHEN o_totalprice >= 50000 THEN 'silver'
       |       ELSE 'bronze' END AS price_tier,
       |  CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%' THEN 'high'
       |       WHEN o_orderpriority LIKE '3%' THEN 'medium'
       |       ELSE 'low' END AS priority_class,
       |  COUNT(*) AS n_orders, ${dsumSql("o_totalprice", 2)} AS revenue
       |FROM orders GROUP BY 1, 2 ORDER BY price_tier, priority_class""".stripMargin

  /** A6/A10 stats: distinct count, exact median (two-middle-rows definition,
    * deterministic across engines), deterministic stddev, min/max
    * (run_phase2_transformation.py:203-222). */
  private def q13(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events").select(col("value").cast("double").as("v"), col("user_id"))
    val base = e.agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"),
      dsum(col("v"), 6).as("total_value"),
      davg(col("v"), 6).as("avg_value"),
      dstddev(col("v"), 6).as("std_value"),
      min(col("v")).as("min_value"),
      max(col("v")).as("max_value"))
    // Exact median via the scale-safe two-pass global rank (bucketed
    // row_number — graft.operators.GlobalRank), never a single-partition
    // window over the fact table. Values at the two middle ranks are
    // well-defined under ties (any tie order sorts the same multiset);
    // n rides along from the rank's own bucket counts.
    val ranked = GlobalRank.withRank(e, col("v"), descending = false,
      tieBreakers = Seq.empty, rnName = "rn", totalName = Some("n"))
    // Integer division on purpose: Spark `/` on longs is fractional, so
    // (n+1)/2 = 5000.5 would never equal rn on even counts; floor() selects
    // both middle rows exactly like the oracle's `//`.
    val med = ranked
      .filter(col("rn") === floor((col("n") + 1) / 2) ||
        col("rn") === floor((col("n") + 2) / 2))
      .agg(davg(col("v"), 6).as("median_value"))
    graft.Scalars.withScalar(base, med)
  }
  private val q13Sql =
    s"""WITH r AS (
       |  SELECT CAST(value AS DOUBLE) AS v, user_id,
       |         ROW_NUMBER() OVER (ORDER BY CAST(value AS DOUBLE)) AS rn,
       |         COUNT(*) OVER () AS n
       |  FROM events),
       |med AS (
       |  SELECT ${davgSql("v", 6)} AS median_value
       |  FROM r WHERE rn = (n+1)//2 OR rn = (n+2)//2),
       |base AS (
       |  SELECT COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
       |    ${dsumSql("v", 6)} AS total_value,
       |    ${davgSql("v", 6)} AS avg_value,
       |    ${dstddevSql("v", 6)} AS std_value,
       |    MIN(v) AS min_value, MAX(v) AS max_value
       |  FROM r)
       |SELECT base.*, med.median_value FROM base, med""".stripMargin

  /** A7 ordered string aggregation (phase2_transformation_pipeline.py:427
    * STRING_AGG(DISTINCT …)): deterministic via sort before join. */
  private def q14(s: SparkSession, d: String): DataFrame = {
    t(s, d, "nation")
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        array_join(array_sort(collect_set(col("n_name"))), ", ").as("nations"),
        countDistinct(col("n_name")).as("n_nations"))
      .orderBy("r_name")
  }
  private val q14Sql =
    """SELECT r_name,
      |  string_agg(DISTINCT n_name, ', ' ORDER BY n_name) AS nations,
      |  COUNT(DISTINCT n_name) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** dim_date generate_series spine with season/weekend enrichment
    * (dim_date.sql:17-81, complete_data_pipeline_fixed.py:169-171). */
  private def q15(s: SparkSession, d: String): DataFrame = {
    val spine = s.sql(
      "SELECT explode(sequence(to_date('2024-01-01'), to_date('2025-12-31'), interval 1 day)) AS full_date")
    val fd = col("full_date")
    val season = when(month(fd).isin(12, 1, 2), "Winter")
      .when(month(fd).isin(3, 4, 5), "Spring")
      .when(month(fd).isin(6, 7, 8), "Summer")
      .otherwise("Autumn")
    spine.select(
      fd,
      (year(fd) * 10000 + month(fd) * 100 + dayofmonth(fd)).as("date_key"),
      year(fd).as("yr"), quarter(fd).as("qtr"), month(fd).as("mo"),
      (dayofweek(fd) - 1).as("dow"),
      dayofweek(fd).isin(1, 7).as("is_weekend"),
      season.as("season"))
      .orderBy("full_date")
  }
  private val q15Sql =
    """SELECT full_date,
      |  CAST(year(full_date)*10000 + month(full_date)*100 + day(full_date) AS INTEGER) AS date_key,
      |  CAST(year(full_date) AS INTEGER) AS yr,
      |  CAST(quarter(full_date) AS INTEGER) AS qtr,
      |  CAST(month(full_date) AS INTEGER) AS mo,
      |  CAST(dayofweek(full_date) AS INTEGER) AS dow,
      |  dayofweek(full_date) IN (0, 6) AS is_weekend,
      |  CASE WHEN month(full_date) IN (12,1,2) THEN 'Winter'
      |       WHEN month(full_date) IN (3,4,5) THEN 'Spring'
      |       WHEN month(full_date) IN (6,7,8) THEN 'Summer'
      |       ELSE 'Autumn' END AS season
      |FROM (SELECT CAST(generate_series AS DATE) AS full_date
      |      FROM generate_series(DATE '2024-01-01', DATE '2025-12-31', INTERVAL 1 DAY)) t
      |ORDER BY full_date""".stripMargin

  /** J7 range/theta bucket join: value → [lo, hi) tier via broadcast
    * non-equi join (complete_data_pipeline_fixed.py:229-235 sentiment-range
    * lookup generalized to a real range join). */
  private def q16(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tiers = Seq(
      ("t1_micro", 0.0, 10.0), ("t2_small", 10.0, 50.0),
      ("t3_mid", 50.0, 150.0), ("t4_large", 150.0, 1e9))
      .toDF("tier", "lo", "hi")
    t(s, d, "events")
      .join(broadcast(tiers), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("total_value"))
      .orderBy("tier")
  }
  private val q16Sql =
    s"""SELECT tier, COUNT(*) AS n_events, ${dsumSql("value", 6)} AS total_value
       |FROM events JOIN (VALUES
       |  ('t1_micro', 0.0, 10.0), ('t2_small', 10.0, 50.0),
       |  ('t3_mid', 50.0, 150.0), ('t4_large', 150.0, 1e9)) t(tier, lo, hi)
       |  ON value >= lo AND value < hi
       |GROUP BY tier ORDER BY tier""".stripMargin

  /** Explode/flatten + count (morocco_banks_collection.py:96-101 nested
    * reviews flatten → A12 aggregate): token frequencies. */
  private def q17(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
  }
  private val q17Sql =
    """SELECT token, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      |GROUP BY token ORDER BY cnt DESC, token""".stripMargin

  /** §2.7 JSON surface: extract scalar from a JSON string column
    * (topic_distribution JSONB round-trip, nlp_processor_simple.py:280,
    * fact_reviews.sql:140). */
  private def q18(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("prop_k"),
        expr("CAST(CAST(get_json_object(props, '$.k') AS INT) div 10 AS INT)").as("k_bucket"))
      .orderBy("event_id")
  }
  private val q18Sql =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
      |  CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) // 10 AS INTEGER) AS k_bucket
      |FROM events ORDER BY event_id""".stripMargin

  /** Gap-based sessionization over the event stream (batch form; streaming
    * twin in graft.streaming). 30-min inactivity gap; per-user session
    * stats. Window+lag+cumulative-sum — no reference analog, part of the
    * large-scale pipeline surface. */
  private def q19(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val sessions = e
      .withColumn("prev_sec", lag(col("sec"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_sec").isNull || col("sec") - col("prev_sec") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), (max(col("sec")) - min(col("sec"))).as("dur"))
    sessions
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("total_events"),
        (sum(col("dur")).cast("double") / count(lit(1))).as("avg_session_sec"),
        max(col("dur")).as("max_session_sec"))
      .orderBy("user_id")
  }
  private val q19Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |g AS (
      |  SELECT user_id, event_id, sec,
      |    CASE WHEN LAG(sec) OVER w IS NULL OR sec - LAG(sec) OVER w > 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      |sess AS (
      |  SELECT user_id, sec,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |                      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM g),
      |per AS (
      |  SELECT user_id, session_id, COUNT(*) AS n_events,
      |         MAX(sec) - MIN(sec) AS dur
      |  FROM sess GROUP BY user_id, session_id)
      |SELECT user_id, COUNT(*) AS n_sessions,
      |  CAST(SUM(n_events) AS BIGINT) AS total_events,
      |  CAST(SUM(dur) AS DOUBLE) / COUNT(*) AS avg_session_sec,
      |  MAX(dur) AS max_session_sec
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Event-time tumbling window aggregate (batch twin of the Structured
    * Streaming path in graft.streaming; no reference analog — reference is
    * daily-batch only, SURVEY §2.9). */
  private def q20(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events")
      .groupBy(
        date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("total_value"))
      .orderBy("hour_start", "event_type")
  }
  private val q20Sql =
    s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
       |  COUNT(*) AS n_events, ${dsumSql("value", 6)} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q01_pricing_summary", q01, Some(q01Sql)),
    Q("q02_filter_pushdown", q02, Some(q02Sql)),
    Q("q03_star_join_agg", q03, Some(q03Sql)),
    Q("q04_anti_join", q04, Some(q04Sql)),
    Q("q05_distinct_dim", q05, Some(q05Sql)),
    Q("q06_dedup_keep_first", q06, Some(q06Sql)),
    Q("q07_window_rank_topn", q07, Some(q07Sql)),
    Q("q08_window_lag_trend", q08, Some(q08Sql)),
    Q("q09_surrogate_keys", q09, Some(q09Sql)),
    Q("q10_string_ops", q10, Some(q10Sql)),
    Q("q11_date_ops", q11, Some(q11Sql)),
    Q("q12_case_ladder", q12, Some(q12Sql)),
    Q("q13_stats_median", q13, Some(q13Sql)),
    Q("q14_string_agg", q14, Some(q14Sql)),
    Q("q15_date_spine", q15, Some(q15Sql)),
    Q("q16_range_bucket_join", q16, Some(q16Sql)),
    Q("q17_explode_tokens", q17, Some(q17Sql)),
    Q("q18_json_extract", q18, Some(q18Sql)),
    Q("q19_sessionize", q19, Some(q19Sql)),
    Q("q20_tumbling_window", q20, Some(q20Sql)))
}
