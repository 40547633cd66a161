package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._
import TextOps.tokens

/** SQL-surface completeness pack: analytic-window extras (ntile /
  * percent_rank / cume_dist), GROUPING SETS with grouping flags, and the
  * array / string / date scalar-function surface — each oracle-gated vs
  * DuckDB.
  *
  * Scale notes: every window here is PARTITIONED (per-nation, per-priority)
  * — the global-ORDER-BY ntile shape is deliberately avoided; at 100 TB a
  * global quantile assignment is a range-partitioned sort or an
  * approx-quantile broadcast, never one reducer. The scalar-function
  * queries are narrow per-row projections (whole-stage codegen, zero
  * shuffles beyond the final presentation sort on an already-small result).
  */
object SqlSurface {

  /** Per-nation customer balance deciles (partitioned ntile) aggregated to
    * one row per (nation, decile). Tie-broken on c_custkey so tile
    * assignment is total-order deterministic in both engines.
    */
  def qWindowNtile(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    cust
      .select(col("c_nationkey"), col("c_acctbal"),
        ntile(10).over(w).as("decile"))
      .groupBy(col("c_nationkey"), col("decile"))
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("c_nationkey"), col("decile"))
  }

  val qWindowNtileSql: String =
    """WITH d AS (
      |  SELECT c_nationkey, c_acctbal,
      |    ntile(10) OVER (PARTITION BY c_nationkey
      |                    ORDER BY c_acctbal, c_custkey) AS decile
      |  FROM customer
      |)
      |SELECT c_nationkey, decile, count(*) AS n,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Top-1%-by-value orders per priority via cume_dist, with percent_rank
    * alongside. Both are exact rationals (k/n, (rank-1)/(n-1)) computed with
    * one IEEE division in either engine; the filter runs on the UNROUNDED
    * value and only the output is rounded.
    */
  def qWindowDist(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord
      .select(col("o_orderpriority"), col("o_orderkey"),
        percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .filter(col("cd") <= 0.01)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("pr"), 6).as("pct_rank"), round(col("cd"), 6).as("cume"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  val qWindowDistSql: String =
    """WITH d AS (
      |  SELECT o_orderpriority, o_orderkey,
      |    percent_rank() OVER (PARTITION BY o_orderpriority
      |                         ORDER BY o_totalprice DESC, o_orderkey) AS pr,
      |    cume_dist() OVER (PARTITION BY o_orderpriority
      |                      ORDER BY o_totalprice DESC, o_orderkey) AS cd
      |  FROM orders
      |)
      |SELECT o_orderpriority, o_orderkey,
      |  round(pr, 6) AS pct_rank, round(cd, 6) AS cume
      |FROM d WHERE cd <= 0.01
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Explicit GROUPING SETS ((flag, status), (flag), ()) with per-column
    * grouping flags — the general form behind the rollup/cube queries.
    * Nulls introduced by the grouping are coalesced to 'ALL' so ordering
    * never depends on engine null-sort defaults.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    li.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
        grouping(col("l_returnflag")).cast(LongType).as("g_flag"),
        grouping(col("l_linestatus")).cast(LongType).as("g_status"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("g_flag"), col("g_status"), col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  val qGroupingSetsSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
      |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
      |  count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Array-function surface over document token arrays: size, distinct
    * count (sizes only — DuckDB's list_distinct does not preserve element
    * order), membership, element-wise transform + max, slice + join.
    */
  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(
        col("doc_id"),
        size(col("t")).cast(LongType).as("n_tokens"),
        size(array_distinct(col("t"))).cast(LongType).as("n_distinct"),
        array_contains(col("t"), "data").as("has_data"),
        array_max(transform(col("t"), s => length(s).cast(LongType))).as("max_tok_len"),
        concat_ws(" ", slice(col("t"), 1, 2)).as("first2"))
      .orderBy(col("doc_id"))
  }

  val qArrayFuncsSql: String =
    """SELECT doc_id,
      |  len(t) AS n_tokens,
      |  len(list_distinct(t)) AS n_distinct,
      |  list_contains(t, 'data') AS has_data,
      |  list_max(list_transform(t, s -> CAST(length(s) AS BIGINT))) AS max_tok_len,
      |  array_to_string(t[1:2], ' ') AS first2
      |FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** String-function surface over `part`: case, substring, pad, translate,
    * position, reverse, and edit distance — all codegen'd built-ins on both
    * sides.
    */
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame = {
    val part = table(spark, dir, "part")
    part
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 10).as("prefix10"),
        lpad(col("p_partkey").cast(StringType), 8, "0").as("padded_key"),
        translate(col("p_brand"), "Brand#", "brnd-0").as("xbrand"),
        instr(col("p_name"), "a").cast(LongType).as("first_a"),
        reverse(col("p_type")).as("rtype"),
        levenshtein(substring(col("p_name"), 1, 8), substring(col("p_type"), 1, 8))
          .cast(LongType).as("edit_dist"))
      .orderBy(col("p_partkey"))
  }

  val qStringFuncsSql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS uname,
      |  substring(p_name, 1, 10) AS prefix10,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
      |  translate(p_brand, 'Brand#', 'brnd-0') AS xbrand,
      |  CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
      |  reverse(p_type) AS rtype,
      |  CAST(levenshtein(substring(p_name, 1, 8), substring(p_type, 1, 8)) AS BIGINT) AS edit_dist
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Date/time-function surface over order dates: calendar fields (ISO
    * week, day-of-week normalized to Spark's 1=Sunday), last_day,
    * add_months (end-of-month clamping matches DuckDB's +INTERVAL), day
    * arithmetic, and month truncation. Sampled every-100th key to keep the
    * presentation sort small.
    */
  def qDateFuncs(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    val d = to_date(col("o_orderdate"))
    ord
      .filter(col("o_orderkey") % 100 === 0)
      .select(
        col("o_orderkey"),
        d.as("odate"),
        year(d).cast(LongType).as("yr"),
        quarter(d).cast(LongType).as("qtr"),
        month(d).cast(LongType).as("mth"),
        dayofmonth(d).cast(LongType).as("dom"),
        dayofweek(d).cast(LongType).as("dow"),
        dayofyear(d).cast(LongType).as("doy"),
        weekofyear(d).cast(LongType).as("isoweek"),
        last_day(d).as("month_end"),
        add_months(d, 3).as("plus3m"),
        date_add(d, 45).as("plus45d"),
        trunc(d, "month").as("month_start"))
      .orderBy(col("o_orderkey"))
  }

  val qDateFuncsSql: String =
    """SELECT o_orderkey,
      |  d AS odate,
      |  year(d) AS yr,
      |  quarter(d) AS qtr,
      |  month(d) AS mth,
      |  CAST(dayofmonth(d) AS BIGINT) AS dom,
      |  CAST(extract(dow FROM d) + 1 AS BIGINT) AS dow,
      |  CAST(dayofyear(d) AS BIGINT) AS doy,
      |  CAST(weekofyear(d) AS BIGINT) AS isoweek,
      |  last_day(d) AS month_end,
      |  CAST(d + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  d + 45 AS plus45d,
      |  date_trunc('month', d) AS month_start
      |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
      |WHERE o_orderkey % 100 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** RANGE-frame rolling aggregate: 7-day trailing revenue over the daily
    * series — the frame is VALUE-based (`rangeBetween` on epoch days), so
    * gaps in the calendar shrink the window, unlike a 7-ROW frame. Exact
    * decimal sums; one partitioned-window pass over the (tiny) daily
    * aggregate.
    */
  def qRollingRange(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    val daily = ord
      .groupBy(to_date(col("o_orderdate")).as("day"), col("o_orderpriority"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(datediff(col("day"), lit("1970-01-01")))
      .rangeBetween(-6, Window.currentRow)
    daily
      .select(col("o_orderpriority"), col("day"),
        col("rev").cast(DoubleType).as("day_rev"),
        sum(col("rev")).over(w).cast(DoubleType).as("rolling_7d"))
      .orderBy(col("o_orderpriority"), col("day"))
  }

  val qRollingRangeSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, o_orderpriority,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT o_orderpriority, day,
      |  CAST(rev AS DOUBLE) AS day_rev,
      |  CAST(sum(rev) OVER (PARTITION BY o_orderpriority ORDER BY day
      |    RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_7d
      |FROM daily
      |ORDER BY o_orderpriority, day""".stripMargin

  /** Full outer join surface with BOTH unmatched sides genuinely populated:
    * machinery-segment customers vs urgent-order counts. Customers in the
    * segment with no urgent orders dangle left; urgent-order customers
    * outside the segment dangle right (the synthetic data gives every
    * customer at least one order, so the unfiltered join would never
    * exercise the outer semantics). Coalesced key, sentinel name,
    * deterministic order.
    */
  def qFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
      .filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey"), col("c_name"))
    val byCust = table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    cust.join(byCust, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("c_name"), lit("<no-customer>")).as("name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("custkey"))
  }

  val qFullOuterSql: String =
    """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
      |  coalesce(c.c_name, '<no-customer>') AS name,
      |  coalesce(o.n_orders, 0) AS n_orders
      |FROM (SELECT c_custkey, c_name FROM customer
      |      WHERE c_mktsegment = 'MACHINERY') c
      |FULL OUTER JOIN (
      |  SELECT o_custkey, count(*) AS n_orders FROM orders
      |  WHERE o_orderpriority = '1-URGENT' GROUP BY 1) o
      |ON c.c_custkey = o.o_custkey
      |ORDER BY custkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rolling_range" -> (qRollingRange _),
    "q_full_outer" -> (qFullOuter _),
    "q_window_ntile" -> (qWindowNtile _),
    "q_window_dist" -> (qWindowDist _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_date_funcs" -> (qDateFuncs _))

  def oracle: Map[String, String] = Map(
    "q_rolling_range" -> qRollingRangeSql,
    "q_full_outer" -> qFullOuterSql,
    "q_window_ntile" -> qWindowNtileSql,
    "q_window_dist" -> qWindowDistSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_array_funcs" -> qArrayFuncsSql,
    "q_string_funcs" -> qStringFuncsSql,
    "q_date_funcs" -> qDateFuncsSql)
}
