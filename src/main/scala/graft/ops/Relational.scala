package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/** Relational operator surface over the TPC-H-ish testdata (SURVEY.md
  * §2.5-2.7 extension mapping): aggregations, multi-way joins, broadcast
  * joins, semi/anti joins, window functions, set ops, rollup, top-k.
  *
  * Every query ends in a total ORDER BY so the driver's hash compare is
  * deterministic; money aggregates use the exact-decimal construction from
  * [[Tables]].
  *
  * Scale design: fact-fact joins shuffle on their keys and rely on AQE;
  * dimension joins (`region`/`nation`/`supplier`/`part`/`customer`) are
  * explicitly `broadcast()` so no shuffle of the fact side happens at any
  * scale factor; aggregates are partial (map-side combine) by construction.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: full-scan groupBy aggregate. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumExpr(discPrice(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
        dsumExpr(charge(col("l_extendedprice"), col("l_discount"), col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_extendedprice) AS DOUBLE) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_discount) AS DOUBLE) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: shuffled fact-fact join + broadcast customer dim,
    * top-10 revenue orders for one market segment.
    */
  def q03TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = table(spark, dir, "orders")
    val li = table(spark, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(dsumExpr(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style: 6-way join, dims broadcast, revenue per nation. */
  def q05LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val region = table(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = table(spark, dir, "nation")
    val cust = table(spark, dir, "customer")
    val supp = table(spark, dir, "supplier")
    val ord = table(spark, dir, "orders")
    val li = table(spark, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsumExpr(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q05Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Broadcast dim join: per-brand shipped volume. */
  def qBrandVolume(spark: SparkSession, dir: String): DataFrame = {
    val part = table(spark, dir, "part")
    val li = table(spark, dir, "lineitem")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))
  }

  val qBrandVolumeSql: String =
    """SELECT p_brand,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** Left-semi join (EXISTS): orders having a high-quantity line. */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    val bigLines = table(spark, dir, "lineitem").filter(col("l_quantity") >= 45)
    ord.join(bigLines, ord("o_orderkey") === bigLines("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val qSemiJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Left-anti join (NOT EXISTS): orders with no high-quantity line. */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    val bigLines = table(spark, dir, "lineitem").filter(col("l_quantity") >= 48)
    ord.join(bigLines, ord("o_orderkey") === bigLines("l_orderkey"), "left_anti")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val qAntiJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Window ranking: top-3 orders per customer (row_number ≤ 3). */
  def qWindowTop3(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val qWindowTop3Sql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Running (cumulative) exact-decimal sum per supplier over ship time. */
  def qRunningSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem").filter(col("l_suppkey") <= 3)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(dec(col("l_quantity"))).over(w).cast(DoubleType).as("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  val qRunningSupplierSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem
      |WHERE l_suppkey <= 3
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** Set ops: big spenders EXCEPT one segment, UNION-distinct small sample,
    * INTERSECT — exercised in one query tree.
    */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
    val ord = table(spark, dir, "orders")
    val bigSpenders = ord.filter(col("o_totalprice") > 400000).select(col("o_custkey").as("key"))
    val building = cust.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("key"))
    val machinery = cust.filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey").as("key"))
    bigSpenders.intersect(building.union(machinery))
      .orderBy(col("key"))
  }

  val qSetOpsSql: String =
    """(SELECT o_custkey AS key FROM orders WHERE o_totalprice > 400000)
      |INTERSECT
      |(SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
      | UNION
      | SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'MACHINERY')
      |ORDER BY key""".stripMargin

  /** EXCEPT (distinct) — customers that ordered but never with high priority. */
  def qExcept(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    ord.select(col("o_custkey").as("key"))
      .except(ord.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("key")))
      .orderBy(col("key"))
  }

  val qExceptSql: String =
    """(SELECT o_custkey AS key FROM orders)
      |EXCEPT
      |(SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY key""".stripMargin

  /** ROLLUP over (returnflag, linestatus) with ALL labels. */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  val qRollupSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** CUBE over (orderstatus, orderpriority). */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    ord.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n"), col("sum_price"))
      .orderBy(col("orderstatus"), col("orderpriority"))
  }

  val qCubeSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
      |       coalesce(o_orderpriority, 'ALL') AS orderpriority,
      |       count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY orderstatus, orderpriority""".stripMargin

  /** Global top-k → Spark plans TakeOrderedAndProject (no full sort). */
  def qTopKOrders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  val qTopKOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** distinct (op-12 analogue on the testdata). */
  def qDistinctSegments(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .select(col("c_mktsegment")).distinct().orderBy(col("c_mktsegment"))

  val qDistinctSegmentsSql: String =
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"

  /** Monthly order rollup on a timestamp column (date_trunc parity). */
  def qOrdersPerMonth(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    ord.groupBy(date_trunc("month", col("o_orderdate")).cast(DateType).as("month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("month"))
  }

  val qOrdersPerMonthSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY 1 ORDER BY month""".stripMargin

  /** TPC-H Q6-style selective filter + single aggregate (pushdown case). */
  def q06ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.04, 0.07) && col("l_quantity") < 24)
      .agg(dsumExpr(dec(col("l_extendedprice")) * dec(col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q06Sql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.04 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q17-style correlated aggregate: lines far below their part's
    * average quantity. Expressed as an agg-join (the decorrelated plan) —
    * the exact-decimal average keeps the predicate bit-identical.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val avgPerPart = li.groupBy(col("l_partkey").as("pk"))
      .agg((sum(dec(col("l_quantity"))).cast(DoubleType) /
        count(col("l_quantity")).cast(DoubleType)).as("avg_qty"))
    li.join(avgPerPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val q17Sql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  count(*) AS n_lines
      |FROM lineitem l
      |JOIN (
      |  SELECT l_partkey AS pk,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_quantity) AS DOUBLE) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey) a ON l.l_partkey = a.pk
      |WHERE l.l_quantity < a.avg_qty * 0.5""".stripMargin

  /** Pivot (orderstatus columns per priority) — conditional-agg oracle. */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    ord.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderpriority"))
  }

  val qPivotSql: String =
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** UNPIVOT (melt) — the inverse of [[qPivot]], through Spark's native
    * `Dataset.unpivot` (Expand-based, one pass, no join): the pivoted
    * status×priority count matrix back to long (priority, status, n)
    * form. Round-tripping through both operators pins the pair as exact
    * inverses on this data.
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    qPivot(spark, dir)
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("F"), col("O"), col("P")),
        "o_orderstatus", "n")
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  val qUnpivotSql: String =
    s"""WITH wide AS ($qPivotSql)
       |SELECT o_orderpriority, s.o_orderstatus,
       |  CASE s.o_orderstatus WHEN 'F' THEN "F" WHEN 'O' THEN "O" ELSE "P" END AS n
       |FROM wide CROSS JOIN (
       |  SELECT unnest(['F', 'O', 'P']) AS o_orderstatus) s
       |ORDER BY o_orderpriority, s.o_orderstatus""".stripMargin

  /** Exact distinct counts per group (count-distinct expand path). */
  def qDistinctCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))
  }

  val qDistinctCountsSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q7-style nation-pair volume, exercised through the raw
    * `spark.sql` surface (temp views + SQL text) — same engine, SQL front
    * door.
    */
  def q07SqlSurface(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "lineitem").createOrReplaceTempView("v_lineitem")
    table(spark, dir, "orders").createOrReplaceTempView("v_orders")
    table(spark, dir, "customer").createOrReplaceTempView("v_customer")
    table(spark, dir, "supplier").createOrReplaceTempView("v_supplier")
    table(spark, dir, "nation").createOrReplaceTempView("v_nation")
    spark.sql(
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS ship_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
        |FROM v_lineitem
        |JOIN v_orders ON l_orderkey = o_orderkey
        |JOIN v_supplier ON l_suppkey = s_suppkey
        |JOIN v_customer ON o_custkey = c_custkey
        |JOIN v_nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN v_nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_3', 'NATION_8') AND n2.n_name IN ('NATION_3', 'NATION_8')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin)
  }

  val q07Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS ship_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_3', 'NATION_8') AND n2.n_name IN ('NATION_3', 'NATION_8')
      |  AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  /** Exact interpolated percentiles per group (sort-based aggregate;
    * interpolation arithmetic verified bit-identical to DuckDB's
    * quantile_cont in round 1).
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"), array(lit(0.25), lit(0.5), lit(0.75), lit(0.99))).as("p"))
      .select(
        col("l_returnflag"),
        element_at(col("p"), 1).as("p25"),
        element_at(col("p"), 2).as("p50"),
        element_at(col("p"), 3).as("p75"),
        element_at(col("p"), 4).as("p99"))
      .orderBy(col("l_returnflag"))
  }

  val qPercentilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.25) AS p25,
      |  quantile_cont(l_extendedprice, 0.5) AS p50,
      |  quantile_cont(l_extendedprice, 0.75) AS p75,
      |  quantile_cont(l_extendedprice, 0.99) AS p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Analytic window functions: lag deltas + dense_rank per partition. */
  def qWindowLag(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem").filter(col("l_suppkey") <= 3)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    li.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        (col("l_quantity") - lag(col("l_quantity"), 1).over(w)).as("qty_delta"),
        dense_rank().over(
          Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity").desc)).as("qty_rank"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  val qWindowLagSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |  l_quantity - lag(l_quantity, 1) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS qty_delta,
      |  dense_rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS qty_rank
      |FROM lineitem
      |WHERE l_suppkey <= 3
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** TPC-H Q4-style: order-priority counts for orders with any late line. */
  def q04OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    ord.join(
        table(spark, dir, "lineitem").filter(col("l_quantity") >= 30),
        ord("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 30)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q12-style: conditional aggregation (CASE inside sum). */
  def q12ShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val ord = table(spark, dir, "orders")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  val q12Sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q14-style: conditional revenue ratio (exact-decimal sums, one
    * final IEEE division).
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val part = table(spark, dir, "part")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      .agg(
        (sum(when(col("p_type").startsWith("PROMO"),
            discPrice(col("l_extendedprice"), col("l_discount"))).otherwise(lit(0).cast(DecimalType(18, 2))))
          .cast(DoubleType) * 100.0 /
          sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast(DoubleType)).as("promo_revenue_pct"),
        count(lit(1)).as("n_lines"))
  }

  val q14Sql: String =
    """SELECT
      |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 /
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_revenue_pct,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin

  /** TPC-H Q19-style: disjunctive multi-predicate join filter. */
  def q19DiscountedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val part = table(spark, dir, "part")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey") &&
        ((col("p_brand") === "Brand#1" && col("l_quantity").between(1, 20) && col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 30) && col("p_size").between(1, 20)) ||
          (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 40) && col("p_size").between(1, 30))))
      .agg(dsumExpr(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19Sql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20 AND p_size BETWEEN 1 AND 10)
      |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30 AND p_size BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 40 AND p_size BETWEEN 1 AND 30)""".stripMargin

  /** Nested aggregation (collect_set → sort) through the gate; the list is
    * joined to one string at the end because the driver's pandas compare
    * cannot hash array cells (nested parquet types are pinned by specs).
    */
  def qNestedCollect(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    ord.groupBy(col("o_orderstatus"))
      .agg(
        array_join(sort_array(collect_set(col("o_orderpriority"))), "|").as("priorities"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  val qNestedCollectSql: String =
    """SELECT o_orderstatus,
      |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Top-2 lineitems per supplier via the NATIVE [[graft.plans.TopKPerKey]]
    * operator (partial bounded heaps → ≤k-rows-per-key-per-partition
    * shuffle → final heaps), not a window — the whole-operator
    * LogicalPlan/Strategy/Exec path. Total order (price desc, orderkey,
    * linenumber) makes ranks deterministic; the oracle states the same
    * query as a filtered row_number window.
    */
  def qTopKNative(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    graft.plans.TopKPerKey.perKey(li,
        Seq(col("l_suppkey")),
        Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
        k = 2)
      .orderBy(col("l_suppkey"), col("rnk"))
  }

  val qTopKNativeSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rnk FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (
      |      PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk
      |  FROM lineitem)
      |WHERE rnk <= 2
      |ORDER BY l_suppkey, rnk""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_native" -> (qTopKNative _),
    "q_nested_collect" -> (qNestedCollect _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q03_top_orders" -> (q03TopOrders _),
    "q05_local_supplier_volume" -> (q05LocalSupplierVolume _),
    "q_brand_volume" -> (qBrandVolume _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_window_top3" -> (qWindowTop3 _),
    "q_running_supplier" -> (qRunningSupplier _),
    "q_set_ops" -> (qSetOps _),
    "q_except" -> (qExcept _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_topk_orders" -> (qTopKOrders _),
    "q_distinct_segments" -> (qDistinctSegments _),
    "q_orders_per_month" -> (qOrdersPerMonth _),
    "q06_forecast_revenue" -> (q06ForecastRevenue _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_distinct_counts" -> (qDistinctCounts _),
    "q07_sql_surface" -> (q07SqlSurface _),
    "q_percentiles" -> (qPercentiles _),
    "q_window_lag" -> (qWindowLag _),
    "q04_order_priority" -> (q04OrderPriority _),
    "q12_ship_priority" -> (q12ShipPriority _),
    "q14_promo_revenue" -> (q14PromoRevenue _),
    "q19_discounted_revenue" -> (q19DiscountedRevenue _),
  )

  def oracle: Map[String, String] = Map(
    "q_topk_native" -> qTopKNativeSql,
    "q_nested_collect" -> qNestedCollectSql,
    "q01_pricing_summary" -> q01Sql,
    "q03_top_orders" -> q03Sql,
    "q05_local_supplier_volume" -> q05Sql,
    "q_brand_volume" -> qBrandVolumeSql,
    "q_semi_join" -> qSemiJoinSql,
    "q_anti_join" -> qAntiJoinSql,
    "q_window_top3" -> qWindowTop3Sql,
    "q_running_supplier" -> qRunningSupplierSql,
    "q_set_ops" -> qSetOpsSql,
    "q_except" -> qExceptSql,
    "q_rollup" -> qRollupSql,
    "q_cube" -> qCubeSql,
    "q_topk_orders" -> qTopKOrdersSql,
    "q_distinct_segments" -> qDistinctSegmentsSql,
    "q_orders_per_month" -> qOrdersPerMonthSql,
    "q06_forecast_revenue" -> q06Sql,
    "q17_small_quantity" -> q17Sql,
    "q_pivot" -> qPivotSql,
    "q_unpivot" -> qUnpivotSql,
    "q_distinct_counts" -> qDistinctCountsSql,
    "q07_sql_surface" -> q07Sql,
    "q_percentiles" -> qPercentilesSql,
    "q_window_lag" -> qWindowLagSql,
    "q04_order_priority" -> q04Sql,
    "q12_ship_priority" -> q12Sql,
    "q14_promo_revenue" -> q14Sql,
    "q19_discounted_revenue" -> q19Sql,
  )
}
