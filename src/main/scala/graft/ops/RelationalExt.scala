package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/** Second relational pack: the remaining TPC-H query *patterns* adapted to
  * the slimmed testdata schema (no `partsupp` table — `lineitem` serves as
  * the part↔supplier relation; no `l_receiptdate`/`ps_supplycost`, so the
  * affected queries keep their shape with the available columns).
  *
  * Patterns covered here (SURVEY.md §2.5-2.7 extension surface):
  *   - correlated min subquery / per-group argmin (Q2)
  *   - conditional-sum market share ratio (Q8)
  *   - multi-dim profit rollforward (Q9)
  *   - top-k after 4-way join (Q10)
  *   - scalar-subquery HAVING threshold (Q11)
  *   - outer-join count distribution (Q13)
  *   - view + scalar max subquery (Q15)
  *   - distinct-agg after dimension filter (Q16)
  *   - group-having semi join (Q18)
  *   - nested per-group share semi join (Q20)
  *   - NOT EXISTS sole-supplier count (Q21)
  *   - scalar-avg + anti-join aggregate (Q22)
  *
  * Cross-engine determinism: money aggregates use the exact-decimal
  * construction from [[Tables]]; fractional thresholds are multiplied
  * through (`5*x > total`, not `x > 0.2*total`) so comparisons stay in
  * exact decimal in BOTH engines — a double-rounded threshold could flip a
  * boundary row in one engine only.
  *
  * Scale design: every aggregate reduces before it joins (the having-group
  * runs on the fact table alone, then joins a shrunken result); dimension
  * joins are `broadcast()`; scalar subqueries become 1-row broadcast cross
  * joins, never driver-side `.collect()`.
  */
object RelationalExt {

  /** Q2 pattern: for each SMALL part under size 10, the supplier(s) with
    * the minimum average sale price. Per-(part,supplier) aggregate, then a
    * window min over the (already reduced) aggregate — one fact shuffle.
    */
  def q02MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val part = table(spark, dir, "part")
      .filter(col("p_type") === "SMALL" && col("p_size") < 10)
    val supp = table(spark, dir, "supplier")
    val ps = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(davg(col("l_extendedprice")).as("avg_price"))
    val w = Window.partitionBy(col("l_partkey"))
    ps.withColumn("min_price", min(col("avg_price")).over(w))
      .filter(col("avg_price") === col("min_price"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"),
        col("avg_price").as("min_avg_price"))
      .orderBy(col("p_partkey"), col("s_name"))
  }

  val q02Sql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(l_extendedprice) AS DOUBLE) AS avg_price
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT p_partkey, p_brand, s_name, avg_price AS min_avg_price
      |FROM ps JOIN part ON l_partkey = p_partkey JOIN supplier ON l_suppkey = s_suppkey
      |WHERE p_type = 'SMALL' AND p_size < 10
      |  AND avg_price = (SELECT min(avg_price) FROM ps ps2 WHERE ps2.l_partkey = ps.l_partkey)
      |ORDER BY p_partkey, s_name""".stripMargin

  /** Q8 pattern: yearly market share of one nation's suppliers within a
    * region for one part type — conditional decimal sum over total decimal
    * sum, one IEEE division per row.
    */
  def q08MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val ord = table(spark, dir, "orders")
    val part = table(spark, dir, "part").filter(col("p_type") === "ECONOMY")
    val supp = table(spark, dir, "supplier")
    val nat = table(spark, dir, "nation")
    val reg = table(spark, dir, "region").filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("n_name") === "NATION_2",
          discPrice(col("l_extendedprice"), col("l_discount")))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DoubleType)
        / dsumExpr(discPrice(col("l_extendedprice"), col("l_discount"))))
        .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q08Sql: String =
    """SELECT year(o_orderdate) AS o_year,
      |  CAST(sum(CASE WHEN n_name = 'NATION_2' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q9 pattern: revenue ("profit" — no `ps_supplycost` in this schema) by
    * supplier nation × order year for parts matching a name substring.
    */
  def q09ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val ord = table(spark, dir, "orders")
    val part = table(spark, dir, "part").filter(col("p_name").contains("red"))
    val supp = table(spark, dir, "supplier")
    val nat = table(spark, dir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(dsumExpr(discPrice(col("l_extendedprice"), col("l_discount"))).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q09Sql: String =
    """SELECT n_name AS nation, year(o_orderdate) AS o_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** Q10 pattern: top 20 customers by returned-item revenue in one year. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val ord = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
    val cust = table(spark, dir, "customer")
    val nat = table(spark, dir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsumExpr(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q11 pattern: parts whose total sale value exceeds 1/1250 of the global
    * total. The scalar total is a 1-row aggregate broadcast-cross-joined
    * into the per-part aggregate; the threshold compare is multiplied
    * through (`1250 * value > total`) so it stays in exact decimal.
    */
  def q11ImportantValue(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val disc = discPrice(col("l_extendedprice"), col("l_discount"))
    val perPart = li.groupBy(col("l_partkey").as("partkey"))
      .agg(sum(disc).as("dvalue"))
    val total = li.agg(sum(disc).as("dtotal"))
    perPart.crossJoin(broadcast(total))
      .filter(col("dvalue") * 1250 > col("dtotal"))
      .select(col("partkey"), col("dvalue").cast(DoubleType).as("value"))
      .orderBy(col("value").desc, col("partkey"))
  }

  val q11Sql: String =
    """SELECT l_partkey AS partkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS value
      |FROM lineitem GROUP BY 1
      |HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 1250
      |  > (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) FROM lineitem)
      |ORDER BY value DESC, partkey""".stripMargin

  /** Q13 pattern: distribution of customers by URGENT-order count — LEFT
    * OUTER join with an ON-clause filter so zero-order customers survive,
    * then a second aggregation over the count.
    */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
    val ord = table(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q15 pattern: supplier(s) with the maximum revenue in a quarter — the
    * revenue "view" is aggregated once, its max becomes a 1-row broadcast,
    * and the exact-decimal equality join selects the top supplier(s).
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-04-01").cast(TimestampType))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).as("drev"))
    val maxRev = revenue.agg(max(col("drev")).as("dmax"))
    val supp = table(spark, dir, "supplier")
    revenue.crossJoin(broadcast(maxRev))
      .filter(col("drev") === col("dmax"))
      .join(broadcast(supp), col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("drev").cast(DoubleType).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS drev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(drev AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE drev = (SELECT max(drev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** Q16 pattern: distinct suppliers per (brand, type, size) bucket for
    * selected sizes, excluding one brand — distinct-agg after a broadcast
    * dimension filter.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val part = table(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q18 pattern: large-volume orders — the having-aggregate runs on the
    * fact table alone (map-side partial), and only qualifying orders join
    * the dimensions.
    */
  def q18LargeVolume(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("dqty"))
      .filter(col("dqty") > 250)
    val ord = table(spark, dir, "orders")
    val cust = table(spark, dir, "customer")
    bigOrders.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_totalprice"), col("dqty").cast(DoubleType).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_totalprice, CAST(dqty AS DOUBLE) AS sum_qty
      |FROM (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS dqty
      |      FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin

  /** Q20 pattern: suppliers that shipped more than 1/5 of some part's total
    * quantity. ONE lineitem scan: the per-(part, supplier) aggregate is
    * computed once and the per-part total comes from a window sum over that
    * (already-reduced) relation — no second fact scan and no agg⋈agg
    * shuffle join; the threshold is multiplied through to stay in exact
    * decimal. Ends in a semi join into the supplier dimension.
    */
  def q20ExcessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val perPartSupp = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("sq"))
    val excess = perPartSupp
      .withColumn("tq", sum(col("sq")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("sq") * 5 > col("tq"))
      .select(col("l_suppkey")).distinct()
    table(spark, dir, "supplier")
      .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  val q20Sql: String =
    """SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM (
      |    SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
      |    FROM lineitem GROUP BY 1, 2) ps
      |  WHERE sq * 5 > (
      |    SELECT sum(CAST(l_quantity AS DECIMAL(18,2))) FROM lineitem l2 WHERE l2.l_partkey = ps.l_partkey))
      |ORDER BY s_suppkey""".stripMargin

  /** Q21 pattern: per-supplier count of orders where it was the SOLE
    * supplier. The oracle keeps the NOT EXISTS anti-join formulation; the
    * Spark plan uses the equivalent (and shuffle-minimal) per-order
    * distinct-count — one aggregate instead of a fact×fact self-join.
    */
  def q21SoleSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val solo = li.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("nsupp"), min(col("l_suppkey")).as("suppkey"))
      .filter(col("nsupp") === 1)
    val supp = table(spark, dir, "supplier")
    solo.join(broadcast(supp), col("suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val q21Sql: String =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait FROM (
      |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey FROM lineitem l1
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)) solo
      |JOIN supplier ON solo.l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  /** Q22 pattern: per-nation count + balance of above-average-balance
    * customers with no recent orders — scalar average as a 1-row
    * broadcast, anti join against the filtered fact.
    */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal")).as("abal"))
    val recent = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-06-01").cast(TimestampType))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("abal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntry"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntry"))
  }

  val q22Sql: String =
    """SELECT c_nationkey AS cntry, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(c_acctbal) AS DOUBLE)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-06-01')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Gini concentration of order value. Ranks come from
    * [[Rank.globalRank]] — range-partitioned distributed ranking, NOT the
    * single-reducer `row_number() OVER (ORDER BY ...)` window — and the
    * sums are exact decimal, so the coefficient is one deterministic
    * division from order-independent numerators.
    * `G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i)` with x sorted ascending.
    */
  def qGini(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
      .select(col("o_totalprice"), col("o_orderkey"))
    val ranked = Rank
      .globalRank(ord, Seq(col("o_totalprice"), col("o_orderkey")), numParts = 8, rankName = "i")
      .select(dec(col("o_totalprice")).as("x"), col("i"))
    ranked
      .agg(sum(col("x") * col("i")).as("ixsum"), sum(col("x")).as("xsum"),
        count(lit(1)).as("n"))
      .select(round(
        (lit(2).cast(DecimalType(38, 2)) * col("ixsum")
          - (col("n") + 1).cast(DecimalType(38, 2)) * col("xsum")).cast(DoubleType)
          / (col("n").cast(DecimalType(38, 2)) * col("xsum")).cast(DoubleType), 6)
        .as("gini"))
  }

  val qGiniSql: String =
    """WITH r AS (
      |  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS x,
      |    CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS i
      |  FROM orders
      |)
      |SELECT round(
      |  CAST(2 * sum(x * i) - (count(*) + 1) * sum(x) AS DOUBLE)
      |    / CAST(count(*) * sum(x) AS DOUBLE), 6) AS gini
      |FROM r""".stripMargin

  /** Month-over-month revenue growth: lag window over the monthly
    * aggregate (already one row per month — the window runs on a tiny
    * relation), growth as one deterministic division, rounded.
    */
  def qMomGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = table(spark, dir, "orders")
    val monthly = ord
      .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
    val w = Window.orderBy(col("month"))
    monthly
      .select(col("month"), col("revenue"),
        lag(col("revenue"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .select(col("month"), col("revenue"),
        round((col("revenue") - col("prev")) / col("prev"), 6).as("growth"))
      .orderBy(col("month"))
  }

  val qMomGrowthSql: String =
    """WITH m AS (
      |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |  FROM orders GROUP BY 1
      |), l AS (
      |  SELECT month, revenue, lag(revenue, 1) OVER (ORDER BY month) AS prev FROM m
      |)
      |SELECT month, revenue, round((revenue - prev) / prev, 6) AS growth
      |FROM l WHERE prev IS NOT NULL
      |ORDER BY month""".stripMargin

  /** 2-D Pareto skyline (maximize `x`, minimize `y`): rows not dominated
    * by any other row (`x' ≥ x ∧ y' ≤ y`, strict somewhere). Two phases:
    *
    *  1. LOCAL prune per input partition — the same sort-based sweep
    *     keyed by `spark_partition_id()`, so it runs partition-local with
    *     no exchange. A locally-dominated row is dominated globally (its
    *     dominator exists regardless of co-partitioning), so dropping it
    *     is always safe and the phase is conservative (keeps boundary
    *     ties); survivors are a tiny frontier-ish candidate set.
    *  2. GLOBAL exact sweep over the survivors: `dense_rank` on `x`
    *     descending, a RANGE frame on that (integer) rank for "strictly
    *     better x", and a per-x-partition min for tie dominance. Identical
    *     duplicate points all survive — NOT-EXISTS dominance semantics.
    *
    * The global window is a single reducer, but it only ever sees phase-1
    * survivors (frontier-sized, not input-sized) — the same shape DMBS
    * skyline papers use (sort-filter-skyline with a pre-pruning pass).
    */
  def skyline2d(df: DataFrame, xName: String, yName: String, tieName: String): DataFrame = {
    val (x, y, tie) = (col(xName), col(yName), col(tieName))
    val wLocal = Window.partitionBy(col("_pid"))
      .orderBy(x.desc, y.asc, tie.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pruned = df
      .withColumn("_pid", spark_partition_id())
      .withColumn("_pmin", min(y).over(wLocal))
      .filter(col("_pmin").isNull || y <= col("_pmin"))
      .drop("_pid", "_pmin")
    val wStrict = Window.orderBy(col("_r"))
      .rangeBetween(Window.unboundedPreceding, -1)
    pruned
      .withColumn("_r", dense_rank().over(Window.orderBy(x.desc)))
      .withColumn("_minStrict", min(y).over(wStrict))
      .withColumn("_minTie", min(y).over(Window.partitionBy(x)))
      .filter((col("_minStrict").isNull || col("_minStrict") > y) && y === col("_minTie"))
      .drop("_r", "_minStrict", "_minTie")
  }

  /** Customer efficiency frontier: customers for whom no other customer
    * has both ≥ total spend and ≤ order count — dominance computed in
    * exact decimal so the frontier is bit-stable across engines.
    */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val agg = table(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("spend"), count(lit(1)).as("n_orders"))
    skyline2d(agg, "spend", "n_orders", "o_custkey")
      .select(col("o_custkey").as("custkey"),
        col("spend").cast(DoubleType).as("spend"), col("n_orders"))
      .orderBy(col("spend").desc, col("custkey"))
  }

  val qSkylineSql: String =
    """WITH agg AS (
      |  SELECT o_custkey,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY 1
      |)
      |SELECT a.o_custkey AS custkey, CAST(a.spend AS DOUBLE) AS spend, a.n_orders
      |FROM agg a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM agg b
      |  WHERE b.spend >= a.spend AND b.n_orders <= a.n_orders
      |    AND (b.spend > a.spend OR b.n_orders < a.n_orders))
      |ORDER BY spend DESC, custkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skyline" -> (qSkyline _),
    "q_gini" -> (qGini _),
    "q_mom_growth" -> (qMomGrowth _),
    "q02_min_cost_supplier" -> (q02MinCostSupplier _),
    "q08_market_share" -> (q08MarketShare _),
    "q09_product_profit" -> (q09ProductProfit _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q11_important_value" -> (q11ImportantValue _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q16_supplier_cnt" -> (q16SupplierCnt _),
    "q18_large_volume" -> (q18LargeVolume _),
    "q20_excess_suppliers" -> (q20ExcessSuppliers _),
    "q21_sole_supplier" -> (q21SoleSupplier _),
    "q22_idle_customers" -> (q22IdleCustomers _))

  def oracle: Map[String, String] = Map(
    "q_skyline" -> qSkylineSql,
    "q_gini" -> qGiniSql,
    "q_mom_growth" -> qMomGrowthSql,
    "q02_min_cost_supplier" -> q02Sql,
    "q08_market_share" -> q08Sql,
    "q09_product_profit" -> q09Sql,
    "q10_returned_items" -> q10Sql,
    "q11_important_value" -> q11Sql,
    "q13_customer_distribution" -> q13Sql,
    "q15_top_supplier" -> q15Sql,
    "q16_supplier_cnt" -> q16Sql,
    "q18_large_volume" -> q18Sql,
    "q20_excess_suppliers" -> q20Sql,
    "q21_sole_supplier" -> q21Sql,
    "q22_idle_customers" -> q22Sql)
}
