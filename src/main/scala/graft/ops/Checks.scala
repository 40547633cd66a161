package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/** Declarative data-quality checking — the "validate 100 TB in one scan"
  * operator: every row-level constraint (null, range, domain, pattern,
  * key uniqueness) compiles to a conditional aggregate, so the WHOLE
  * constraint suite is ONE aggregation pass over the table (map-side
  * partial, one row out per table). Referential checks are each one
  * anti-join against the (broadcastable) parent key set. The report comes
  * back as a DataFrame — at scale it lands in a metrics table, not the
  * driver.
  */
object Checks {

  /** A row-level constraint: `violation` evaluates true on BAD rows. */
  final case class RowCheck(name: String, violation: Column)

  /** Evaluate all row checks in one aggregation pass →
    * `(check, violations, pass)`, one row per check, declaration order
    * preserved via the check name.
    */
  def report(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "report() needs at least one RowCheck")
    val aggs = checks.map(c =>
      coalesce(sum(when(c.violation, 1L).otherwise(0L)), lit(0L)).as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map(c =>
      struct(lit(c.name).as("check"), col(c.name).as("violations")))
    one
      .select(explode(array(stacked: _*)).as("r"))
      .select(col("r.check").as("check"), col("r.violations").as("violations"),
        (col("r.violations") === 0L).as("pass"))
  }

  /** Uniqueness as a row check is impossible (it is not row-local); this
    * one-aggregation variant reports duplicate-key row counts.
    *
    * Counted over rows whose key columns are all non-null: Spark's
    * `count_distinct` drops any tuple containing a null, so subtracting it
    * from a raw `count(*)` would report every null-keyed row as a
    * duplicate. Null-keyed rows are a different defect — pair this with a
    * `RowCheck(_.isNull)` per key column when nullable keys are possible.
    */
  def duplicateKeys(df: DataFrame, keys: Seq[Column], name: String): DataFrame = {
    val allNonNull = keys.map(_.isNotNull).reduce(_ && _)
    df.agg((coalesce(sum(when(allNonNull, 1L).otherwise(0L)), lit(0L))
        - count_distinct(keys.head, keys.tail: _*)).as(name))
      .select(lit(name).as("check"), col(name).as("violations"),
        (col(name) === 0L).as("pass"))
  }

  /** Referential integrity: rows of `child` whose `childKey` has no match
    * in `parent.parentKey` (anti-join count — broadcast when the parent
    * key set is dimension-sized).
    */
  def orphans(child: DataFrame, childKey: Column, parent: DataFrame,
      parentKey: Column, name: String): DataFrame = {
    val n = child.join(parent, childKey === parentKey, "left_anti")
      .agg(count(lit(1)).as(name))
    n.select(lit(name).as("check"), col(name).as("violations"),
      (col(name) === 0L).as("pass"))
  }

  /** The registered constraint suite over `lineitem`/`orders`: range,
    * non-null, domain, exact-decimal consistency, composite-key
    * uniqueness, and referential integrity — one scan for the six row
    * checks, one aggregation for uniqueness, one anti-join for the FK.
    */
  def qChecksReport(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val ord = table(spark, dir, "orders")
    val row = report(li, Seq(
      RowCheck("qty_in_1_50", !col("l_quantity").between(1, 50)),
      RowCheck("shipdate_not_null", col("l_shipdate").isNull),
      RowCheck("returnflag_domain", !col("l_returnflag").isin("A", "N", "R")),
      RowCheck("discount_in_0_to_0p1",
        col("l_discount") < 0 || col("l_discount") > 0.1),
      RowCheck("price_positive", col("l_extendedprice") <= 0),
      RowCheck("tax_in_0_to_0p08", col("l_tax") < 0 || col("l_tax") > 0.08)))
    val uniq = duplicateKeys(li, Seq(col("l_orderkey"), col("l_linenumber")), "lineitem_pk_unique")
    val fk = orphans(li, col("l_orderkey"), ord, col("o_orderkey"), "orderkey_fk")
    row.unionByName(uniq).unionByName(fk).orderBy(col("check"))
  }

  val qChecksReportSql: String =
    """WITH row_checks AS (
      |  SELECT
      |    sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END) AS qty_in_1_50,
      |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS shipdate_not_null,
      |    sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS returnflag_domain,
      |    sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS discount_in_0_to_0p1,
      |    sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS price_positive,
      |    sum(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END) AS tax_in_0_to_0p08,
      |    sum(CASE WHEN l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL THEN 1 ELSE 0 END)
      |      - count(DISTINCT (l_orderkey, l_linenumber))
      |          FILTER (l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL) AS lineitem_pk_unique
      |  FROM lineitem
      |), fk AS (
      |  SELECT count(*) AS orderkey_fk
      |  FROM lineitem l WHERE NOT EXISTS (
      |    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |), u AS (
      |  SELECT 'qty_in_1_50' AS check_name, qty_in_1_50 AS violations FROM row_checks
      |  UNION ALL SELECT 'shipdate_not_null', shipdate_not_null FROM row_checks
      |  UNION ALL SELECT 'returnflag_domain', returnflag_domain FROM row_checks
      |  UNION ALL SELECT 'discount_in_0_to_0p1', discount_in_0_to_0p1 FROM row_checks
      |  UNION ALL SELECT 'price_positive', price_positive FROM row_checks
      |  UNION ALL SELECT 'tax_in_0_to_0p08', tax_in_0_to_0p08 FROM row_checks
      |  UNION ALL SELECT 'lineitem_pk_unique', lineitem_pk_unique FROM row_checks
      |  UNION ALL SELECT 'orderkey_fk', orderkey_fk FROM fk
      |)
      |SELECT check_name AS "check", CAST(violations AS BIGINT) AS violations,
      |  violations = 0 AS pass
      |FROM u ORDER BY check_name""".stripMargin

  /** Equi-width histogram with pinned bounds — distribution profiling as
    * one aggregation (clamped bucket arithmetic, no width_bucket dialect
    * differences).
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    val (lo, hi, n) = (0d, 600000d, 12)
    val width = (hi - lo) / n
    val bucket = least(greatest(
      floor((col("o_totalprice") - lo) / width).cast(LongType), lit(0L)), lit(n - 1L))
    ord
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .select(col("bucket"), (lit(lo) + col("bucket") * width).as("bucket_lo"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("bucket"))
  }

  val qHistogramSql: String =
    """SELECT bucket, 0.0 + bucket * 50000.0 AS bucket_lo,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM (
      |  SELECT o_totalprice,
      |    least(greatest(CAST(floor((o_totalprice - 0.0) / 50000.0) AS BIGINT), 0), 11) AS bucket
      |  FROM orders)
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  /** Contingency-table association profiling (lang × source over the
    * document corpus): observed vs expected counts and the per-cell
    * chi-square contribution. Expected counts and contributions are
    * emitted PER CELL (rounded), never summed — a float sum across cells
    * would be partition-order-dependent; the per-cell values are each one
    * pinned-order division from exact integer marginals, deterministic in
    * both engines. One aggregation + two broadcastable marginal joins.
    */
  def qContingency(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val cells = docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
    val rowT = docs.groupBy(col("lang")).agg(count(lit(1)).as("row_n"))
    val colT = docs.groupBy(col("source")).agg(count(lit(1)).as("col_n"))
    val total = docs.agg(count(lit(1)).cast(DoubleType).as("n")) // scalar-subquery shape
    val e = (col("row_n") * col("col_n")).cast(DoubleType) / col("n")
    cells
      .join(broadcast(rowT), "lang")
      .join(broadcast(colT), "source")
      .crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("o"),
        round(e, 6).as("expected"),
        round(pow(col("o").cast(DoubleType) - e, 2) / e, 6).as("chi2_term"))
      .orderBy(col("lang"), col("source"))
  }

  val qContingencySql: String =
    """WITH cells AS (
      |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2
      |), rt AS (SELECT lang, count(*) AS row_n FROM documents GROUP BY 1),
      |ct AS (SELECT source, count(*) AS col_n FROM documents GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
      |SELECT cells.lang, cells.source, cells.o,
      |  round(CAST(row_n * col_n AS DOUBLE) / n.n, 6) AS expected,
      |  round(pow(CAST(o AS DOUBLE) - CAST(row_n * col_n AS DOUBLE) / n.n, 2)
      |        / (CAST(row_n * col_n AS DOUBLE) / n.n), 6) AS chi2_term
      |FROM cells JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n
      |ORDER BY lang, source""".stripMargin

  /** Per-group 1.5σ outlier counts with NO floating point anywhere:
    * prices become exact cents, and the z-score test `(x−μ)² > (1.5σ)²`
    * is algebraically cleared of its divisions to
    * `4·(x·n − S)² > 9·(n·Q − S²)` over the exact group sums
    * `S = Σx, Q = Σx²` — every term an integer that fits comfortably in
    * Spark's DECIMAL(38,0) / DuckDB's HUGEINT (≤ ~4e27 at this scale),
    * so the variance comparison itself is bit-exact, not
    * rounding-convention-dependent. The statistical-profiling op of a
    * quality pipeline without the usual cross-engine stddev drift.
    *
    * Plan: one aggregation for the per-group sums (5 groups → broadcast
    * back), one scan for the outlier test — no window, no second shuffle
    * of the fact side.
    */
  def qOutlierOrders(spark: SparkSession, dir: String): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val ord = table(spark, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100).cast(dec38).as("x"))
    val stats = ord.groupBy(col("prio"))
      .agg(count(lit(1)).cast(dec38).as("n"),
        sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("q"))
    val lhs = (col("x") * col("n") - col("s")) * (col("x") * col("n") - col("s")) * 4
    val rhs = (col("n") * col("q") - col("s") * col("s")) * 9
    ord.join(broadcast(stats), "prio")
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_orders"),
        coalesce(sum(when(lhs > rhs, 1L).otherwise(0L)), lit(0L)).as("n_outliers"))
      .orderBy(col("prio"))
  }

  val qOutlierOrdersSql: String =
    """WITH o AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(round(o_totalprice * 100) AS HUGEINT) AS x
      |  FROM orders
      |), stats AS (
      |  SELECT prio, CAST(count(*) AS HUGEINT) AS n, sum(x) AS s, sum(x * x) AS q
      |  FROM o GROUP BY 1
      |)
      |SELECT o.prio, count(*) AS n_orders,
      |  CAST(sum(CASE WHEN 4 * (x * n - s) * (x * n - s) > 9 * (n * q - s * s)
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM o JOIN stats USING (prio)
      |GROUP BY o.prio
      |ORDER BY o.prio""".stripMargin

  /** Robust (MAD-based) outlier profile per order priority: median and
    * median-absolute-deviation of order value, flagging rows with
    * `|x − med| > 1.5·MAD` — the robust companion to the z-score profile
    * of [[qOutlierOrders]] (medians don't move when the outliers do).
    *
    * Determinism: values are cents-scaled longs; Spark's exact
    * `percentile` and DuckDB's `quantile_cont` both linearly interpolate,
    * so medians land on k or k+0.5 — exact in double — and the threshold
    * compare is written `2·dev > 3·mad` (all products exact in double far
    * below 2^53), so no engine can round a boundary row differently.
    *
    * Scale: two aggregate passes (med, then MAD over deviations) with the
    * 5-row stats relations broadcast back — exact grouped percentiles hold
    * per-group values in memory, so at 100 TB swap both for
    * `percentile_approx` at the same plan shape and keep the final
    * conditional aggregate unchanged.
    */
  def qOutlierMad(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100).cast(LongType).as("x"))
    val med = ord.groupBy(col("prio"))
      .agg(expr("percentile(x, 0.5)").as("med"))
    val dev = ord.join(broadcast(med), "prio")
      .select(col("prio"), col("med"), abs(col("x") - col("med")).as("dev"))
    val mad = dev.groupBy(col("prio"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "prio")
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_orders"),
        coalesce(sum(when(col("dev") * 2 > col("mad") * 3, 1L).otherwise(0L)), lit(0L))
          .as("n_outliers"),
        max(col("med")).as("med_cents"),
        max(col("mad")).as("mad_cents"))
      .orderBy(col("prio"))
  }

  val qOutlierMadSql: String =
    """WITH o AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS x
      |  FROM orders
      |), m AS (
      |  SELECT prio, quantile_cont(x, 0.5) AS med FROM o GROUP BY 1
      |), d AS (
      |  SELECT o.prio, m.med, abs(o.x - m.med) AS dev FROM o JOIN m USING (prio)
      |), s AS (
      |  SELECT prio, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1
      |)
      |SELECT d.prio, count(*) AS n_orders,
      |  CAST(sum(CASE WHEN d.dev * 2 > s.mad * 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers,
      |  max(d.med) AS med_cents,
      |  max(s.mad) AS mad_cents
      |FROM d JOIN s USING (prio)
      |GROUP BY 1
      |ORDER BY prio""".stripMargin

  /** k-anonymity suppression over quasi-identifiers (order month ×
    * priority): groups smaller than k=5 are generalized to `*` and
    * re-aggregated — the release-gate every training-data governance
    * pipeline runs before publishing grouped statistics. Two aggregates
    * (group sizes, then the suppressed rollup); nothing row-level leaves
    * the plan, so the op is one scan + two dimension-sized shuffles at
    * any corpus size.
    */
  def qKAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val g = table(spark, dir, "orders")
      .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month"),
        col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n"))
    g.select(
        when(col("n") >= 5, date_format(col("month"), "yyyy-MM")).otherwise("*").as("month"),
        when(col("n") >= 5, col("prio")).otherwise("*").as("prio"),
        col("n"))
      .groupBy(col("month"), col("prio"))
      .agg(sum(col("n")).as("n_orders"))
      .orderBy(col("month"), col("prio"))
  }

  val qKAnonymitySql: String =
    """WITH g AS (
      |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
      |    o_orderpriority AS prio, count(*) AS n
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT CASE WHEN n >= 5 THEN strftime(month, '%Y-%m') ELSE '*' END AS month,
      |  CASE WHEN n >= 5 THEN prio ELSE '*' END AS prio,
      |  CAST(sum(n) AS BIGINT) AS n_orders
      |FROM g GROUP BY 1, 2
      |ORDER BY month, prio""".stripMargin

  /** Equi-depth (quantile-bucketed) histogram of order value: bucket
    * boundaries are the exact quartiles (broadcast 1-row scalar, the
    * [[Corpus.qQuantileTrim]] shape), so bucket populations are balanced
    * by construction — the histogram that stays informative on skewed
    * data where [[qHistogram]]'s fixed-width bins collapse. At 100 TB
    * swap the exact percentiles for `percentile_approx` (same plan).
    */
  def qHistogramEquiDepth(spark: SparkSession, dir: String): DataFrame = {
    val ord = table(spark, dir, "orders")
    val bounds = ord.agg(
      expr("percentile(o_totalprice, 0.25)").as("q1"),
      expr("percentile(o_totalprice, 0.5)").as("q2"),
      expr("percentile(o_totalprice, 0.75)").as("q3"))
    ord.crossJoin(broadcast(bounds))
      .select(
        when(col("o_totalprice") < col("q1"), 0)
          .when(col("o_totalprice") < col("q2"), 1)
          .when(col("o_totalprice") < col("q3"), 2)
          .otherwise(3).as("bucket"),
        col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy(col("bucket"))
  }

  val qHistogramEquiDepthSql: String =
    """WITH b AS (
      |  SELECT quantile_cont(o_totalprice, 0.25) AS q1,
      |         quantile_cont(o_totalprice, 0.5) AS q2,
      |         quantile_cont(o_totalprice, 0.75) AS q3
      |  FROM orders
      |)
      |SELECT CASE WHEN o_totalprice < q1 THEN 0 WHEN o_totalprice < q2 THEN 1
      |            WHEN o_totalprice < q3 THEN 2 ELSE 3 END AS bucket,
      |  count(*) AS n,
      |  round(min(o_totalprice), 2) AS lo,
      |  round(max(o_totalprice), 2) AS hi
      |FROM orders, b
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  /** Header-detail reconciliation: every order's header total vs the
    * exact-decimal sum of its lineitem charges — the classic warehouse
    * audit (a header with no detail rows is an orphan; a delta over one
    * cent is a mismatch). Per-priority report of counts and the worst
    * absolute drift. All comparisons in exact decimal; the single
    * cast-to-double happens after rounding the already-exact max. The
    * detail side aggregates BEFORE the join, so the join moves one row
    * per order, not one per lineitem.
    */
  def qReconciliation(spark: SparkSession, dir: String): DataFrame = {
    val ls = table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax")))
        .as("detail"))
    table(spark, dir, "orders")
      .join(ls, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderpriority").as("prio"),
        col("detail").isNull.as("orphan"),
        abs(dec(col("o_totalprice")) - coalesce(col("detail"), lit(0).cast(DecimalType(18, 2))))
          .as("delta"))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_orders"),
        coalesce(sum(when(col("orphan"), 1L).otherwise(0L)), lit(0L)).as("n_orphans"),
        coalesce(sum(when(!col("orphan") && col("delta") > 0.01, 1L).otherwise(0L)), lit(0L))
          .as("n_mismatched"),
        round(max(col("delta")).cast(DoubleType), 2).as("max_abs_delta"))
      .orderBy(col("prio"))
  }

  val qReconciliationSql: String =
    """WITH ls AS (
      |  SELECT l_orderkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |        * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS detail
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT o.o_orderpriority AS prio, count(*) AS n_orders,
      |  CAST(sum(CASE WHEN ls.detail IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
      |  CAST(sum(CASE WHEN ls.detail IS NOT NULL
      |        AND ABS(CAST(o.o_totalprice AS DECIMAL(18,2)) - ls.detail) > 0.01
      |        THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
      |  round(CAST(max(ABS(CAST(o.o_totalprice AS DECIMAL(18,2)) - COALESCE(ls.detail, 0)))
      |        AS DOUBLE), 2) AS max_abs_delta
      |FROM orders o LEFT JOIN ls ON ls.l_orderkey = o.o_orderkey
      |GROUP BY 1
      |ORDER BY prio""".stripMargin

  /** ANALYZE-style column-statistics manifest: (min, max, exact NDV,
    * null count) for seven lineitem columns in ONE scan — the stats a
    * lakehouse maintains for zone maps, CBO join ordering, and file
    * skipping (the collection-side complement of [[Layout]]'s
    * consumption-side pruning). Min/max surface as strings so the
    * manifest is one narrow relation; only integer/string/date columns
    * participate (float formatting is engine-divergent, and floats get
    * range checks from [[qChecksReport]] instead).
    *
    * Scale: one independent single-COLUMN aggregation per profiled column,
    * unioned — each branch's parquet scan prunes to that one column, the
    * partial-distinct aggregation combines map-side, and the branches run
    * concurrently. This beats the all-columns-in-one-pass Expand plan
    * (which amplifies every wide row ×7 through a single exchange) by ~7×
    * measured at sf0.1 — column pruning is worth more than scan sharing
    * when the store is columnar.
    */
  def qStatsManifest(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    def one(c: String, minE: Column, maxE: Column): DataFrame =
      li.agg(minE.as("min_val"), maxE.as("max_val"),
          count_distinct(col(c)).as("ndv"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"))
        .select(lit(c).as("col_name"), col("min_val"), col("max_val"),
          col("ndv"), col("n_nulls"))
    val longCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val strCols = Seq("l_returnflag", "l_linestatus")
    val parts =
      longCols.map(c => one(c, min(col(c)).cast("string"), max(col(c)).cast("string"))) ++
        strCols.map(c => one(c, min(col(c)), max(col(c)))) :+
        one("l_shipdate", date_format(min(col("l_shipdate")), "yyyy-MM-dd"),
          date_format(max(col("l_shipdate")), "yyyy-MM-dd"))
    parts.reduce(_ union _).orderBy(col("col_name"))
  }

  val qStatsManifestSql: String = {
    def one(c: String, minExpr: String, maxExpr: String): String =
      s"""SELECT '$c' AS col_name, $minExpr AS min_val, $maxExpr AS max_val,
         |  count(DISTINCT $c) AS ndv,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
         |FROM lineitem""".stripMargin
    val longish = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
      .map(c => one(c, s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)"))
    val strish = Seq("l_returnflag", "l_linestatus").map(c => one(c, s"min($c)", s"max($c)"))
    val dateish = one("l_shipdate",
      "strftime(min(l_shipdate), '%Y-%m-%d')", "strftime(max(l_shipdate), '%Y-%m-%d')")
    (longish ++ strish :+ dateish).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Benford first-digit audit over order totals — the classic
    * fabricated-data screen: a synthetic or tampered amount column
    * drifts from the logarithmic first-digit law long before any
    * row-level constraint fires. One groupBy over a projected digit
    * column plus a broadcast 1-row total; the expected shares are the
    * authored literal table `floor(log10(1+1/d)·10⁴)` so observed and
    * expected compare in exact basis points (no runtime log, no float).
    * On TPC-H's uniform-ish totalprice the deviation is LARGE — the
    * audit correctly flags synthetic amounts; the gate pins the
    * arithmetic, not a verdict.
    */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val counts = table(spark, dir, "orders")
      .select(expr(
        "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS INT)")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n_orders")).as("total"))))
      .select(col("digit"), col("n_orders"),
        expr("(n_orders * 10000) DIV total").as("obs_bp"),
        expr("CAST(element_at(array(3010,1760,1249,969,791,669,579,511,457), digit) AS BIGINT)")
          .as("benford_bp"))
      .withColumn("dev_bp", abs(col("obs_bp") - col("benford_bp")))
      .orderBy(col("digit"))
  }

  val qBenfordSql: String =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
      |    AS digit
      |  FROM orders
      |), c AS (
      |  SELECT digit, CAST(count(*) AS BIGINT) AS n_orders FROM d GROUP BY digit
      |), t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM c)
      |SELECT digit, n_orders,
      |  CAST((n_orders * 10000) // total AS BIGINT) AS obs_bp,
      |  CAST([3010,1760,1249,969,791,669,579,511,457][digit] AS BIGINT) AS benford_bp,
      |  CAST(abs((n_orders * 10000) // total
      |    - [3010,1760,1249,969,791,669,579,511,457][digit]) AS BIGINT) AS dev_bp
      |FROM c, t ORDER BY digit""".stripMargin

  /** One functional-dependency check `lhs → rhs`: group by the
    * determinant, count groups whose dependent takes >1 distinct value.
    * One shuffle on the determinant with partial aggregation; the
    * verdict row is group-count-sized arithmetic.
    */
  def fdCheck(df: DataFrame, name: String, lhs: String, rhs: String): DataFrame =
    df.groupBy(col(lhs)).agg(count_distinct(col(rhs)).as("ndv"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("ndv") > 1, 1L).otherwise(0L)).as("n_violations"),
        max(col("ndv")).as("max_rhs"))
      .select(lit(name).as("fd"), col("n_groups"), col("n_violations"),
        expr("(n_violations * 10000) DIV n_groups").as("viol_bp"), col("max_rhs"))

  /** Functional-dependency PROFILE — Metanome-style discovery over an
    * authored candidate list: a holding FD (nation's key determines its
    * region) alongside two that real data violates (customer nation ↛
    * market segment, order customer ↛ priority). Each candidate is one
    * independent determinant-keyed aggregate; the union is
    * candidate-count rows. The profile is how a warehouse validates
    * assumed uniqueness/derivability before building on it.
    */
  def qFdCheck(spark: SparkSession, dir: String): DataFrame =
    Seq(
      fdCheck(table(spark, dir, "nation"), "nation_to_region", "n_nationkey", "n_regionkey"),
      fdCheck(table(spark, dir, "customer"), "cust_nation_to_segment", "c_nationkey", "c_mktsegment"),
      fdCheck(table(spark, dir, "orders"), "cust_to_priority", "o_custkey", "o_orderpriority"))
      .reduce(_ union _).orderBy(col("fd"))

  val qFdCheckSql: String = {
    def one(name: String, tbl: String, lhs: String, rhs: String): String =
      s"""SELECT '$name' AS fd, CAST(count(*) AS BIGINT) AS n_groups,
         |  CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
         |  CAST((CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT) * 10000)
         |    // count(*) AS BIGINT) AS viol_bp,
         |  CAST(max(ndv) AS BIGINT) AS max_rhs
         |FROM (SELECT $lhs, count(DISTINCT $rhs) AS ndv FROM $tbl GROUP BY $lhs)""".stripMargin
    Seq(one("nation_to_region", "nation", "n_nationkey", "n_regionkey"),
      one("cust_nation_to_segment", "customer", "c_nationkey", "c_mktsegment"),
      one("cust_to_priority", "orders", "o_custkey", "o_orderpriority"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
  }

  /** Columns profiled by [[qEncodingStats]]. */
  val EncodingCols = Seq("l_returnflag", "l_linestatus", "l_suppkey", "l_quantity")

  /** ENCODING-PLANNING profile — the storage-layout audit behind parquet
    * encoding choices at 100 TB: per column, cardinality (does DICTIONARY
    * encoding pay?) and the run count under the table's natural
    * (orderkey, linenumber) order (does RUN-LENGTH encoding pay?), both
    * normalized to exact basis points of the row count. `dict_bp` ≈ 0
    * means a few distinct values (dictionary wins); `rle_bp` ≈ 10000
    * means values change every row (RLE useless). Run boundaries are
    * scoped within each order — the unit a writer's row groups respect —
    * so the statistic is partition-parallel and engine-deterministic.
    *
    * Scale: one branch per profiled column, each a COLUMN-PRUNED scan
    * (only (orderkey, linenumber, col) leave parquet) into an
    * order-partitioned lag window + one aggregate with a single distinct
    * (never the multi-distinct Expand — the q_stats_manifest lesson).
    */
  def qEncodingStats(spark: SparkSession, dir: String): DataFrame =
    encodingProfile(table(spark, dir, "lineitem")
      .withColumnRenamed("l_orderkey", "ok")
      .withColumnRenamed("l_linenumber", "ln"), EncodingCols)

  /** [[qEncodingStats]]'s per-column pass over any frame with (ok, ln)
    * run-scoping keys plus the profiled columns.
    */
  def encodingProfile(rows: DataFrame, cols: Seq[String]): DataFrame = {
    // (ok, ln) need not be unique in the source data, so the run order
    // breaks remaining ties on the VALUE itself — permuting identical
    // values never changes a run count, so the statistic is total-order-
    // deterministic without assuming a unique line key.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ok")).orderBy(col("ln"), col("v"))
    val branches = cols.map { c =>
      rows
        .select(col("ok"), col("ln"), col(c).cast(StringType).as("v"))
        .withColumn("prev", lag(col("v"), 1).over(w))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("v")).as("n_distinct"),
          sum(when(col("prev").isNull || col("prev") =!= col("v"), 1L)
            .otherwise(0L)).as("runs"))
        // greatest(n, 1): an EMPTY table must degrade to an all-zero report
        // row, not abort the whole multi-column audit with ANSI
        // DIVIDE_BY_ZERO (same discipline as the FK audit's orphan_bp)
        .select(lit(c).as("col_name"), col("n"), col("n_distinct"), col("runs"),
          expr("n_distinct * 10000 DIV greatest(n, 1)").as("dict_bp"),
          expr("runs * 10000 DIV greatest(n, 1)").as("rle_bp"))
    }
    branches.reduce(_ union _).orderBy(col("col_name"))
  }

  val qEncodingStatsSql: String = {
    def branch(c: String): String =
      s"""SELECT '$c' AS col_name, count(*) AS n,
         |  CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
         |  CAST(sum(chg) AS BIGINT) AS runs,
         |  CAST(count(DISTINCT v) * 10000 // greatest(count(*), 1) AS BIGINT) AS dict_bp,
         |  CAST(CAST(sum(chg) AS BIGINT) * 10000 // greatest(count(*), 1) AS BIGINT) AS rle_bp
         |FROM (
         |  SELECT v, CASE WHEN lag(v) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, v)
         |                      IS DISTINCT FROM v THEN 1 ELSE 0 END AS chg
         |  FROM (SELECT l_orderkey, l_linenumber, CAST($c AS VARCHAR) AS v FROM lineitem) b
         |) t""".stripMargin
    EncodingCols.map(branch).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** SCHEMA-WIDE referential-integrity audit: every foreign-key edge of
    * the warehouse schema checked in one report — per FK the child row
    * count, orphan count (children whose key misses the parent), and the
    * orphan share in exact basis points. This is the whole-warehouse
    * generalization of the single-FK anti-join check: the integrity
    * dashboard a nightly pipeline publishes.
    *
    * Scale: each FK is one LEFT-ANTI join shuffled on its own key (the
    * parent side broadcasts when dimension-sized — all six here); the
    * branches are independent and union at report size (6 rows).
    */
  /** One FK edge of [[qFkAudit]] — exposed so the empty-child degradation
    * is spec-pinned directly.
    */
  private[ops] def fkBranch(fk: String, child: DataFrame, key: String,
      parent: DataFrame, pkey: String): DataFrame = {
    val c = child.select(col(key).as("k"))
    val orphans = c.join(parent.select(col(pkey).as("k")), Seq("k"), "left_anti")
    // greatest(n_rows, 1): an EMPTY child table must degrade to a 0-row
    // branch, not abort the whole audit report with the ANSI
    // divide-by-zero (0 orphans DIV 1 = 0 bp) — mirrored in the oracle
    c.agg(count(lit(1)).as("n_rows"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
      .select(lit(fk).as("fk"), col("n_rows"), col("n_orphans"),
        expr("n_orphans * 10000 DIV greatest(n_rows, 1)").as("orphan_bp"))
  }

  def qFkAudit(spark: SparkSession, dir: String): DataFrame = {
    def branch(fk: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame =
      fkBranch(fk, child, key, parent, pkey)
    val li = table(spark, dir, "lineitem")
    val ord = table(spark, dir, "orders")
    val cust = table(spark, dir, "customer")
    val supp = table(spark, dir, "supplier")
    val part = table(spark, dir, "part")
    val nat = table(spark, dir, "nation")
    val reg = table(spark, dir, "region")
    branch("lineitem.orderkey->orders", li, "l_orderkey", ord, "o_orderkey")
      .unionByName(branch("lineitem.partkey->part", li, "l_partkey", part, "p_partkey"))
      .unionByName(branch("lineitem.suppkey->supplier", li, "l_suppkey", supp, "s_suppkey"))
      .unionByName(branch("orders.custkey->customer", ord, "o_custkey", cust, "c_custkey"))
      .unionByName(branch("customer.nationkey->nation", cust, "c_nationkey", nat, "n_nationkey"))
      .unionByName(branch("nation.regionkey->region", nat, "n_regionkey", reg, "r_regionkey"))
      .orderBy(col("fk"))
  }

  val qFkAuditSql: String = {
    def branch(fk: String, child: String, key: String, parent: String, pkey: String): String =
      s"""SELECT '$fk' AS fk,
         |  CAST((SELECT count(*) FROM $child) AS BIGINT) AS n_rows,
         |  CAST((SELECT count(*) FROM $child c
         |        WHERE NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pkey = c.$key)) AS BIGINT) AS n_orphans,
         |  CAST((SELECT count(*) FROM $child c
         |        WHERE NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pkey = c.$key)) * 10000
         |    // greatest((SELECT count(*) FROM $child), 1) AS BIGINT) AS orphan_bp""".stripMargin
    Seq(
      branch("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      branch("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      branch("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      branch("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      branch("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      branch("nation.regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
      .mkString("\nUNION ALL\n") + "\nORDER BY fk"
  }

  /** SNAPSHOT DIFF — the dataset-versioning audit: given two keyed
    * snapshots of a table, classify every key as added / deleted /
    * changed / unchanged by comparing content fingerprints, and report
    * per-group counts plus the token-volume delta. This is the review a
    * curation pipeline runs before promoting a new corpus version: how
    * much moved, and where.
    *
    * Scale: ONE full-outer join on the key (the only shuffle; both
    * fingerprints are computed map-side), then a dimension-sized
    * aggregate. At 100 TB both sides are parquet snapshots and the join
    * is the standard key-partitioned reconcile — bucket both snapshots on
    * the key and it becomes co-located.
    */
  def snapshotDiff(prev: DataFrame, cur: DataFrame,
      key: String, fp: String, group: String): DataFrame = {
    val p = prev.select(col(key).as("k"), col(group).as("grp_p"),
      col(fp).as("fp_p"), col("n_tok").as("tok_p"))
    val c = cur.select(col(key).as("k"), col(group).as("grp_c"),
      col(fp).as("fp_c"), col("n_tok").as("tok_c"))
    p.join(c, Seq("k"), "full_outer")
      .select(coalesce(col("grp_c"), col("grp_p")).as("grp"),
        when(col("fp_p").isNull, "added")
          .when(col("fp_c").isNull, "deleted")
          .when(col("fp_p") =!= col("fp_c"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("tok_c"), lit(0L)).as("tc"),
        coalesce(col("tok_p"), lit(0L)).as("tp"))
      .groupBy(col("grp"), col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tc") - col("tp")).as("token_delta"))
      .orderBy(col("grp"), col("status"))
  }

  /** [[snapshotDiff]] bound to a deterministic two-snapshot scenario over
    * the documents table (the corpus holds one version, so the "previous"
    * snapshot is derived in-plan): since the archive, docs with
    * doc_id ≡ 0 (mod 11) were ADDED (absent from prev), docs ≡ 0 (mod 13)
    * were DELETED (present only in prev), and docs ≡ 0 (mod 7) were
    * CHANGED (prev carries one extra trailing token). Both sides are pure
    * projections of the same scan, so the oracle replays the scenario
    * exactly.
    */
  def qSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
    val prev = docs
      .filter(pmod(col("doc_id"), lit(11)) =!= 0)
      .select(col("doc_id"), col("source"),
        when(pmod(col("doc_id"), lit(7)) === 0, concat(col("text"), lit(" archived")))
          .otherwise(col("text")).as("text"),
        when(pmod(col("doc_id"), lit(7)) === 0, col("n_tok") + 1)
          .otherwise(col("n_tok")).as("n_tok"))
      .withColumn("fp", md5(col("text")))
    val cur = docs
      .filter(pmod(col("doc_id"), lit(13)) =!= 0)
      .withColumn("fp", md5(col("text")))
    snapshotDiff(prev, cur, "doc_id", "fp", "source")
      .withColumnRenamed("grp", "source")
  }

  val qSnapshotDiffSql: String =
    """WITH d AS (
      |  SELECT doc_id, source, text,
      |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents
      |), prev AS (
      |  SELECT doc_id, source,
      |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' archived' ELSE text END) AS fp,
      |    CASE WHEN doc_id % 7 = 0 THEN n_tok + 1 ELSE n_tok END AS tok_p
      |  FROM d WHERE doc_id % 11 <> 0
      |), cur AS (
      |  SELECT doc_id, source, md5(text) AS fp, n_tok AS tok_c
      |  FROM d WHERE doc_id % 13 <> 0
      |)
      |SELECT coalesce(cur.source, prev.source) AS source,
      |  CASE WHEN prev.fp IS NULL THEN 'added'
      |       WHEN cur.fp IS NULL THEN 'deleted'
      |       WHEN prev.fp <> cur.fp THEN 'changed'
      |       ELSE 'unchanged' END AS status,
      |  count(*) AS n_docs,
      |  CAST(sum(coalesce(cur.tok_c, 0) - coalesce(prev.tok_p, 0)) AS BIGINT) AS token_delta
      |FROM prev FULL OUTER JOIN cur USING (doc_id)
      |GROUP BY 1, 2
      |ORDER BY source, status""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_fk_audit" -> (qFkAudit _),
    "q_encoding_stats" -> (qEncodingStats _),
    "q_fd_check" -> (qFdCheck _),
    "q_benford" -> (qBenford _),
    "q_stats_manifest" -> (qStatsManifest _),
    "q_reconciliation" -> (qReconciliation _),
    "q_k_anonymity" -> (qKAnonymity _),
    "q_histogram_equidepth" -> (qHistogramEquiDepth _),
    "q_outlier_mad" -> (qOutlierMad _),
    "q_checks_report" -> (qChecksReport _),
    "q_histogram" -> (qHistogram _),
    "q_contingency" -> (qContingency _),
    "q_outlier_orders" -> (qOutlierOrders _))

  def oracle: Map[String, String] = Map(
    "q_snapshot_diff" -> qSnapshotDiffSql,
    "q_fk_audit" -> qFkAuditSql,
    "q_encoding_stats" -> qEncodingStatsSql,
    "q_fd_check" -> qFdCheckSql,
    "q_benford" -> qBenfordSql,
    "q_stats_manifest" -> qStatsManifestSql,
    "q_reconciliation" -> qReconciliationSql,
    "q_k_anonymity" -> qKAnonymitySql,
    "q_histogram_equidepth" -> qHistogramEquiDepthSql,
    "q_outlier_mad" -> qOutlierMadSql,
    "q_checks_report" -> qChecksReportSql,
    "q_histogram" -> qHistogramSql,
    "q_contingency" -> qContingencySql,
    "q_outlier_orders" -> qOutlierOrdersSql)
}
