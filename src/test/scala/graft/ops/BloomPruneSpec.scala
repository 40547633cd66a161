package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction: the pruned join must equal the plain join
  * exactly, the pre-filter must actually remove non-matching fact rows,
  * and the probe must stay a codegen predicate (no UDF node).
  */
class BloomPruneSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("bloom-pruned join equals the plain join exactly") {
    val big = Tables.table(spark, sf, "lineitem")
    val small = Tables.table(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val pruned = BloomPrune.bloomPrunedJoin(big, small, "l_orderkey", "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"))
    val plain = big.join(small, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("the pre-filter prunes most non-matching fact rows") {
    val big = Tables.table(spark, sf, "lineitem")
    val small = Tables.table(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val total = big.count()
    val matching = big.join(small, col("l_orderkey") === col("o_orderkey")).count()
    val kept = big.filter(
      BloomPrune.mightContainKey(big, small, "l_orderkey", "o_orderkey")).count()
    assert(kept >= matching, "bloom filters must never drop a matching row")
    // 1% fpp: kept ≈ matching + 0.01 * (total - matching); allow 5x slack
    assert(kept <= matching + math.max(50L, (0.05 * (total - matching)).toLong),
      s"pruning ineffective: kept $kept of $total (matching $matching)")
  }

  test("the probe predicate is a plan-native expression, not a UDF") {
    val big = Tables.table(spark, sf, "lineitem")
    val small = Tables.table(spark, sf, "orders").limit(10).select(col("o_orderkey"))
    val plan = big.filter(
      BloomPrune.mightContainKey(big, small, "l_orderkey", "o_orderkey", expectedItems = 10))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected bloom probe in plan:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"UDF leaked into probe plan:\n$plan")
  }
}
