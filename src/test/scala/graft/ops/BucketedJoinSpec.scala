package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle co-located join strategy for repeated
  * fact-fact joins at 100 TB (SCALE.md): write both sides bucketed on the
  * join key; subsequent joins read bucket-aligned and skip BOTH shuffles.
  * This spec proves the plan shape (no Exchange on either side) and result
  * equality with the plain join.
  */
class BucketedJoinSpec extends SparkFunSuite {

  test("bucketed fact-fact join plans without a shuffle and matches plain join") {
    val sf = "/root/testdata/sf0.001"
    val wh = tmpDir("bucket-warehouse") // explicit external paths — the
    // static warehouse dir can't change on a live session
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ord = spark.read.parquet(s"$sf/orders.parquet")

    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // bucket-aligned scan: the only exchange allowed is the aggregate's
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"join still shuffles:\n$plan")

    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val a = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = plain.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)

    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
  }
}
