package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank must equal the single-reducer window
  * row_number on the same total order, for any partition count and any
  * input partitioning.
  */
class RankSpec extends SparkFunSuite {

  test("globalRank equals window row_number across partition counts") {
    val ord = Tables.table(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_totalprice"), col("o_orderkey"))
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    val want = ord.withColumn("rnk", row_number().over(w).cast("long"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    for (parts <- Seq(1, 3, 16)) {
      val got = Rank.globalRank(ord.repartition(7),
          Seq(col("o_totalprice"), col("o_orderkey")), numParts = parts)
        .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(got === want, s"ranks diverged at numParts=$parts")
    }
  }

  test("ranks are a dense 1..n permutation") {
    val ord = Tables.table(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_totalprice"), col("o_orderkey"))
    val ranks = Rank.globalRank(ord, Seq(col("o_totalprice"), col("o_orderkey")), 5)
      .select(col("rnk")).collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq === (1L to ranks.length).toSeq)
  }
}
