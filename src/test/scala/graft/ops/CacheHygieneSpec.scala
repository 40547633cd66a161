package graft.ops

import graft.{Caches, SparkFunSuite}

/** Pins the cache-release contract (see [[graft.Caches]]): operators that
  * persist internal relations return a LIVE plan — the computation runs at
  * the caller's sink, not at construction — and ONE harness release after
  * materialization leaves zero blocks in the block manager. A regression
  * here either re-introduces eager in-operator checkpoints (plan-hiding,
  * double work) or leaks blocks across a 128-query run.
  */
class CacheHygieneSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def materializedThenReleased(df: org.apache.spark.sql.DataFrame): Unit = {
    df.write.format("noop").mode("overwrite").save()
    // the operator cached its internal relation(s) while the sink ran...
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected the operator to persist an internal relation")
    // ...and the harness release empties the block manager
    Caches.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "dead cached blocks left after releaseAll")
  }

  test("q_triangles: live plan, caches fully released after materialization") {
    Caches.releaseAll(spark) // clean slate from prior suites
    materializedThenReleased(Graph.qTriangles(spark, sf))
  }

  test("q_sparse_sim_join: live plan, caches fully released after materialization") {
    Caches.releaseAll(spark)
    materializedThenReleased(TextAnalysis.qSparseSimJoin(spark, sf))
  }
}
