package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Pins integer-PageRank semantics the oracle can't see: a hand-computed
  * fixture, the symmetric-cycle fixed point, and repartition invariance
  * (exact long sums — no float drift at any parallelism).
  */
class GraphSpec extends SparkFunSuite {

  test("2-cycle is a fixed point: rank stays at one unit") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pageRankInt(edges, iters = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    // contrib = 1000000 DIV 1; rank = 150000 + 850000 = 1000000
    assert(r === Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("star graph: hand-computed one-iteration ranks") {
    import spark.implicits._
    // 1 -> {2,3}; 2 -> 1; 3 -> 1 (outdeg(1)=2)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val r1 = Graph.pageRankInt(edges, iters = 1).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    // node1: 150000 + 85*(1e6 + 1e6) DIV 100 = 150000 + 1700000
    assert(r1(1L) === 1850000L)
    // node2/3: 150000 + 85*(1e6 DIV 2) DIV 100 = 150000 + 425000
    assert(r1(2L) === 575000L && r1(3L) === 575000L)
  }

  test("ranks are repartition-invariant (exact integer sums)") {
    val edges = Graph.coOrderEdges(spark, "/root/testdata/sf0.001")
    val a = Graph.pageRankInt(edges, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.pageRankInt(edges.repartition(17), iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty && a.forall(_._2 >= 150000L))
  }
}
