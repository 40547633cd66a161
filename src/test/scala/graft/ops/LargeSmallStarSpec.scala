package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkFunSuite

/** The distributed large-star/small-star component path: exactness vs the
  * union-find reference (random graphs via ScalaCheck), equivalence of the
  * forced-distributed and driver canonicalize paths on real pair data, and
  * the log-rounds convergence bound on the propagation worst case (a long
  * chain — min-label sweeps would need `n` rounds there).
  */
class LargeSmallStarSpec extends SparkFunSuite {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("id_a", "id_b")
    val (labels, last) = TextDedup.largeSmallStarComponents(df, maxRounds = 30)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    last.unpersist()
    out
  }

  test("componentsStrategy pins the union-find/distributed boundary at the cap") {
    val cap = 1L << 22
    assert(TextDedup.componentsStrategy(cap, cap) === "union-find")
    assert(TextDedup.componentsStrategy(cap + 1, cap) === "large-small-star")
    assert(TextDedup.componentsStrategy(0L, cap) === "union-find")
  }

  test("property: large-star/small-star equals union-find min-label components") {
    val edgeGen = for {
      a <- Gen.choose(0L, 30L)
      b <- Gen.choose(0L, 30L)
    } yield (a, b)
    val p = Prop.forAll(Gen.listOfN(12, edgeGen)) { edges: List[(Long, Long)] =>
      val real = edges.filter { case (a, b) => a != b }
      labelsOf(edges) == TextDedup.unionFindMinLabels(real.iterator)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  test("forced-distributed canonicalize (driverMaxEdges = 0) matches the driver path") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ids = docs.select(col("doc_id").as("id"))
    def run(driverMax: Long) = {
      val pairs = TextDedup.jaccardPairs(docs, col("doc_id"), col("text"),
        Dedup.ShingleK, Dedup.JaccardThreshold)
      TextDedup.canonicalize(pairs, ids, driverMaxEdges = driverMax)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val driver = run(1L << 22)
    val distributed = run(0L)
    assert(distributed == driver)
    assert(driver.exists { case (id, canon) => id != canon }, "fixture has no clusters")
  }

  test("long chain converges in O(log n) rounds, not O(diameter)") {
    val n = 1024
    val chain = spark.range(0, n - 1).select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val (stars, rounds) = TextDedup.largeSmallStarRounds(chain, maxRounds = 30)
    val labels = stars.collect().map(r => (r.getLong(0), r.getLong(1)))
    stars.unpersist()
    // a 1024-node path has diameter 1023; label propagation needs ~1023
    // sweeps, the star rounds must stay logarithmic
    assert(rounds <= 15, s"expected ~log2($n)=10 rounds, got $rounds")
    assert(labels.forall(_._2 == 0L), "every chain node must label to the minimum (0)")
    assert(labels.map(_._1).toSet == (1L until n.toLong).toSet)
  }
}
