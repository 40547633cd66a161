package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** [[Skew.adaptiveJoin]] (round 16, VERDICT r15 item 4): the skew
  * profile wired to the join strategy. Pins (a) the salted branch fires
  * on the planted-skew fixture ONLY, (b) the result equals the plain
  * join's multiset on BOTH branches, (c) the salting machinery is
  * genuinely in the routed plan, and (d) the registered query matches
  * its own profile arithmetic end-to-end.
  */
class AdaptiveJoinSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plainMultiset(fact: org.apache.spark.sql.DataFrame,
      dim: org.apache.spark.sql.DataFrame): Map[Seq[Any], Int] =
    fact.join(dim, col("k") === col("dk")).select(col("k"), col("v"), col("dv"))
      .collect().map(_.toSeq).groupBy(identity).map { case (r, g) => r -> g.length }

  private def adaptiveMultiset(out: org.apache.spark.sql.DataFrame): Map[Seq[Any], Int] =
    out.select(col("k"), col("v"), col("dv"))
      .collect().map(_.toSeq).groupBy(identity).map { case (r, g) => r -> g.length }

  test("planted 90%-hot-key fixture routes through the salted branch, multiset-equal") {
    import spark.implicits._
    // 1800 rows on key 1, one row each on keys 2..201: n=2000 over 201
    // keys → max_x_mean = 1800·201·10^4/2000 = 1,809,000 bp ≈ 181× the
    // mean — past the 100× bar
    val fact = ((1 to 1800).map(i => (1L, i.toLong)) ++
      (2 to 201).map(k => (k.toLong, 0L))).toDF("k", "v")
    val dim = (1 to 201).map(k => (k.toLong, s"d$k")).toDF("dk", "dv")
    val out = Skew.adaptiveJoin(fact, dim, "k", "dk").localCheckpoint()
    assert(out.select(max(col("salted"))).collect().head.getLong(0) === 1L,
      "planted skew must fire the salted branch")
    assert(adaptiveMultiset(out) === plainMultiset(fact, dim),
      "salted branch diverged from the plain join multiset")
  }

  test("near-uniform keys route through the plain branch, multiset-equal") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => ((i % 100).toLong, i.toLong)).toDF("k", "v")
    val dim = (0 until 100).map(k => (k.toLong, s"d$k")).toDF("dk", "dv")
    val out = Skew.adaptiveJoin(fact, dim, "k", "dk").localCheckpoint()
    assert(out.select(max(col("salted"))).collect().head.getLong(0) === 0L,
      "uniform keys must keep the plain join")
    assert(adaptiveMultiset(out) === plainMultiset(fact, dim))
  }

  test("decision scalar is the exact profile arithmetic") {
    import spark.implicits._
    // 10 keys, one with 91 rows, nine with 1: n=100, mean=10,
    // max_x_mean_bp = 91·10·10^4/100 = 91000 — below the bar
    val fact = ((1 to 91).map(i => (1L, i.toLong)) ++
      (2 to 10).map(k => (k.toLong, 0L))).toDF("k", "v")
    val dim = (1 to 10).map(k => (k.toLong, s"d$k")).toDF("dk", "dv")
    val row = Skew.adaptiveJoin(fact, dim, "k", "dk")
      .select(col("max_x_mean_bp"), col("salted")).distinct().collect()
    assert(row.length === 1)
    assert(row.head.getLong(0) === 91000L && row.head.getLong(1) === 0L)
  }

  test("the salting machinery is present in the routed plan") {
    import spark.implicits._
    val fact = (1 to 100).map(i => (1L, i.toLong)).toDF("k", "v")
    val dim = Seq((1L, "d")).toDF("dk", "dv")
    val plan = Skew.adaptiveJoin(fact, dim, "k", "dk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"), "salt hash missing from the plan")
  }

  test("registered query on the real corpus: plain branch, oracle-shape columns") {
    val rows = JoinShapes.qAdaptiveJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    // TPC-H customer keys are near-uniform in orders → plain branch
    rows.foreach { r =>
      assert(r.getLong(3) === 0L, "unexpected salted verdict on uniform corpus")
      assert(r.getLong(4) > 0L && r.getLong(4) < Skew.AdaptiveSaltBarBp)
    }
  }
}
