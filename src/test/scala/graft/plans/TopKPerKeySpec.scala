package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native top-k-per-key operator: window-equivalence (the semantics
  * contract), the partial→exchange→final physical shape (the scale
  * contract), shuffle elision on pre-clustered input, and edge cases.
  */
class TopKPerKeySpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def li = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  private def windowed(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  private def native(df: DataFrame, k: Int): DataFrame =
    TopKPerKey.perKey(df,
      Seq(col("l_suppkey")),
      Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
      k)

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy(col("l_suppkey"), col("rnk")).collect().map(_.toSeq).toSeq

  test("matches the filtered row_number window exactly (total order)") {
    for (k <- Seq(1, 2, 7)) {
      assert(sorted(native(li, k)) == sorted(windowed(li, k)), s"k=$k")
    }
  }

  test("k larger than every group degrades to the full input with ranks") {
    val k = 100000
    assert(sorted(native(li, k)) == sorted(windowed(li, k)))
  }

  test("plans as partial heaps -> key exchange -> pruned sort -> final group-limit") {
    val p = native(li, 2).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val partials = "\\bTopKPerKey\\b".r.findAllIn(p).size
    assert(partials >= 2, s"expected partial+final TopKPerKey nodes:\n$p")
    assert(p.contains("Exchange"), p)
    assert(!p.contains("WindowExec") && !p.contains("RunningWindow"), p)
    // exactly one sort, and it runs over partial-pruned rows, not the full
    // input: in the top-down tree, Sort sits between final TopKPerKey and
    // the Exchange, with the partial TopKPerKey below the Exchange
    val tree = p.split("\n").toSeq
    def firstIdx(s: String) = tree.indexWhere(_.contains(s))
    def lastIdx(s: String) = tree.lastIndexWhere(l => l.contains(s) && !l.trim.startsWith("("))
    assert("\\(\\d+\\) Sort".r.findAllIn(p).size == 1, s"expected exactly one Sort:\n$p")
    val finalTopK = firstIdx("TopKPerKey")
    val sortIdx = firstIdx("Sort")
    val exchIdx = firstIdx("Exchange")
    val partialTopK = lastIdx("TopKPerKey")
    assert(finalTopK < sortIdx && sortIdx < exchIdx && exchIdx < partialTopK,
      s"sort must sit above the exchange (pruned rows), below the final phase:\n$p")
  }

  test("exchange is elided when the input is already clustered on the keys") {
    val pre = li.repartition(col("l_suppkey"))
    val p = native(pre, 2).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // formatted explain prints each node twice (tree + detail); count the
    // "(n) Exchange" detail headers only
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected only the explicit repartition exchange:\n$p")
    assert(sorted(native(pre, 2)) == sorted(windowed(li, 2)))
  }

  test("ties broken by the caller's tiebreak columns, ranks contiguous from 1") {
    import spark.implicits._
    // every price identical → order falls to (orderkey, linenumber)
    val flat = li.withColumn("l_extendedprice", lit(1.0))
    val got = sorted(native(flat, 3))
    val want = sorted(windowed(flat, 3))
    assert(got == want)
    val ranksPerKey = got.groupBy(_.head).view.mapValues(_.map(_.last)).toMap
    assert(ranksPerKey.values.forall(rs => rs == (1 to rs.size).toSeq))
  }

  test("empty input produces empty output") {
    val empty = li.filter(col("l_suppkey") < -1)
    assert(native(empty, 3).collect().isEmpty)
  }

  test("null keys form one group, same as the window") {
    val withNulls = li.withColumn("l_suppkey",
      when(col("l_suppkey") % 7 === 0, lit(null)).otherwise(col("l_suppkey")))
    assert(sorted(native(withNulls, 2)) == sorted(windowed(withNulls, 2)))
  }

  test("global top-k (no keys) plans AllTuples and matches the global window") {
    import spark.implicits._
    val w = Window.orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val want = li.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .orderBy(col("rnk")).collect().map(_.toSeq).toSeq
    val got = TopKPerKey.perKey(li, Seq.empty,
      Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc), 5)
      .orderBy(col("rnk")).collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("partial key-cap: pass-through keeps results exact") {
    val prev = spark.conf.getOption(TopKPerKey.maxPartialKeysConf)
    spark.conf.set(TopKPerKey.maxPartialKeysConf, "1")
    try {
      assert(sorted(native(li, 3)) == sorted(windowed(li, 3)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(TopKPerKey.maxPartialKeysConf, v)
        case None => spark.conf.unset(TopKPerKey.maxPartialKeysConf)
      }
    }
  }

  test("rule leaves a global (no PARTITION BY) filtered row_number query working") {
    // regression: rewriting a global window used to produce
    // ClusteredDistribution(Nil), which the planner rejects
    import org.apache.spark.sql.classic
    val cs = spark.asInstanceOf[classic.SparkSession]
    val prevOpt = cs.experimental.extraOptimizations
    val prevStrat = cs.experimental.extraStrategies
    cs.experimental.extraOptimizations = prevOpt :+ NativeTopKRule
    cs.experimental.extraStrategies = prevStrat :+ new TopKPerKeyStrategy
    try {
      val w = Window.orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      val q = li.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 4)
      val got = q.orderBy(col("rnk")).collect().map(_.toSeq).toSeq
      cs.experimental.extraOptimizations = prevOpt
      val want = li.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 4)
        .orderBy(col("rnk")).collect().map(_.toSeq).toSeq
      assert(got == want)
    } finally {
      cs.experimental.extraOptimizations = prevOpt
      cs.experimental.extraStrategies = prevStrat
    }
  }

  test("NativeTopKRule rewrites the filtered row_number window to TopKPerKey") {
    import org.apache.spark.sql.classic
    val cs = spark.asInstanceOf[classic.SparkSession]
    val prevOpt = cs.experimental.extraOptimizations
    val prevStrat = cs.experimental.extraStrategies
    cs.experimental.extraOptimizations = prevOpt :+ NativeTopKRule
    cs.experimental.extraStrategies = prevStrat :+ new TopKPerKeyStrategy
    try {
      // plain window idiom — no graft API in sight
      val q = windowed(li, 2).filter(col("l_extendedprice") > 0)
      val p = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert("\\(\\d+\\) TopKPerKey".r.findAllIn(p).size == 2,
        s"expected partial+final TopKPerKey from the rule:\n$p")
      assert(!p.contains("( Window"), p)
      assert(!"\\(\\d+\\) Window".r.findAllIn(p).hasNext, s"WindowExec survived the rewrite:\n$p")
      // the non-rank conjunct must survive as a residual filter
      assert("\\(\\d+\\) Filter".r.findAllIn(p).nonEmpty, p)
      val got = q.orderBy(col("l_suppkey"), col("rnk")).collect().map(_.toSeq).toSeq
      cs.experimental.extraOptimizations = prevOpt // plan the reference without the rule
      val want = sorted(windowed(li, 2).filter(col("l_extendedprice") > 0))
      assert(got == want)
    } finally {
      cs.experimental.extraOptimizations = prevOpt
      cs.experimental.extraStrategies = prevStrat
    }
  }
}
