package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Approximate/sketch operators — the constant-memory substitutes a
  * 100 TB pipeline uses where exact answers would shuffle too much:
  * HyperLogLog distinct counts, approximate percentiles, Bloom-filter
  * membership, count-min frequency, and seeded/stratified sampling.
  * Not DuckDB-oracle-expressible (engine-specific sketches), so pinned
  * here by statistical bounds against the exact answers at sf0.01.
  */
class SketchSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.01"
  private def li = Tables.table(spark, sf, "lineitem")

  test("approx_count_distinct tracks exact distinct within configured rsd") {
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), rsd = 0.02))
      .head().getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.06, s"HLL rel err $relErr (exact=$exact approx=$approx)")
  }

  test("approx_percentile lands within rank tolerance of the exact percentile") {
    val n = li.count()
    val approxMedian = li
      .select(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    // rank of the approximate median must be within accuracy bound of n/2
    val rank = li.filter(col("l_extendedprice") <= approxMedian).count()
    assert(math.abs(rank - n / 2).toDouble / n < 0.01,
      s"approx median rank off by ${math.abs(rank - n / 2).toDouble / n}")
  }

  test("bloom filter: no false negatives, bounded false positives") {
    val keys = li.select(col("l_partkey")).limit(20000)
    val bf = keys.stat.bloomFilter("l_partkey", expectedNumItems = 20000, fpp = 0.01)
    val present = keys.collect().map(_.getLong(0))
    assert(present.forall(bf.mightContain(_)), "bloom filter false negative")
    val absent = (1000000L to 1002000L).filterNot(present.toSet)
    val fp = absent.count(bf.mightContain(_)).toDouble / absent.size
    assert(fp < 0.05, s"bloom false-positive rate $fp")
  }

  test("count-min sketch overestimates but never underestimates frequencies") {
    val cms = li.stat.countMinSketch(col("l_returnflag"), eps = 0.001, confidence = 0.99, seed = 42)
    val exact = li.groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, s"CMS underestimated $k: $est < $n")
      assert(est <= n + (0.001 * li.count()).toLong + 1, s"CMS overshot $k: $est vs $n")
    }
  }

  test("seeded sample is deterministic; stratified sampleBy hits per-stratum fractions") {
    val s1 = li.sample(withReplacement = false, fraction = 0.1, seed = 7).count()
    val s2 = li.sample(withReplacement = false, fraction = 0.1, seed = 7).count()
    assert(s1 == s2, "same-seed sample not deterministic")
    val n = li.count()
    assert(math.abs(s1 - 0.1 * n) / n < 0.02)

    val fractions = Map("A" -> 0.05, "N" -> 0.2, "R" -> 0.1)
    val strat = li.stat.sampleBy("l_returnflag", fractions, seed = 7)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (k, f) =>
      val got = strat.getOrElse(k, 0L).toDouble / totals(k)
      assert(math.abs(got - f) < 0.03, s"stratum $k fraction $got != $f")
    }
  }
}
