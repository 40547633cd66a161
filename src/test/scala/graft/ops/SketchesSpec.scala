package graft.ops

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** The mergeable-sketch pack: mergeability (the property that makes a
  * sketch the 100 TB shape — partial sketches combine associatively, so
  * map-side partials carry the whole answer), the CMS overestimate-only
  * invariant, error bounds at the configured precisions, and the plan
  * facts (partial aggregation for the register build; the native
  * TopKPerKey partial stage for the KMV bottom-k).
  */
class SketchesSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("hll registers merge: max of part registers equals union registers") {
    val src = Sketches.sourceShingles(spark, sf)
    // split the item stream arbitrarily (by shingle hash parity) — any
    // partition of the stream must merge to the same registers
    val parity = abs(xxhash64(col("s"))) % 2
    val a = src.filter(parity === 0)
    val b = src.filter(parity === 1)
    val merged = Sketches.hllRegisters(a).unionByName(Sketches.hllRegisters(b))
      .groupBy(col("source"), col("bucket")).agg(max(col("m_j")).as("m_j"))
    val full = Sketches.hllRegisters(src)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    // and therefore the estimates agree too
    val eFull = Sketches.hllEstimate(full).select("source", "est_distinct").collect().toSet
    val eMerged = Sketches.hllEstimate(merged).select("source", "est_distinct").collect().toSet
    assert(eFull == eMerged)
  }

  test("native hll aggregate is register-identical to the SQL formulation") {
    val src = Sketches.sourceShingles(spark, sf)
    val sql = Sketches.hllRegisters(src)
    val native = Sketches.hllRegistersNative(src)
    assert(sql.exceptAll(native).isEmpty && native.exceptAll(sql).isEmpty)
    // and the equality is partition-layout invariant (the buffer merge
    // path, not just single-partition update)
    val nativeWide = Sketches.hllRegistersNative(src.repartition(13, col("s")))
    assert(sql.exceptAll(nativeWide).isEmpty && nativeWide.exceptAll(sql).isEmpty)
  }

  test("cms counters merge: cellwise sum of part counters equals union counters") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val postings = TextDedup.shingles(docs, col("doc_id"), col("text"), Dedup.ShingleK)
    val df = TextDedup.materializeAndRelease(
      postings.groupBy(col("s")).agg(count(lit(1)).as("df")), postings)
    val a = df.filter(abs(xxhash64(col("s"))) % 2 === 0)
    val b = df.filter(abs(xxhash64(col("s"))) % 2 === 1)
    val merged = Sketches.cmsCounters(a).unionByName(Sketches.cmsCounters(b))
      .groupBy(col("r"), col("idx")).agg(sum(col("c")).as("c"))
    val full = Sketches.cmsCounters(df)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("cms never under-counts and the error respects the d x w bound") {
    val out = Sketches.qSketchCms(spark, sf).collect()
    assert(out.length == Sketches.CmsTopK)
    // CMS invariant: est >= true for every probe
    assert(out.forall(r => r.getAs[Long]("est_df") >= r.getAs[Long]("true_df")))
    // Markov bound: P(over > e*N/w) < (1/e)^d; with d=4 a violation at
    // every probed item would be astronomically unlikely — assert the
    // MEAN overestimate is under e*N/w (N = total postings mass)
    val spark2 = spark
    val n = spark2.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val totalPostings = TextDedup.shingles(n, col("doc_id"), col("text"), Dedup.ShingleK).count()
    val bound = math.E * totalPostings / Sketches.CmsWidth
    val meanOver = out.map(r => (r.getAs[Long]("est_df") - r.getAs[Long]("true_df")).toDouble)
      .sum / out.length
    assert(meanOver <= bound, s"mean over $meanOver vs e*N/w bound $bound")
  }

  test("hll and kmv errors sit inside 3-sigma of their configured precisions") {
    val hll = Sketches.qSketchHll(spark, sf).collect()
    assert(hll.nonEmpty)
    // sigma = 1.04/sqrt(m) for HLL
    val hllBound = 3 * 1.04 / math.sqrt(Sketches.HllM.toDouble) * 10000
    assert(hll.forall(r => math.abs(r.getAs[Long]("err_bp")) <= hllBound),
      hll.map(r => r.getAs[Long]("err_bp")).mkString(","))
    // sigma ~ 1/sqrt(k-2) for KMV
    val kmv = Sketches.qSketchKmv(spark, sf).collect()
    assert(kmv.nonEmpty)
    val kmvBound = 3.0 / math.sqrt((Sketches.KmvK - 2).toDouble) * 10000
    assert(kmv.forall(r => math.abs(r.getAs[Long]("err_bp")) <= kmvBound),
      kmv.map(r => r.getAs[Long]("err_bp")).mkString(","))
  }

  test("plan facts: partial register aggregation; kmv rides TopKPerKey") {
    val regPlan = Sketches.hllRegisters(Sketches.sourceShingles(spark, sf))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the register build is a two-phase hash aggregate (map-side partial
    // max before the exchange) — the mergeable-sketch property as a plan fact
    assert(regPlan.contains("HashAggregate"), regPlan)
    assert(!regPlan.contains("CartesianProduct"), regPlan)
    val kmvPlan = Sketches.qSketchKmv(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(kmvPlan.contains("TopKPerKey"), kmvPlan)
  }

  test("kmv overlap: estimates bounded and exact when the union fits the sketch") {
    val out = Sketches.qSketchOverlap(spark, sf).collect()
    assert(out.nonEmpty)
    // invariants: matches <= n_used <= k, estimate a valid bp fraction
    assert(out.forall { r =>
      val (n, m) = (r.getAs[Long]("n_used"), r.getAs[Long]("matches"))
      m >= 0 && m <= n && n <= Sketches.KmvK &&
        r.getAs[Long]("est_jaccard_bp") >= 0 && r.getAs[Long]("est_jaccard_bp") <= 10000
    })
    // accuracy on the real pairs: mean absolute error within 2 sigma of
    // the binomial estimator at k (deterministic data, loose envelope)
    val meanAbs = out.map(r => math.abs(r.getAs[Long]("err_bp")).toDouble).sum / out.length
    assert(meanAbs <= 2 * math.sqrt(0.1 * 0.9 / Sketches.KmvK) * 10000, s"meanAbs=$meanAbs")

    // union <= k: the sketch IS the set and the estimate must be EXACT —
    // two tiny sources sharing 10 of their 30 shingle-words each
    val s = spark
    import s.implicits._
    def text(lo: Int, hi: Int) = (lo until hi).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, text(0, 30), "en", "tiny_a", 1L),
      (2L, text(20, 50), "en", "tiny_b", 1L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("kmv-exact")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tiny = Sketches.qSketchOverlap(spark, dir).collect()
    assert(tiny.length == 1)
    // 28 shingles each, 8 shared (3-shingles of a 10-word overlap)
    assert(tiny.head.getAs[Long]("err_bp") == 0L,
      s"union below k must estimate exactly: ${tiny.head}")
    assert(tiny.head.getAs[Long]("est_jaccard_bp") ==
      tiny.head.getAs[Long]("exact_jaccard_bp"))
  }

  test("histogram quantiles: merge law holds and estimates stay inside one bin width") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("n_chars"), col("doc_id"))
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val merged = Sketches.lengthHistogram(a).unionByName(Sketches.lengthHistogram(b))
      .groupBy(col("source"), col("bin")).agg(sum(col("cnt")).as("cnt"))
    val full = Sketches.lengthHistogram(docs)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)

    val out = Sketches.qSketchQuantile(spark, sf).collect()
    assert(out.length == 20 * Sketches.HistPs.length)
    // the estimate interpolates inside the carrying bin, and the exact
    // rank-r order statistic lies in a bin whose running count reaches r
    // no earlier — est can undershoot by at most one full bin
    assert(out.forall(r =>
      math.abs(r.getAs[Long]("est_chars") - r.getAs[Long]("exact_chars")) <= Sketches.HistW),
      out.map(r => (r.getAs[Long]("est_chars"), r.getAs[Long]("exact_chars"))).mkString(","))
  }

  test("ams f2: unbiased self-join-size estimate within the w-bound envelope") {
    val out = Sketches.qSketchF2(spark, sf).collect()
    assert(out.length == 1)
    val (est, exact) = (out.head.getAs[Long]("est_f2"), out.head.getAs[Long]("exact_f2"))
    assert(exact > 0 && est > 0)
    // per-row sigma = sqrt(2/w) * F2 (~3.1% at w=2048); the lower median
    // of 4 unbiased rows stays well inside 3 sigma (deterministic data)
    val bound = 3 * math.sqrt(2.0 / Sketches.CmsWidth) * 10000
    assert(math.abs(out.head.getAs[Long]("err_bp")) <= bound,
      s"est=$est exact=$exact err=${out.head.getAs[Long]("err_bp")} bound=$bound")
  }

  test("ams join size: unbiased cross-relation inner product prices the join") {
    val out = Sketches.qSketchJoinsize(spark, sf).collect()
    assert(out.length == 1)
    val (est, exact) = (out.head.getAs[Long]("est_rows"), out.head.getAs[Long]("exact_rows"))
    assert(exact > 0 && est > 0)
    // events x orders on the customer key is genuinely skewed (15 hot
    // users); per-row sigma ~ sqrt(F2(ev)*F2(ord))/w relative to the true
    // size lands in the few-percent range — pin a deterministic 25%
    // envelope, far below the order-of-magnitude a planner needs
    assert(math.abs(out.head.getAs[Long]("err_bp")) <= 2500,
      s"est=$est exact=$exact err=${out.head.getAs[Long]("err_bp")}")
  }

  test("rerun determinism") {
    val a = Sketches.qSketchHll(spark, sf).collect().toSeq
    val b = Sketches.qSketchHll(spark, sf).collect().toSeq
    assert(a == b)
  }
}
