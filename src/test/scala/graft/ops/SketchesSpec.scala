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

  test("rerun determinism") {
    val a = Sketches.qSketchHll(spark, sf).collect().toSeq
    val b = Sketches.qSketchHll(spark, sf).collect().toSeq
    assert(a == b)
  }
}
