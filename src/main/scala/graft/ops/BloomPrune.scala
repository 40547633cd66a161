package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction: prune the FACT side of a join with a
  * Bloom filter built from the (already filtered) dimension side's keys,
  * BEFORE the join's shuffle. The joined result is exact — Bloom false
  * positives survive the pre-filter but die in the real join; the filter
  * only decides how many non-matching fact rows pay shuffle cost.
  *
  * This is the manual, deterministic dual of Spark's own runtime
  * row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`
  * / InjectRuntimeFilter): exposed as an operator so pipelines can apply
  * it where the optimizer's cost heuristics decline (small build-side
  * scans under the creation threshold, joins hidden behind custom nodes)
  * and so the pruned scan is pinnable by plan tests.
  *
  * 100-TB shape: the build is `stat.bloomFilter`'s treeAggregate —
  * executor-side partial sketches, a driver merge of sketch-sized blobs
  * (MBs, control-plane) — and the probe ships the merged sketch to
  * executors once as a codegen reference object (same distribution cost
  * as a broadcast variable). With a 1% FPP the fact side's shuffle volume
  * drops to ~(selectivity + 0.01) of the scan, while the join itself is
  * unchanged and exact. The probe stays inside whole-stage codegen
  * (`BloomFilterMightContain` over `xxhash64` — no UDF boundary).
  */
object BloomPrune {

  /** `big ⋈ small` on `bigKey == smallKey`, with `big` Bloom-pruned first.
    *
    * @param expectedItems build-side distinct-key estimate for sizing; 0 →
    *   count the build side (one extra job over the small relation)
    * @param fpp false-positive probability (shuffle waste, not accuracy)
    */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame =
    big.filter(mightContainKey(big, small, bigKey, smallKey, expectedItems, fpp))
      .join(small, col(bigKey) === col(smallKey))

  /** The pruning predicate alone (for callers composing their own join or
    * pinning the pruned scan in plan tests).
    */
  def mightContainKey(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 0L, fpp: Double = 0.01): Column = {
    val hashed = small.select(xxhash64(col(smallKey)).as("h"))
    val items = if (expectedItems > 0) expectedItems else hashed.count()
    // treeAggregate build: partial sketches on executors, merged sketch
    // (not the keys) returned to the driver
    val bf = hashed.stat.bloomFilter("h", math.max(items, 1L), fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    // Probe must hash exactly as the build did: stat.bloomFilter putLong
    // over functions.xxhash64 (seed 42) == XxHash64(key, 42) here.
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      XxHash64(Seq(PlanBridge.expression(big.sparkSession, col(bigKey))), 42L)))
  }
}
