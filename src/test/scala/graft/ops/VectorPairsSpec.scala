package graft.ops

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** The embedding-pair operators: the blocked all-pairs join must be
  * bit-identical to the brute-force baseline (since round 10 it is the
  * LOSSLESS SPEC BASELINE — the registered `q_dedup_embedding` shape is
  * the cluster-bounded source, pinned in ClusterPairsAndServeSpec),
  * planned as an equi-join (no nested loop); the LSH-verified pair
  * generator must recover every planted high-cosine near-dup.
  */
class VectorPairsSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("blocked all-pairs equals the brute-force baseline bit-exactly") {
    for (blocks <- Seq(1, 5, 16)) {
      val brute = collectPairs(VectorSearch.cosinePairs(
        emb, col("vec_id"), col("embedding"), Dedup.CosineThreshold))
      val blocked = collectPairs(VectorSearch.cosinePairsBlocked(
        emb, col("vec_id"), col("embedding"), Dedup.CosineThreshold, blocks))
      assert(blocked == brute, s"blocks=$blocks")
      assert(brute.nonEmpty, "fixture has no qualifying pairs")
    }
  }

  test("blocked all-pairs plans as an equi-join: no nested loop, no cartesian") {
    val p = VectorSearch.cosinePairsBlocked(emb, col("vec_id"), col("embedding"),
      Dedup.CosineThreshold).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"expected an equi-join:\n$p")
  }

  test("registered q_dedup_embedding (cluster-bounded) plans without nested loops") {
    val (df, caches) = VectorSearch.clusterCosinePairsPlan(
      emb, col("vec_id"), col("embedding"), Dedup.CosineThreshold,
      VectorSearch.IvfConfig(), probes = Dedup.ClusterPairProbes, blocks = 8)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    caches.foreach(_.unpersist())
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"expected an equi-join:\n$p")
  }

  test("LSH-verified pairs recover planted near-duplicates at a high threshold") {
    // plant near-copies: tiny alternating per-dim nudge, cosine ~0.999+
    val base = emb.select(col("vec_id"), col("embedding"))
    val planted = base.select(
      (col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => x + when(pmod(i, lit(2)) === 0, lit(0.003f)).otherwise(lit(-0.003f)))
        .as("embedding"))
    val corpus = base.unionByName(planted)
    val threshold = 0.95
    val brute = collectPairs(VectorSearch.cosinePairs(
      corpus, col("vec_id"), col("embedding"), threshold))
    val lsh = collectPairs(VectorSearch.lshCosinePairs(
      corpus, col("vec_id"), col("embedding"), threshold))
    assert(lsh == brute)
    // every original must pair with its planted copy
    assert(brute.count { case (a, b, _) => b == a + 100000L } == emb.count())
  }

  test("hard negatives: top-k of the label-excluded ranking, never the query's label") {
    val k = 5
    val queryIds = Seq(0L, 100L, 200L)
    val out = VectorSearch.hardNegatives(
      emb, col("vec_id"), col("embedding"), col("label"), queryIds, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val labels = emb.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(out.length == queryIds.length * k)
    // never the query's own label, and the reported label is the true one
    assert(out.forall { case (q, _, v, lbl, _) => lbl != labels(q) && lbl == labels(v) })
    // equals the label-filtered prefix of the FULL exact ranking
    val full = VectorSearch.cosineTopK(
      emb, col("vec_id"), col("embedding"), queryIds, (emb.count() - 1).toInt)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val expected = queryIds.flatMap { q =>
      full.filter(t => t._1 == q && labels(t._2) != labels(q)).take(k)
        .zipWithIndex.map { case ((_, v, cs), i) => (q, (i + 1).toLong, v, labels(v), cs) }
    }
    assert(out.toSeq == expected)
  }
}
