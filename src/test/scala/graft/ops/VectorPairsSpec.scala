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

  test("pq recon error: cells partition the corpus per subspace, bounded by the codebook") {
    val cfg = VectorSearch.PqConfig()
    val rows = Similarity.qPqReconError(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getLong(6)))
    val n = emb.count()
    rows.groupBy(_._1).foreach { case (j, cells) =>
      // every vector lands in exactly one cell of every subspace
      assert(cells.map(_._3).sum === n, s"subspace $j")
      assert(cells.length <= cfg.codebookSize, s"subspace $j")
      cells.foreach { case (_, c, nVecs, errA, errB, cellR2, cellN) =>
        // cell indices are codebook positions; counts are positive
        assert(c >= 0 && c < cfg.codebookSize)
        assert(nVecs >= 1L && cellN >= 1L && cellR2 >= 0L)
        // the decomposed pieces reconstruct a non-negative total squared
        // error: Σ_members Σ_d (x − S/N)² = errA − 2·errB/N + nVecs·Σr²/N²
        val nD = cellN.toDouble
        val recon = errA - 2.0 * (errB / nD) + nVecs * (cellR2 / (nD * nD))
        assert(recon >= -1e-6, s"subspace $j cell $c reconstructed error $recon < 0")
        // errA alone is Σ(x−g)² ≥ 0 — the N-free piece
        assert(errA >= 0.0)
      }
    }
    assert(rows.map(_._1).distinct.sorted === (0 until cfg.subspaces).map(_.toLong))
  }

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

  test("lsh pair generation caps degenerate buckets to a verified chain") {
    val s = spark
    import s.implicits._
    // 40 IDENTICAL vectors: every band bucket is one 40-member flood
    val vec = (0 until 64).map(d => (1.0 + d * 0.01).toFloat)
    val flood = (0L until 40L).map(i => (i, vec)).toDF("id", "v")
    // capped: each band emits the same sorted consecutive-id chain → 39
    // pairs, all passing the exact verify (cosine 1.0), still one component
    val capped = VectorSearch.lshCosinePairs(flood, col("id"), col("v"), 0.99, bucketCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == (0L until 39L).map(i => (i, i + 1)).toSet)
    // default cap far above the flood: the full verified clique
    val full = VectorSearch.lshCosinePairs(flood, col("id"), col("v"), 0.99)
    assert(full.count() == 40L * 39 / 2)
  }

  test("capped chain keeps a flood connected to its original across interlopers") {
    val s = spark
    import s.implicits._
    // real corpus (interloper source: band collisions admit unrelated
    // vectors into the flood's buckets) + 60 exact copies of vector 0
    // under HIGH ids — an id-ordered chain would have to cross the
    // interlopers sitting between id 0 and 9000000 and disconnect them
    // sf0.01: 500 corpus vectors make every band bucket carry interlopers
    // (P(a band clean of them) ≈ (15/16)^499 ≈ 1e-14) — the regression
    // this test pins is only exercised when no bucket is interloper-free
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val v0 = emb.orderBy("vec_id").limit(1).collect()(0).getSeq[Float](1)
    val flood = (0 until 60).map(i => (9000000L + i, v0)).toDF("vec_id", "embedding")
    val corpus = emb.union(flood)
    val capped = VectorSearch.lshCosinePairs(
        corpus, col("vec_id"), col("embedding"), 0.99, bucketCap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // signature order sorts the 61 identical vectors adjacent → the chain
    // links 0 into the flood run and every flood member is reachable
    assert(capped.contains((0L, 9000000L)))
    val adj = capped.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seen = scala.collection.mutable.Set(0L)
    val queue = scala.collection.mutable.Queue(0L)
    while (queue.nonEmpty)
      adj.getOrElse(queue.dequeue(), Nil).foreach(n =>
        if (seen.add(n)) queue.enqueue(n))
    assert((0 until 60).forall(i => seen.contains(9000000L + i)),
      "every flood member must be in id 0's component")
    // precision stays exact: no interloper pair sneaks past the verify
    val brute = VectorSearch.cosinePairs(corpus, col("vec_id"), col("embedding"), 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(brute))
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
