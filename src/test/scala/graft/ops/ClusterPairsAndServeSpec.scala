package graft.ops

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Round-10 surface: the cluster-bounded embedding pair source (the
  * registered successor of the exact all-pairs scan), the derived-√n
  * centroid count, the persisted-LSH serving lifecycle, index-served rank
  * fusion, and the md5-sampled recall audit.
  */
class ClusterPairsAndServeSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("cluster-bounded pairs: exact-precision subset of the blocked baseline") {
    val exact = collectPairs(VectorSearch.cosinePairsBlocked(
      emb, col("vec_id"), col("embedding"), Dedup.CosineThreshold)).toSet
    val clustered = collectPairs(VectorSearch.clusterCosinePairs(
      emb, col("vec_id"), col("embedding"), Dedup.CosineThreshold,
      probes = Dedup.ClusterPairProbes))
    // every emitted pair is a TRUE pair with the identical rounded cosine
    // (precision exact); only recall is bounded by the probe-bucket overlap
    assert(clustered.toSet.subsetOf(exact), s"false positives: ${clustered.toSet -- exact}")
    assert(clustered.nonEmpty, "fixture yields no co-bucketed pairs")
    // no duplicate pairs survive the multi-probe dedup
    assert(clustered.map(p => (p._1, p._2)).distinct.size == clustered.size)
  }

  test("cluster-bounded pairs: deterministic under repartitioning") {
    val a = collectPairs(VectorSearch.clusterCosinePairs(
      emb, col("vec_id"), col("embedding"), Dedup.CosineThreshold))
    val b = collectPairs(VectorSearch.clusterCosinePairs(
      emb.repartition(7), col("vec_id"), col("embedding"), Dedup.CosineThreshold))
    assert(a == b)
  }

  test("multi-probe assignment strictly widens single-assignment recall") {
    val single = collectPairs(VectorSearch.clusterCosinePairs(
      emb, col("vec_id"), col("embedding"), Dedup.CosineThreshold, probes = 1)).toSet
    val multi = collectPairs(VectorSearch.clusterCosinePairs(
      emb, col("vec_id"), col("embedding"), Dedup.CosineThreshold, probes = 2)).toSet
    assert(single.subsetOf(multi))
  }

  test("derived centroid count: floor(sqrt(n)) with a 16 floor, used by the clustering") {
    assert(VectorSearch.derivedCentroids(500) == 22)
    assert(VectorSearch.derivedCentroids(2000) == 44)
    assert(VectorSearch.derivedCentroids(20000) == 141)
    assert(VectorSearch.derivedCentroids(100) == 16) // the floor
    // the real-table clustering actually spreads over ~derived-k clusters:
    // more than the old fixed 16, no more than the derived bound
    val k = VectorSearch.derivedCentroids(emb.count())
    val clusters = VectorSearch.semDedup(
      emb, col("vec_id"), col("embedding"), Similarity.SemThreshold)
      .select(col("cluster")).distinct().count()
    assert(clusters > 16 && clusters <= k, s"clusters=$clusters derived k=$k")
  }

  test("lsh index lifecycle: stored-index serving is bit-identical to the in-session search") {
    val indexDir = tmpDir("lsh-spec-index")
    VectorSearch.writeLshIndex(emb, col("vec_id"), col("embedding"), indexDir)
    val qids = Similarity.QueryIds
    val live = VectorSearch.lshTopK(
      emb, col("vec_id"), col("embedding"), qids, Similarity.K).collect().toSeq
    val stored = VectorSearch.lshTopKFromIndex(
      emb, col("vec_id"), col("embedding"), indexDir, qids, Similarity.K).collect().toSeq
    assert(stored == live)
  }

  test("rank fusion from stored indexes equals fusing the in-session searches") {
    val served = Similarity.qRankFusion(spark, sf).collect().toSeq
    val inSession = Similarity.fuseRrf(
      Similarity.qSimIvfTopK(spark, sf), Similarity.qSimLshTopK(spark, sf))
      .collect().toSeq
    assert(served == inSession)
    assert(served.nonEmpty)
  }

  test("sampled recall audit equals the full audit restricted to the md5-kept queries") {
    val kept = Similarity.QueryIds.filter(Similarity.annSampleKeep)
    assert(kept == Seq(200L, 400L)) // the pinned sample at the registered ids
    val full = Similarity.qAnnRecall(spark, sf).collect().toSeq
    val sampled = Similarity.qAnnRecallSampled(spark, sf).collect().toSeq
    assert(sampled == full.filter(r => kept.contains(r.getLong(1))))
    assert(sampled.nonEmpty)
  }

  test("stored-index recall audit is bit-identical to the in-session audit") {
    val live = Similarity.qAnnRecall(spark, sf).collect().toSeq
    val indexed = Similarity.qAnnRecallIndexed(spark, sf).collect().toSeq
    assert(indexed == live)
  }

  test("fk audit branch: empty child degrades to a 0-bp row, no divide-by-zero") {
    val s = spark
    import s.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val emptyChild = Seq.empty[Long].toDF("fkey")
    val row = Checks.fkBranch("empty.fkey->parent", emptyChild, "fkey", parent, "pk")
      .collect()(0)
    assert(row.getLong(1) == 0L && row.getLong(2) == 0L && row.getLong(3) == 0L)
  }

  test("ivf refresh: append-only ingest is split-invariant and serves batch vectors") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    val qids = Similarity.QueryIds
    val one = tmpDir("ivf-refresh-one")
    VectorSearch.writeIvfIndex(corpus, col("vec_id"), col("embedding"), one)
    VectorSearch.refreshIvfIndex(batch, col("vec_id"), col("embedding"), one)
    val servedOne = VectorSearch.ivfTopKFromIndex(
      emb, col("vec_id"), col("embedding"), one, qids, Similarity.K).collect().toSeq
    // the same ingest split into two commits must serve identically —
    // append-only refresh is order/split-invariant because assignment is
    // per-vector against frozen centroids
    val two = tmpDir("ivf-refresh-two")
    VectorSearch.writeIvfIndex(corpus, col("vec_id"), col("embedding"), two)
    VectorSearch.refreshIvfIndex(
      batch.filter(col("vec_id") < 250), col("vec_id"), col("embedding"), two)
    VectorSearch.refreshIvfIndex(
      batch.filter(col("vec_id") >= 250), col("vec_id"), col("embedding"), two)
    val servedTwo = VectorSearch.ivfTopKFromIndex(
      emb, col("vec_id"), col("embedding"), two, qids, Similarity.K).collect().toSeq
    assert(servedOne == servedTwo)
    assert(servedOne.nonEmpty)
    // freshness: refreshed serving can return batch-side neighbors — the
    // whole point of the refresh (corpus-only serving cannot)
    assert(servedOne.exists(_.getLong(2) % 5 == 0),
      "no batch vector ever served — refresh appended nothing visible")
  }

  test("pq refresh: append-only code ingest is split-invariant") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    val qids = Similarity.QueryIds
    val one = tmpDir("pq-refresh-one")
    VectorSearch.writePqIndex(corpus, col("vec_id"), col("embedding"), one)
    VectorSearch.refreshPqIndex(batch, col("vec_id"), col("embedding"), one)
    val servedOne = VectorSearch.pqTopKFromIndex(
      emb, col("vec_id"), col("embedding"), one, qids, Similarity.K,
      shortlist = Similarity.PqShortlist).collect().toSeq
    val two = tmpDir("pq-refresh-two")
    VectorSearch.writePqIndex(corpus, col("vec_id"), col("embedding"), two)
    VectorSearch.refreshPqIndex(
      batch.filter(col("vec_id") < 250), col("vec_id"), col("embedding"), two)
    VectorSearch.refreshPqIndex(
      batch.filter(col("vec_id") >= 250), col("vec_id"), col("embedding"), two)
    val servedTwo = VectorSearch.pqTopKFromIndex(
      emb, col("vec_id"), col("embedding"), two, qids, Similarity.K,
      shortlist = Similarity.PqShortlist).collect().toSeq
    assert(servedOne == servedTwo)
    assert(servedOne.nonEmpty)
  }
}
