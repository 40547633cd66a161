package graft.ops

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** SemDeDup: cluster-scoped semantic near-dup pruning. A planted corpus of
  * two well-separated clusters with a known duplicate triple pins the
  * survivor rule (drop the higher-centroid-similarity member of every
  * within-cluster pair at cosine ≥ threshold); the real-table test pins
  * the cross-check invariants against the independently-computed pair
  * relation.
  */
class SemDedupSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private val cfg = VectorSearch.IvfConfig(numCentroids = 2, iters = 2)

  /** Two orthogonal anchor directions. Lloyd init seeds from the two
    * SMALLEST ids, so id 0 (anchor A) and id 1 (anchor B) pin one seed per
    * group: A holds the near-identical triple {0, 2, 3} plus the
    * below-threshold 4; B holds the pair {1, 11} plus the below-threshold
    * 12.
    */
  private def planted = {
    val s = spark
    import s.implicits._
    def vec(main: Int, eps: Double, d2: Double): Seq[Float] = {
      val a = Array.fill(8)(0.0)
      a(main) = 1.0
      a((main + 1) % 8) = eps
      a((main + 2) % 8) = d2
      a.map(_.toFloat).toSeq
    }
    Seq(
      (0L, vec(0, 0.010, 0.0)),
      (1L, vec(4, 0.010, 0.0)),
      (2L, vec(0, 0.011, 0.0)),
      (3L, vec(0, 0.012, 0.0)),
      (4L, vec(0, 0.600, 0.3)), // cluster A, below threshold vs the triple
      (11L, vec(4, 0.011, 0.0)),
      (12L, vec(4, 0.700, 0.4))
    ).toDF("id", "v")
  }

  test("planted duplicate triple: exactly one survivor, dominance rule holds") {
    val out = VectorSearch.semDedup(planted, col("id"), col("v"),
      threshold = 0.99, cfg = cfg)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 11L, 12L))

    val byId = rows.map(r => r._1 -> r).toMap
    // the {0,2,3} triple is mutually >= 0.99: exactly one kept — the one
    // with the smallest (cent_sim, id)
    val triple = Seq(0L, 2L, 3L).map(byId)
    assert(triple.count(_._4 == 1L) == 1)
    val expectedSurvivor = triple.minBy(t => (t._3, t._1))._1
    assert(triple.find(_._4 == 1L).get._1 == expectedSurvivor)
    // {1,11} pair: the lower-cent-sim member survives, the other drops
    val pair = Seq(1L, 11L).map(byId)
    assert(pair.count(_._4 == 1L) == 1)
    assert(pair.find(_._4 == 1L).get._1 == pair.minBy(t => (t._3, t._1))._1)
    // below-threshold members are untouched
    assert(byId(4L)._4 == 1L && byId(12L)._4 == 1L)
    // the two anchor groups land in different clusters
    assert(byId(0L)._2 != byId(1L)._2)
    assert(Seq(2L, 3L, 4L).forall(i => byId(i)._2 == byId(0L)._2))
    assert(Seq(11L, 12L).forall(i => byId(i)._2 == byId(1L)._2))
  }

  test("real table: drops are exactly the pairwise-dominated set") {
    val out = VectorSearch.semDedup(emb, col("vec_id"), col("embedding"),
      Similarity.SemThreshold)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.length == emb.count())

    // recompute the within-cluster qualifying pairs independently (brute
    // force filtered to co-clustered pairs) and replay the dominance rule
    val cluster = rows.map(r => r._1 -> r._2).toMap
    val centSim = rows.map(r => r._1 -> r._3).toMap
    val allPairs = VectorSearch.cosinePairs(
      emb, col("vec_id"), col("embedding"), Similarity.SemThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedDropped = allPairs
      .filter { case (a, b) => cluster(a) == cluster(b) }
      .map { case (a, b) =>
        if (centSim(a) > centSim(b) || (centSim(a) == centSim(b) && a > b)) a else b
      }.toSet
    val dropped = rows.filter(_._4 == 0L).map(_._1).toSet
    assert(dropped == expectedDropped)
    assert(dropped.nonEmpty, "fixture has no co-clustered qualifying pairs")
  }

  test("incremental gate: planted near-copy flagged with its corpus twin, stored index bit-identical") {
    val s = spark
    import s.implicits._
    val corpus = emb.filter(col("vec_id") < 400)
    // incoming: a near-copy of corpus vec 7 (tiny alternating nudge) and a
    // genuinely new vector (one untouched original well above id-space)
    val copy = emb.filter(col("vec_id") === 7)
      .select(lit(9001L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + when(pmod(i, lit(2)) === 0, lit(0.002f)).otherwise(lit(-0.002f)))
          .as("embedding"))
    val fresh = emb.filter(col("vec_id") === 450)
      .select(lit(9002L).as("vec_id"), col("embedding"))
    val incoming = copy.unionByName(fresh)

    val highThr = 0.98
    val out = VectorSearch.semDedupIncremental(
      corpus, incoming, col("vec_id"), col("embedding"), highThr)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._1).contains(9001L), s"planted copy not flagged: ${rows.toSeq}")
    assert(rows.find(_._1 == 9001L).get._2 == 7L)
    assert(rows.find(_._1 == 9001L).get._3 >= highThr)
    assert(!rows.map(_._1).contains(9002L))

    val indexDir = tmpDir("semdedup-spec-index")
    VectorSearch.writeIvfIndex(corpus, col("vec_id"), col("embedding"), indexDir)
    val stored = VectorSearch.semDedupIncrementalFromIndex(
      corpus, incoming, col("vec_id"), col("embedding"), indexDir, highThr)
    assert(stored.collect().toSeq == out.collect().toSeq)
  }

  test("mmr rerank: valid ranks, no repeats, scores within candidate bounds") {
    val out = Similarity.qMmrRerank(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Similarity.QueryIds.toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == (1L to Similarity.MmrK))
      assert(rows.map(_._3).distinct.length == rows.length) // no repeated picks
    }
    // rank-1 picks are exactly the plain retrieval winners
    val winners = VectorSearch.cosineTopK(
      emb, org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("embedding"), Similarity.QueryIds, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.filter(_._2 == 1L).map(r => r._1 -> r._3).toMap == winners)
  }

  test("schema contract and rerun determinism") {
    val a = VectorSearch.semDedup(planted, col("id"), col("v"),
      threshold = 0.99, cfg = cfg)
    assert(a.columns.toSeq == Seq("id", "cluster", "cent_sim", "keep"))
    val b = VectorSearch.semDedup(planted.repartition(7), col("id"), col("v"),
      threshold = 0.99, cfg = cfg)
    assert(a.collect().toSeq == b.collect().toSeq)
  }
}
