package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** The LSH/SimHash collision-bucket cap (SCALE.md hot-bucket mitigation):
  * a degenerate bucket — here 1000 identical documents — must produce a
  * LINEAR number of candidate pairs (a connectivity-preserving chain), not
  * the k(k−1)/2 all-pairs blowup, and the cap must leave normal corpora
  * bit-identical to the uncapped operator.
  */
class BucketCapSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def hotCorpus = {
    import spark.implicits._
    (0L until 1000L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
  }

  test("minhash LSH: a 1000-doc identical bucket yields a chain, not a clique") {
    val pairs = TextDedup.minhashLshPairs(
      hotCorpus, col("doc_id"), col("text"), bucketCap = 32)
    val rows = pairs.collect()
    // every band bucket holds all 1000 docs (> cap) → consecutive-id chain,
    // identical across bands → exactly n-1 distinct verified pairs
    assert(rows.length === 999)
    assert(rows.forall(_.getDouble(2) === 1.0))
    // the chain keeps the duplicate cluster CONNECTED — one component
    val canon = TextDedup.canonicalize(
      pairs.select(col("id_a"), col("id_b")),
      hotCorpus.select(col("doc_id").as("id")))
    assert(canon.select(col("canonical")).distinct().count() === 1)
  }

  test("simhash: a 1000-doc identical bucket yields a chain, not a clique") {
    val pairs = TextDedup.simhashPairs(
      hotCorpus, col("doc_id"), col("text"), bucketCap = 32)
    val rows = pairs.collect()
    assert(rows.length === 999)
    assert(rows.forall(_.getInt(2) === 0)) // identical text → Hamming 0
  }

  test("cap leaves a normal corpus bit-identical to the uncapped operator") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val capped = TextDedup.minhashLshPairs(docs, col("doc_id"), col("text"))
    val uncapped = TextDedup.minhashLshPairs(
      docs, col("doc_id"), col("text"), bucketCap = Int.MaxValue)
    assert(capped.collect().map(_.toSeq).toSeq === uncapped.collect().map(_.toSeq).toSeq)

    val cappedSim = TextDedup.simhashPairs(docs, col("doc_id"), col("text"))
    val uncappedSim = TextDedup.simhashPairs(
      docs, col("doc_id"), col("text"), bucketCap = Int.MaxValue)
    assert(cappedSim.collect().map(_.toSeq).toSeq === uncappedSim.collect().map(_.toSeq).toSeq)
  }
}
