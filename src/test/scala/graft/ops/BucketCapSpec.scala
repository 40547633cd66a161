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

  test("incremental ingest: hot corpus bucket probes at most cap members, dup_of keeps the minimum") {
    import spark.implicits._
    val incoming = Seq((5000L, "alpha beta gamma delta epsilon zeta"),
      (5001L, "alpha beta gamma delta epsilon zeta"),
      (5002L, "totally different words here nothing shared"))
      .toDF("doc_id", "text")
    val out = TextDedup.minhashLshIncremental(
      hotCorpus, incoming, col("doc_id"), col("text"), bucketCap = 32)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted
    // both duplicate incoming docs verified against the 32 smallest bucket
    // members only (bounded), and dup_of is still the bucket minimum
    assert(rows === Seq((5000L, 0L, 32L), (5001L, 0L, 32L)))
  }

  /** 1000 distinct documents that all share ONE boilerplate shingle (a
    * common footer) but are otherwise unrelated — the exact-Jaccard
    * scale-killer shape: uncapped, that single posting list emits
    * k(k−1)/2 ≈ 500k candidate rows before any threshold applies.
    */
  private def footerCorpus = {
    import spark.implicits._
    (0L until 1000L).map(i =>
      (i, s"common footer boilerplate u${i}a u${i}b u${i}c u${i}d u${i}e"))
      .toDF("doc_id", "text")
  }

  test("exact jaccard: a 1000-doc hot shingle posting costs linear work, not quadratic") {
    // identical docs, cap=8: every shingle is hot, so the pair relation is
    // the 999-pair connectivity CHAIN (not the 499500-pair clique), each
    // pair exactly verified against the full shingle relation at J=1
    val pairs = TextDedup.jaccardPairs(
      hotCorpus, col("doc_id"), col("text"), 3, 0.8, postingCap = 8)
    val rows = pairs.collect()
    assert(rows.length === 999, s"expected the 999-pair chain, got ${rows.length}")
    assert(rows.forall(_.getDouble(2) === 1.0))
    val canon = TextDedup.canonicalize(
      pairs.select(col("id_a"), col("id_b")),
      hotCorpus.select(col("doc_id").as("id")))
    assert(canon.select(col("canonical")).distinct().count() === 1)
    // boilerplate-footer corpus: 1000 otherwise-unrelated docs sharing ONE
    // hot shingle — the hot posting never self-joins (no df² blowup) and
    // no chain pair clears the threshold (1 shared shingle of ~6 each)
    assert(TextDedup.jaccardPairs(
      footerCorpus, col("doc_id"), col("text"), 3, 0.8, postingCap = 8).count() === 0L)
  }

  test("containment: a strict subset yields ONE directed row at 1.0; Jaccard misses it") {
    import spark.implicits._
    // doc 1's text is a verbatim prefix of doc 2's, so every 3-shingle of
    // doc 1 appears in doc 2 (containment 1→2 = 1.0) while doc 2 carries
    // many shingles doc 1 lacks (containment 2→1 and Jaccard both small)
    val small = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"
    val big = small + " r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 r11 r12 r13 r14 r15 r16 r17 r18 r19 r20"
    val docs = Seq((1L, small), (2L, big), (3L, "s1 s2 s3 s4 s5")).toDF("doc_id", "text")
    val rows = TextDedup.containmentPairs(docs, col("doc_id"), col("text"), 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq === Seq((1L, 2L, 1.0)))
    assert(TextDedup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0.8).count() === 0L)
  }

  test("containment: mutual exact dups emit both directions; hot corpus stays chain-linear") {
    import spark.implicits._
    val dups = Seq((1L, "m1 m2 m3 m4 m5"), (2L, "m1 m2 m3 m4 m5")).toDF("doc_id", "text")
    val both = TextDedup.containmentPairs(dups, col("doc_id"), col("text"), 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(both.toSeq.sorted === Seq((1L, 2L, 1.0), (2L, 1L, 1.0)))
    // 1000 identical docs, cap=8: the capped commons is the 999-pair chain,
    // so containment emits 2·999 directed rows — linear, not 2·C(1000,2)
    val hot = TextDedup.containmentPairs(
      hotCorpus, col("doc_id"), col("text"), 3, 0.9, postingCap = 8)
    assert(hot.count() === 1998L)
  }

  test("posting cap leaves a normal corpus bit-identical to the uncapped exact operator") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val capped = TextDedup.jaccardPairs(docs, col("doc_id"), col("text"))
    val uncapped = TextDedup.jaccardPairs(
      docs, col("doc_id"), col("text"), postingCap = Int.MaxValue)
    assert(capped.collect().map(_.toSeq).toSeq === uncapped.collect().map(_.toSeq).toSeq)
  }

  test("stored LSH index probe is bit-identical to the in-session incremental path") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    val indexDir = java.nio.file.Files
      .createTempDirectory("lsh-index-spec").toString
    TextDedup.writeLshIndex(corpus, col("doc_id"), col("text"), indexDir)
    val fromIndex = TextDedup.minhashLshIncrementalFromIndex(
      incoming, col("doc_id"), col("text"), indexDir)
    val inSession = TextDedup.minhashLshIncremental(
      corpus, incoming, col("doc_id"), col("text"))
    assert(fromIndex.collect().map(_.toSeq).toSeq ===
      inSession.collect().map(_.toSeq).toSeq)
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

    val half = docs.filter(col("doc_id") % 2 === 0)
    val rest = docs.filter(col("doc_id") % 2 =!= 0)
    val cappedInc = TextDedup.minhashLshIncremental(half, rest, col("doc_id"), col("text"))
    val uncappedInc = TextDedup.minhashLshIncremental(
      half, rest, col("doc_id"), col("text"), bucketCap = Int.MaxValue)
    assert(cappedInc.collect().map(_.toSeq).toSeq === uncappedInc.collect().map(_.toSeq).toSeq)
  }
}
