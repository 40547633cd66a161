package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Pins the winnowing properties the oracle can't express: the coverage
  * guarantee (a shared token run of ≥ k+w-1 always yields a shared
  * fingerprint), selection density near the theoretical 2/(w+1), and that
  * the planted near-duplicates in the corpus surface as shared spans.
  */
class WinnowSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("guarantee: any shared run of k+w-1 tokens produces a shared fingerprint") {
    import spark.implicits._
    val k = 4; val w = 4
    val shared = (1 to (k + w - 1)).map(i => s"shared$i").mkString(" ")
    // surround the shared run with disjoint noise on both sides
    val docs = Seq(
      (1L, s"alpha beta gamma delta $shared epsilon zeta"),
      (2L, s"one two three four five $shared six seven eight")).toDF("doc_id", "text")
    val pairs = Winnow.sharedSpans(docs, col("doc_id"), col("text"), k, w, minShared = 1)
      .collect()
    assert(pairs.length === 1 && pairs.head.getLong(0) === 1L && pairs.head.getLong(1) === 2L,
      s"shared run of ${k + w - 1} tokens must be detected: ${pairs.mkString(",")}")
  }

  test("no false pairs for fully disjoint documents") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh ii jj kk ll"),
      (2L, "mm nn oo pp qq rr ss tt uu vv ww xx")).toDF("doc_id", "text")
    assert(Winnow.sharedSpans(docs, col("doc_id"), col("text"), 4, 4, 1).count() === 0)
  }

  test("selection density is near 2/(w+1), never above 1") {
    val docs = Tables.table(spark, sf, "documents")
    val w = 4
    val fp = Winnow.fingerprints(docs, col("doc_id"), col("text"), k = 4, w = w)
    val nSelected = fp.count().toDouble
    val nGrams = docs
      .select((size(TextOps.tokens(col("text"))) - 3).as("g"))
      .agg(sum(greatest(col("g"), lit(0)))).head().getLong(0).toDouble
    val density = nSelected / nGrams
    // 2/(w+1) = 0.4 expected for random hashes; distinct-collapse and
    // partial windows push it around — allow a broad but meaningful band
    assert(density > 0.2 && density < 0.8, s"density $density out of band")
  }

  test("stop-listing drops boilerplate fingerprints but keeps rare shared spans") {
    import spark.implicits._
    val boiler = (1 to 12).map(i => s"license$i").mkString(" ") // shared by ALL docs
    val rare = (1 to 12).map(i => s"secret$i").mkString(" ")    // shared by 2 docs
    val docs = (1L to 6L).map { i =>
      val extra = if (i <= 2) s" $rare" else s" unique${i}a unique${i}b unique${i}c"
      (i, s"$boiler doc${i}x doc${i}y doc${i}z$extra")
    }.toDF("doc_id", "text")
    // without stop-listing every pair shares the boilerplate
    val all = Winnow.sharedSpans(docs, col("doc_id"), col("text"), 4, 4, 1)
    assert(all.count() === 15) // all C(6,2) pairs
    // stop-listing fingerprints in >2 docs keeps only the rare overlap
    val rareOnly = Winnow.sharedSpans(docs, col("doc_id"), col("text"), 4, 4, 1, maxDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rareOnly.toSeq === Seq((1L, 2L)), rareOnly.mkString(","))
  }

  test("fingerprint selection is one window pass: single Window node, no join") {
    val docs = Tables.table(spark, sf, "documents")
    val p = Winnow.fingerprints(docs, col("doc_id"), col("text"), 4, 4)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window.*")) === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("planted near-duplicates surface as shared spans") {
    val jaccardPairs = Dedup.qDedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val spans = Winnow.qWinnowSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = jaccardPairs.intersect(spans).size.toDouble / jaccardPairs.size
    assert(found >= 0.8, s"winnowing found only ${found * 100}% of planted near-dup pairs")
  }
}
