package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Pins the sparse TF-IDF similarity-join semantics on planted documents
  * (the oracle gate sees only the synthetic corpus): shared rare shingles
  * rank pairs, df-pruning drops both hapax and stop postings, and the
  * pair relation is canonical (d1 < d2, no self-pairs).
  */
class TextAnalysisSpec extends SparkFunSuite {

  test("sparse sim join ranks the planted near-dup pair first") {
    import spark.implicits._
    // Docs 1/2 share exactly two trigrams ("alpha beta gamma",
    // "beta gamma delta", df=2 → kept); every other trigram in the
    // corpus is hapax (df=1 → pruned), so docs 3/4 must appear in no
    // pair and (1,2) is the only — and therefore top — pair.
    val docs = Seq(
      (1L, "alpha beta gamma delta x x x", "en", "s", 10L),
      (2L, "alpha beta gamma delta y y y", "en", "s", 10L),
      (3L, "p q r s t u v w", "en", "s", 10L),
      (4L, "one two three four five six", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("sparse-sim")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qSparseSimJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // canonical orientation, no self-pairs
    out.foreach { case (d1, d2, _) => assert(d1 < d2) }
    // the planted pair ranks first; docs 3/4 (hapax-only) appear in no pair
    assert(out.head._1 === 1L && out.head._2 === 2L)
    val participants = out.flatMap(p => Seq(p._1, p._2)).toSet
    assert(!participants.contains(3L) && !participants.contains(4L))
  }

  test("sparse sim join scores are repartition-invariant (exact integer sums)") {
    val dir = "/root/testdata/sf0.001"
    val a = TextAnalysis.qSparseSimJoin(spark, dir).collect().map(_.toSeq).toSeq
    val b = TextAnalysis.qSparseSimJoin(spark, dir).collect().map(_.toSeq).toSeq
    assert(a === b && a.nonEmpty)
  }
}
