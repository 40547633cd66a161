package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Exact duplicated-substring spans ([[TextDedup.duplicatedSpans]]): a
  * planted 10-token passage shared by two documents must come back as ONE
  * maximal merged span per document (not three overlapping windows), a
  * within-document repeat must be flagged too, and a unique document must
  * produce nothing.
  */
class DupSpansSpec extends SparkFunSuite {

  private val shared = (1 to 10).map(i => s"s$i").mkString(" ")

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, s"p1 p2 $shared q1 q2"), // shared passage at token 2
      (2L, s"r1 r2 r3 $shared t1"), // same passage at token 3
      // 8-token block repeated WITHIN one document (positions 0 and 11)
      (3L, ((1 to 8).map(i => s"u$i") ++ Seq("f1", "f2", "f3") ++
        (1 to 8).map(i => s"u$i")).mkString(" ")),
      (4L, (1 to 12).map(i => s"v$i").mkString(" ")) // fully unique
    ).toDF("doc_id", "text")
  }

  test("cross-document passage merges into one maximal span per doc") {
    val spans = TextDedup.duplicatedSpans(
      corpus, col("doc_id"), col("text"), l = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 10 shared tokens, window 8 → starts {2,3,4} in doc 1 and {3,4,5} in
    // doc 2 merge to span_len 10 each; doc 3 repeats an exact-8 block at
    // positions 0 and 11 (two separate islands); doc 4 contributes nothing
    assert(spans.toSeq === Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (3L, 0L, 8L), (3L, 11L, 8L)))
  }

  test("documents shorter than the window are skipped, not errored") {
    import spark.implicits._
    val tiny = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    assert(TextDedup.duplicatedSpans(tiny, col("doc_id"), col("text"), l = 8)
      .count() === 0L)
  }

  test("overlap spans probe only against the corpus grams, not each other") {
    import spark.implicits._
    val corpus = Seq((1L, s"lead-in $shared lead-out")).toDF("doc_id", "text")
    val grams = TextDedup.windowGrams(corpus, col("doc_id"), col("text"), 8)
    // probe doc 10 quotes the corpus passage; docs 20/21 share a passage
    // with EACH OTHER only — an overlap probe must not flag probe-probe
    // duplication (that's duplicatedSpans' job)
    val probeOnly = (1 to 9).map(i => s"p$i").mkString(" ")
    val probes = Seq(
      (10L, s"x1 x2 $shared x3"),
      (20L, s"a1 a2 $probeOnly"),
      (21L, s"b1 b2 b3 $probeOnly")).toDF("doc_id", "text")
    val spans = TextDedup.overlapSpans(probes, col("doc_id"), col("text"), grams, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSeq === Seq((10L, 2L, 10L)))
  }

  test("flagging is linear in occurrences: a window shared by k docs emits k spans") {
    import spark.implicits._
    val k = 200
    val block = (1 to 8).map(i => s"w$i").mkString(" ")
    // k documents all carrying the same 8-token block behind unique prefixes
    val docs = (0 until k).map(i => (i.toLong, s"x${i}a x${i}b $block"))
      .toDF("doc_id", "text")
    val spans = TextDedup.duplicatedSpans(docs, col("doc_id"), col("text"), l = 8)
    assert(spans.count() === k.toLong) // one span per doc — not k² pair rows
  }
}
