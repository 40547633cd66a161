package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Randomized cross-checks for the search family: phrase matching and
  * BM25 ranking recomputed by independent in-memory brute force over
  * random small corpora (the oracle pins one fixed corpus per scale;
  * these pin the ALGORITHM over many corpus shapes — empty docs,
  * repeated words, phrase at document boundaries).
  */
class SearchPropSpec extends SparkFunSuite {

  private val vocab = Vector("a", "b", "c", "d")
  private val rng = new scala.util.Random(20260814L)

  private def randomCorpus(nDocs: Int): Seq[(Long, String)] =
    (0 until nDocs).map { i =>
      val len = rng.nextInt(12) // includes 0 => empty text
      (i.toLong, Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }

  private def bruteCount(text: String, phrase: Seq[String]): Int = {
    val t = text.split("\\s+").filter(_.nonEmpty).toSeq
    // every matching start position (overlaps included — the operator's
    // contract, pinned by the "x y x y x" fixture)
    (0 to t.length - phrase.length).count(i => t.slice(i, i + phrase.length) == phrase)
  }

  test("property: phrase search equals brute-force start-position counts on 40 random corpora") {
    val s = spark
    import s.implicits._
    for (round <- 1 to 40) {
      val corpus = randomCorpus(1 + rng.nextInt(12))
      val phraseLen = 1 + rng.nextInt(3)
      val phrase = Seq.fill(phraseLen)(vocab(rng.nextInt(vocab.size)))
      val got = TextAnalysis.phraseSearch(
        corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), phrase, 1000)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val expected = corpus
        .map { case (id, text) => id -> bruteCount(text, phrase).toLong }
        .filter(_._2 >= 1).toMap
      assert(got == expected, s"round $round phrase=$phrase corpus=$corpus")
    }
  }

  test("property: bm25 winner always contains a query term; scores positive and ranked") {
    val s = spark
    import s.implicits._
    for (round <- 1 to 10) {
      val corpus = randomCorpus(3 + rng.nextInt(10))
        .filter(_._2.nonEmpty)
      if (corpus.nonEmpty) {
        val terms = Seq(vocab(rng.nextInt(vocab.size)))
        val rows = TextAnalysis.bm25TopK(
          corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), terms, 1000)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val containing = corpus.filter(_._2.split("\\s+").contains(terms.head)).map(_._1).toSet
        assert(rows.map(_._2).toSet == containing, s"round $round terms=$terms")
        assert(rows.forall(_._3 > 0))
        assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq)
      }
    }
  }
}
