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

  test("ngram novelty: all-new doc scores 10000 bp, verbatim re-ingest scores 0") {
    import spark.implicits._
    // Doc 1 introduces every one of its shingles (novelty = 10000 bp).
    // Doc 2 repeats doc 1 verbatim — zero new shingles. Doc 3 overlaps
    // doc 1 on exactly one of its three distinct shingles ("c d e" is
    // doc 1's tail shingle): 2 of 3 new → 6666 bp (integer division).
    val docs = Seq(
      (1L, "a b c d e", "en", "s", 9L),
      (2L, "a b c d e", "en", "s", 9L),
      (3L, "c d e f g", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("novelty")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qNgramNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((3L, 3L, 10000L)))
    assert(out(2L) === ((3L, 0L, 0L)))
    assert(out(3L) === ((3L, 2L, 6666L)))
  }

  test("source redundancy: looped boilerplate scores high, unique text scores zero") {
    import spark.implicits._
    // srcA: "a b c" looped 3× → 7 shingle occurrences, 3 distinct
    // ("a b c","b c a","c a b") → (7-3)*10000 DIV 7 = 5714 bp.
    // srcB: 7 unique tokens → 5 occurrences, all distinct → 0 bp.
    val docs = Seq(
      (1L, "a b c a b c a b c", "en", "srcA", 17L),
      (2L, "q w e r t y u", "en", "srcB", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("redundancy")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qSourceRedundancy(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("srcA") === ((7L, 3L, 5714L)))
    assert(out("srcB") === ((5L, 5L, 0L)))
  }

  test("source diversity: uniform tokens hit vocab size, a dominated source collapses") {
    import spark.implicits._
    // srcU: 4 distinct tokens once each → N=4, Σc²=4 → N²/Σc² = 4.0
    // (= vocabulary size, the uniform upper bound).
    // srcD: "z" ×8 plus 2 singletons → N=10, Σc²=64+2=66 → 100/66 ≈ 1.515152
    // (collapsing toward 1 as one token dominates).
    val docs = Seq(
      (1L, "a b c d", "en", "srcU", 7L),
      (2L, "z z z z z z z z x y", "en", "srcD", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("diversity")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qSourceDiversity(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("srcU") === ((4L, 4L, 4.0)))
    assert(out("srcD") === ((10L, 66L, 1.515152)))
  }

  test("source drift: identical distributions score zero, a planted skew token ranks first") {
    import spark.implicits._
    // s0 (7 tokens: x:2 y:2 zzz:3) vs s1 (4 tokens: x:2 y:2): zzz is the
    // only token exclusive to one side, so it must out-rank x/y. The tiny
    // third source s2 must be ignored (top-2 by token volume are s0, s1).
    val docs = Seq(
      (1L, "x y zzz zzz zzz", "en", "s0", 15L),
      (2L, "x y", "en", "s0", 3L),
      (3L, "x y x y", "en", "s1", 7L),
      (4L, "q", "en", "s2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("drift")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qSourceDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // s0 has 7 tokens, s1 has 4 → src_a = s0, src_b = s1
    assert(out.forall(r => r._1 === "s0" && r._2 === "s1"))
    val byTok = out.map(r => (r._3, (r._4, r._5, r._6))).toMap
    // zzz: |3*4 - 0*7| = 12; x and y: |2*4 - 2*7| = 6 each
    assert(byTok("zzz") === ((3L, 0L, 12L)))
    assert(byTok("x") === ((2L, 2L, 6L)) && byTok("y") === ((2L, 2L, 6L)))
    assert(out.head._3 === "zzz")
    assert(!byTok.contains("q"))
  }

  test("dup ngrams: planted boilerplate ranks first; per-doc repetition doesn't inflate df") {
    import spark.implicits._
    val footer = "all rights reserved by the original author"  // 7 tokens, 3 x 5-grams
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta. $footer", "en", "s", 10L),
      (2L, s"one two three four five six seven. $footer", "en", "s", 10L),
      (3L, s"red orange yellow green blue indigo. $footer", "en", "s", 10L),
      // doc 4 repeats its own 5-gram ten times — df must stay 1 (pruned)
      (4L, Seq.fill(10)("p q r s t").mkString(" "), "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("dup-ngrams")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qDupNgrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // the three footer-only 5-grams appear in all 3 docs (df=3)
    val top = out.takeWhile(_._2 === 3L).map(_._1).toSet
    assert(top.contains("rights reserved by the original"))
    assert(top.contains("reserved by the original author"))
    // doc 4's internally-repeated gram is deduped per doc → df=1 → absent
    assert(out.forall(r => !r._1.contains("p q r")))
    assert(out.forall(_._2 >= 2L))
  }

  test("readability: hand-computed counts and basis-point ratios") {
    import spark.implicits._
    val docs = Seq(
      // 6 tokens, 2 sentences ('.' and '!'), vowel groups counted by hand:
      // "the cat sat. a dog barked!" → e|a|a|a|o|a|e = 7 groups
      (1L, "the cat sat. a dog barked!", "en", "s", 10L),
      // no terminator → 1 sentence floor; "xyz pqrst" has zero vowels
      (2L, "xyz pqrst", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("readability")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qReadability(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val d1 = out.find(_._1 == 1L).get
    assert(d1 === ((1L, 6L, 2L, 7L, 30000L, 11666L)))
    val d2 = out.find(_._1 == 2L).get
    assert(d2 === ((2L, 2L, 1L, 0L, 20000L, 0L)))
  }

  test("length/diversity correlation: perfect line scores 1, constant source scores NULL") {
    import spark.implicits._
    val docs = Seq(
      // sPerfect: all tokens distinct → y = x exactly → r = 1
      (1L, "a b", "en", "sPerfect", 10L),
      (2L, "c d e f", "en", "sPerfect", 10L),
      (3L, "g h i j k l", "en", "sPerfect", 10L),
      // sConst: identical lengths → zero variance → undefined (NULL)
      (4L, "one two three", "en", "sConst", 10L),
      (5L, "four five six", "en", "sConst", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("length-corr")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qLengthCorr(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(out("sPerfect") === ((3L, Some(1.0))))
    assert(out("sConst") === ((2L, None)))
  }

  test("stutter: hand-computed adjacent repeats; single-token docs drop out") {
    import spark.implicits._
    val docs = Seq(
      (1L, "go go go stop stop now", "en", "s", 10L),
      (2L, "a b c d", "en", "s", 10L),
      (3L, "single", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("stutter")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qTextStutter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc1: 5 adjacent positions, stutters at (go,go),(go,go),(stop,stop) = 3
    assert(out.find(_._1 == 1L).get === ((1L, 5L, 3L, 6000L)))
    assert(out.find(_._1 == 2L).get === ((2L, 3L, 0L, 0L)))
    assert(!out.exists(_._1 == 3L), "single-token doc has no adjacent pairs")
  }

  test("trigram LM: supported trigrams score the MLE, hapaxes back off to 0.4·bigram") {
    import spark.implicits._
    // Docs 1/2 both contain trigram (a,b,c) → c_xyz=2 ≥ 2, c_xy(a,b)=3
    // (docs 1,2,3 all open "a b") → score (2·10⁶) DIV 3 = 666666.
    // Doc 3's (a,b,d) is a corpus hapax → backoff: c_yz(b,d)=1, c_y(b)=3
    // → (1·400000) DIV 3 = 133333. Doc 4 has <3 tokens → absent.
    val docs = Seq(
      (1L, "a b c", "en", "s", 5L),
      (2L, "a b c", "en", "s", 5L),
      (3L, "a b d", "en", "s", 5L),
      (4L, "x y", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("trigram-lm")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qLmTrigramScore(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((1L, 666666L)))
    assert(out(2L) === ((1L, 666666L)))
    assert(out(3L) === ((1L, 133333L)))
    assert(!out.contains(4L), "sub-trigram doc has no positions to score")
  }

  test("pii audit: planted emails/IPs/SSNs are counted, clean docs stay unflagged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob@example.com or alice@test.org today", "en", "sA", 40L),
      (2L, "server 192.168.1.1 and 10.0.0.255 are up", "en", "sA", 40L),
      (3L, "ssn 123-45-6789 leaked", "en", "sB", 20L),
      (4L, "perfectly clean text here", "en", "sB", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("pii")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.qPiiAudit(spark, dir).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got("sA") === ((2L, 2L, 2L, 0L, 2L, 10000L)))
    assert(got("sB") === ((2L, 0L, 0L, 1L, 1L, 5000L)))
  }

  test("lang confusion: correct langs sit on the diagonal, unknowns land in und") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the of and x", "en", "s", 12L),
      (2L, "xx yy zz", "zh", "s", 8L),
      (3L, "der und das", "de", "s", 11L),
      (4L, "the of x y", "de", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("confusion")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.qLangConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      ("de", "de", 1L, 5000L), ("de", "en", 1L, 5000L),
      ("en", "en", 1L, 10000L), ("zh", "und", 1L, 10000L)))
  }

  test("vocab coverage: ladder is monotone and hand-computed on planted counts") {
    import spark.implicits._
    // 14 positions over 7 types: x×5, y×3, z×2, a/b/c/d×1 → top-5 by
    // (cnt desc, tok asc) = x,y,z,a,b covering 12/14 = 8571 bp; k ≥ 7
    // covers everything
    val docs = Seq(
      (1L, "x x x x x y", "en", "s", 11L),
      (2L, "y y z z a b c d", "en", "s", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("coverage")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.qVocabCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(5L) === ((5L, 12L, 8571L)))
    TextAnalysis.CoverageLadder.filter(_ >= 7).foreach { k =>
      assert(got(k.toLong) === ((7L, 14L, 10000L)))
    }
  }

  test("template prefixes: shared openings group, unique openings drop out") {
    import spark.implicits._
    val docs = Seq(
      (1L, "dear customer your account is ready", "en", "s", 30L),
      (2L, "dear customer please respond soon", "en", "s", 30L),
      (3L, "dear customer final notice", "en", "s", 25L),
      (4L, "hello world again", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("prefixes")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.qTemplatePrefixes(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("dear customer", 3L)))
  }

  test("doc repetition: planted duplicate lines/paragraphs decode to exact basis points") {
    import spark.implicits._
    // The SF corpus carries no newlines, so the line/paragraph measures
    // are pinned HERE on planted text (the oracle still compares their
    // all-zero SF values hash-exactly).
    val docs = Seq(
      // lines: "aa bb"×2 + "cc dd" → dup 1/3; dup char mass 10/15;
      // top bigram "aa bb" (c=2, len 5) over n_chars=17
      (1L, "aa bb\naa bb\ncc dd", "en", "s", 17L),
      // paragraphs: "xx"×2 + "yy" → dup 1/3; lines (split on single \n):
      // xx,"",xx,"",yy → 2 extra occurrences over 5 lines
      (2L, "xx\n\nxx\n\nyy", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("doc-repetition")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.qDocRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long])).toMap
    // doc 1: dup_line_bp = (3-2)*10000 DIV 3; dup_line_char_bp = 10*10000 DIV 15
    assert(rows(1L)(0) === 3333L && rows(1L)(1) === 6666L)
    assert(rows(1L)(2) === 0L && rows(1L)(3) === 0L) // single paragraph
    assert(rows(1L)(4) === 2 * 5 * 10000L / 17) // top2: "aa bb" mass 10 over 17 chars
    // doc 2: dup_para_bp = (3-2)*10000 DIV 3; lines 5 with 2 repeats → 4000
    assert(rows(2L)(2) === 3333L && rows(2L)(0) === 4000L)
  }

  test("repetition filter: keep-bucket maxima sit under the Gopher thresholds") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextAnalysis.qRepetitionFilter(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet === Set("keep", "drop"))
    assert(rows.values.map(_._1).sum ===
      TextAnalysis.qDocRepetition(spark, dir).count())
    // the keep bucket's maxima are the boundary proof of the thresholds
    val (_, k2, k3, k4) = rows("keep")
    assert(k2 <= 2000L && k3 <= 1800L && k4 <= 1600L)
  }

  test("quality buckets: thirds are balanced and score-ordered head ≥ middle ≥ tail") {
    val dir = "/root/testdata/sf0.001"
    val got = TextAnalysis.qQualityBuckets(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === Set("head", "middle", "tail"))
    val sizes = got.values.map(_._1)
    assert(sizes.sum === TextAnalysis.qLmBigramScore(spark, dir).count())
    assert(sizes.max - sizes.min <= 1, s"unbalanced thirds: $got")
    // score bands must not interleave: each bucket's floor ≥ the next's cap
    assert(got("head")._2 >= got("middle")._3)
    assert(got("middle")._2 >= got("tail")._3)
  }

  test("quality×dup matrix: cells partition the scored docs, shares sum to unit per bucket") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextAnalysis.qQualityDupMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSet === Set("head", "middle", "tail"))
    // every scored doc lands in exactly one cell
    assert(rows.map(_._3).sum === TextAnalysis.qLmBigramScore(spark, dir).count())
    // within-bucket shares are a bp partition (floor division loses <1 bp/cell)
    rows.groupBy(_._1).foreach { case (b, cells) =>
      val s = cells.map(_._4).sum
      assert(s <= 10000L && s >= 10000L - cells.length, s"bucket $b shares: $s")
    }
    // the corpus HAS exact duplicates, so at least one dup cell is non-empty
    assert(rows.exists(r => r._2 && r._3 > 0))
  }

  test("bm25: hand-computed basis-point scores on a planted corpus") {
    import spark.implicits._
    // N=3, L=12, avgdl_milli=4000; df(hash)=2, df(join)=1
    // d1 "hash hash join x": hash bp = (3*44*2*4000*10000)//(5*256000) = 8250
    //                        join bp = (5*44*1*4000*10000)//(3*176000) = 16666
    // d2 "hash y y y":       hash bp = (3*44*1*4000*10000)//(5*176000) = 6000
    val docs = Seq(
      (1L, "hash hash join x"),
      (2L, "hash y y y"),
      (3L, "z z z z")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("hash", "join", "vector"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 1L, 24916L, 2L), (2L, 2L, 6000L, 1L)))
  }

  test("bm25: stored-index serving is bit-identical to the in-session path") {
    val dir = "/root/testdata/sf0.001"
    val indexDir = tmpDir("bm25-spec-index")
    TextAnalysis.writeSearchIndex(
      spark.read.parquet(s"$dir/documents.parquet"), col("doc_id"), col("text"), indexDir)
    val stored = TextAnalysis.bm25TopKFromIndex(
      spark, indexDir, TextAnalysis.Bm25QueryTerms, 10).collect().toSeq
    val inSession = TextAnalysis.qBm25TopK(spark, dir).collect().toSeq
    assert(stored == inSession)
  }

  test("phrase search: planted occurrences counted exactly, overlaps and 3-grams handled") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a hash join b hash join c"),   // 2 occurrences, first at pos 1
      (2L, "hash join hash join hash"),    // 2 occurrences, first at pos 0
      (3L, "join hash b"),                 // reversed — no match
      (4L, "hash x join")                  // gap — no match
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.phraseSearch(docs, col("doc_id"), col("text"),
      Seq("hash", "join"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 1L, 2L, 1L), (2L, 2L, 2L, 0L)))
    // 3-word phrase with self-overlap: "x y x y x" contains "x y x" twice
    val tri = TextAnalysis.phraseSearch(
      Seq((7L, "x y x y x")).toDF("doc_id", "text"), col("doc_id"), col("text"),
      Seq("x", "y", "x"), 10)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(tri.toSeq == Seq((7L, 2L)))
  }

  test("search refresh: every maintained index relation equals a full rebuild") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = tmpDir("sr-base"); val merged = tmpDir("sr-merged"); val full = tmpDir("sr-full")
    TextAnalysis.writeSearchIndex(
      docs.filter(col("doc_id") % 5 =!= 0), col("doc_id"), col("text"), base)
    TextAnalysis.refreshSearchIndex(spark, base,
      docs.filter(col("doc_id") % 5 === 0), col("doc_id"), col("text"), merged)
    TextAnalysis.writeSearchIndex(docs, col("doc_id"), col("text"), full)
    for (rel <- Seq("postings.parquet", "df.parquet", "dl.parquet", "tot.parquet")) {
      val a = spark.read.parquet(s"$merged/$rel")
      val b = spark.read.parquet(s"$full/$rel")
      val cols = a.columns.sorted.map(col)
      assert(a.select(cols: _*).collect().toSet == b.select(cols: _*).collect().toSet, rel)
    }
  }

  test("bm25: real-table ranking is descending and every hit contains a query term") {
    val out = TextAnalysis.qBm25TopK(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 10)
    assert(out.map(_._3).toSeq == out.map(_._3).sortBy(-_).toSeq)
    assert(out.forall(_._4 >= 1L))
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.forall { case (_, id, _, _) =>
      TextAnalysis.Bm25QueryTerms.exists(t => texts(id).toLowerCase.split("\\s+").contains(t))
    })
  }

  test("ppl buckets: per-source terciles are exact integer-rank splits") {
    import spark.implicits._
    // 6 scoreable docs in one source → terciles of exactly 2/2/2; doc 7
    // has <3 tokens (no trigram) and must vanish from the report.
    // Fluency order is deterministic: doc 1/2 duplicate each other
    // (trigrams corpus-supported → high conditional), docs 3-6 are
    // hapax-trigram docs scored by backoff.
    val docs = (Seq(
      (1L, "alpha beta gamma alpha beta gamma"),
      (2L, "alpha beta gamma alpha beta gamma"),
      (3L, "p q r s t u"), (4L, "one two three four five six"),
      (5L, "aa bb cc dd ee ff"), (6L, "k l m n o pp"),
      (7L, "too short")))
      .map { case (id, t) => (id, t, "en", "src0", 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("ppl-buckets")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qPplBuckets(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out.map(_._2).sorted === Seq("head", "middle", "tail"))
    assert(out.forall(_._3 == 2L), s"6 docs → 2 per tercile: $out")
    // the duplicated (most fluent) docs land in head: head's min score is
    // the suite max
    val byBucket = TextAnalysis.qPplBuckets(spark, dir).collect()
      .map(r => r.getString(1) -> (r.getLong(4), r.getLong(5))).toMap
    assert(byBucket("head")._1 >= byBucket("middle")._2)
    assert(byBucket("middle")._1 >= byBucket("tail")._2)
  }

  test("topic tags: dominant topic wins by count then lexicographic tie-break") {
    import spark.implicits._
    val docs = Seq(
      // 2×storage ("scan table") vs 1×relational ("join") → storage
      (1L, "scan table join zz zz"),
      // 1×relational ("join") vs 1×streaming ("stream") tie → relational
      (2L, "join stream zz zz zz"),
      // no keyword at all → untagged, absent from the report
      (3L, "zz yy xx ww vv"))
      .map { case (id, t) => (id, t, "en", "src0", 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("topic-tags")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qTopicTags(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out.toSet === Set(("relational", 1L, 5000L), ("storage", 1L, 5000L)))
  }

  test("mix reweight: expected post-weight topic masses are uniform per source") {
    import spark.implicits._
    // src0: 3 relational docs + 1 storage doc → weights 1e6·4/(2·3) and
    // 1e6·4/(2·1); expected mass per topic = n_cell·w equalizes.
    val docs = Seq(
      (1L, "join aa"), (2L, "merge bb"), (3L, "filter cc"), (4L, "scan dd"))
      .map { case (id, t) => (id, t, "en", "src0", 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("mix-reweight")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qMixReweight(spark, dir).collect()
      .map(r => (r.getString(1), (r.getLong(2), r.getLong(3)))).toMap
    assert(out("relational") === ((3L, 4000000L / 6L)))
    assert(out("storage") === ((1L, 4000000L / 2L)))
    // expected post-weight mass n_cell · w is uniform across topics up to
    // the integer-floor remainder (< n_cell micro-units)
    val masses = out.values.map { case (n, w) => n * w }
    assert(masses.max - masses.min < out.values.map(_._1).max,
      s"masses: $out")
  }

  test("quality classifier: NB micro-weights and confusion cells match hand computation") {
    import spark.implicits._
    // Train (doc_id % 5 ≠ 0): pos = src0 docs {good×3, nice×2},
    // neg = srcX docs {bad×3, ugly×2} → tot_pos = tot_neg = 5, V = 4,
    // so w = ((c_pos+1)·9·10⁶) DIV ((c_neg+1)·9) = ((c_pos+1)·10⁶) DIV (c_neg+1):
    //   good 4e6, nice 3e6, bad 250000, ugly 333333, unseen 1e6.
    // Held-out (doc_id % 5 = 0):
    //   doc 5  (src0, actual pos) "good nice" → mean 3.5e6 → pos  ✓
    //   doc 10 (srcX, actual neg) "bad spam"  → (250000+1e6)/2 = 625000 → neg ✓
    //   doc 15 (src0, actual pos) "bad bad"   → 250000 → neg (planted miss)
    val docs = Seq(
      (1L, "good good nice", "src0"), (2L, "good nice", "src0"),
      (3L, "bad bad ugly", "srcX"), (4L, "bad ugly", "srcX"),
      (5L, "good nice", "src0"), (10L, "bad spam", "srcX"),
      (15L, "bad bad", "src0"))
      .map { case (id, t, s) => (id, t, "en", s, 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("quality-classifier")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qQualityClassifier(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      ("neg", "neg") -> ((1L, 625000L, 625000L)),
      ("pos", "neg") -> ((1L, 250000L, 250000L)),
      ("pos", "pos") -> ((1L, 3500000L, 3500000L))))
  }

  test("curriculum schedule: pools nest, grow to the full corpus, easy slice first") {
    val dir = "/root/testdata/sf0.001"
    val out = TextAnalysis.qCurriculumMix(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))))
      .sortBy(_._1)
    assert(out.map(_._1) === (0L until TextAnalysis.CurriculumEpochs.toLong))
    val n = out.last._2._1 // final epoch admits every scored doc
    // exact integer cutoffs: epoch e admits rnk·E ≤ N·(e+1) documents
    out.foreach { case (e, (nDocs, cutoff, _, _)) =>
      assert(nDocs === n * (e + 1) / TextAnalysis.CurriculumEpochs)
      assert(cutoff === nDocs) // ranks are dense from 1 → cutoff = pool size
    }
    // pools NEST: each epoch's admitted score floor only ever decreases
    // (harder docs admitted later), and the easy ceiling is shared
    val minScores = out.map(_._2._3)
    assert(minScores.zip(minScores.tail).forall { case (a, b) => b <= a })
    assert(out.map(_._2._4).distinct.size === 1)
  }

  test("quality classifier is repartition-invariant (exact integer scores)") {
    val dir = "/root/testdata/sf0.001"
    val a = TextAnalysis.qQualityClassifier(spark, dir).collect().map(_.toSeq).toSeq
    val b = TextAnalysis.qQualityClassifier(spark, dir).collect().map(_.toSeq).toSeq
    assert(a === b && a.nonEmpty)
  }
}
