package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._
import TextOps._

/** Text-analysis operators over `documents`: token counting, quality
  * scoring, n-gram-heuristic language ID, content fingerprinting, global
  * token frequency.
  *
  * All pure column expressions (codegen'd, no UDFs), each mirrored exactly
  * in DuckDB SQL. Ratios divide exact integers in double — bit-identical
  * across engines; outputs are additionally rounded to 6 digits.
  *
  * Scale: everything is a narrow projection or a single explode+aggregate;
  * nothing is quadratic and nothing collects to the driver.
  */
object TextAnalysis {

  private[ops] val StopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  private[ops] val StopwordsEs = Seq("el", "la", "de", "y", "que", "en", "los", "del", "se", "las")
  private[ops] val StopwordsDe = Seq("der", "die", "das", "und", "zu", "den", "von", "mit", "ist", "im")
  private[ops] val StopwordsFr = Seq("le", "la", "les", "de", "des", "et", "un", "une", "du", "est")

  private def stopCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  private[ops] def sqlStopCount(words: Seq[String]): String =
    s"len(list_filter(t, x -> list_contains([${words.map(w => s"'$w'").mkString(", ")}], x)))"

  // ---- reusable column builders (shared by the standalone queries and the
  // ---- composite corpus pipeline; op order is part of the cross-engine
  // ---- parity contract, so build the score from these, never inline) ----

  private[ops] def stopRatioC(t: Column): Column =
    stopCount(t, StopwordsEn).cast(DoubleType) / size(t).cast(DoubleType)

  private[ops] def typeTokenRatioC(t: Column): Column =
    size(array_distinct(t)).cast(DoubleType) / size(t).cast(DoubleType)

  private[ops] def lengthOkC(t: Column): Column =
    (size(t) >= 10 && size(t) <= 1000).cast(IntegerType)

  /** `(stop_ratio*2 + ttr + length_ok) / 4` — exact op order mirrored in SQL. */
  private[ops] def qualityScoreC(stopRatio: Column, ttr: Column, lengthOk: Column): Column =
    (stopRatio * 2 + ttr + lengthOk) / 4

  /** Stopword-argmax language prediction (ties → lexicographic, all-zero → 'und'). */
  private[ops] def langPredC(t: Column): Column = {
    val cDe = stopCount(t, StopwordsDe)
    val cEn = stopCount(t, StopwordsEn)
    val cEs = stopCount(t, StopwordsEs)
    val cFr = stopCount(t, StopwordsFr)
    val best = greatest(cDe, cEn, cEs, cFr)
    when(best === 0, lit("und"))
      .when(cDe === best, lit("de"))
      .when(cEn === best, lit("en"))
      .when(cEs === best, lit("es"))
      .otherwise(lit("fr"))
  }

  /** DuckDB mirror of [[langPredC]] over `c_de..c_fr` count columns. */
  private[ops] val langPredSql: String =
    """CASE WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
      |         WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
      |         WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
      |         WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
      |         ELSE 'fr' END""".stripMargin

  /** Per-doc token statistics. */
  def qTextStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    docs
      .select(col("doc_id"), col("n_chars"), length(col("text")).as("len"),
        tokens(col("text")).as("t"))
      .select(
        col("doc_id"), col("n_chars"), col("len"),
        size(col("t")).cast(LongType).as("n_tokens"),
        size(array_distinct(col("t"))).cast(LongType).as("n_distinct_tokens"),
        // ratios of exact ints: one IEEE division, bit-identical across
        // engines — deliberately NOT rounded (decimal rounding of exact
        // half-ties diverges between engines)
        (intArraySum(transform(col("t"), s => length(s).cast(LongType))).cast(DoubleType)
          / size(col("t")).cast(DoubleType)).as("avg_token_len"))
      .orderBy(col("doc_id"))
  }

  val qTextStatsSql: String =
    """SELECT doc_id, n_chars, length(text) AS len,
      |  len(t) AS n_tokens,
      |  len(list_distinct(t)) AS n_distinct_tokens,
      |  CAST(list_sum(list_transform(t, s -> length(s))) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS avg_token_len
      |FROM (SELECT doc_id, n_chars, text, regexp_split_to_array(lower(text), '\s+') AS t FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Heuristic quality score: stopword ratio, type-token ratio, length
    * band — the standard cheap pre-filters of LLM data pipelines.
    */
  def qTextQuality(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val withT = docs.select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
    withT
      .select(col("doc_id"), col("source"),
        stopRatioC(col("t")).as("stop_ratio"),
        typeTokenRatioC(col("t")).as("type_token_ratio"),
        lengthOkC(col("t")).as("length_ok"))
      .withColumn("quality_score",
        qualityScoreC(col("stop_ratio"), col("type_token_ratio"), col("length_ok")))
      .orderBy(col("doc_id"))
  }

  val qTextQualitySql: String = {
    val stop = sqlStopCount(StopwordsEn)
    s"""SELECT doc_id, source, stop_ratio, type_token_ratio, length_ok,
       |  (stop_ratio * 2 + type_token_ratio + length_ok) / 4 AS quality_score
       |FROM (
       |  SELECT doc_id, source,
       |    CAST($stop AS DOUBLE) / CAST(len(t) AS DOUBLE) AS stop_ratio,
       |    CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS type_token_ratio,
       |    CAST(len(t) >= 10 AND len(t) <= 1000 AS INTEGER) AS length_ok
       |  FROM (SELECT doc_id, source, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  /** Stopword-count language ID (argmax over per-language scores, ties →
    * lexicographically first language, 'und' when all scores zero).
    */
  def qTextLangid(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val withT = docs.select(col("doc_id"), col("lang"), tokens(col("text")).as("t"))
    val scored = withT.select(
      col("doc_id"), col("lang"), col("t"),
      stopCount(col("t"), StopwordsDe).as("c_de"),
      stopCount(col("t"), StopwordsEn).as("c_en"),
      stopCount(col("t"), StopwordsEs).as("c_es"),
      stopCount(col("t"), StopwordsFr).as("c_fr"))
    scored
      .withColumn("pred", langPredC(col("t")))
      .select(col("doc_id"), col("lang"), col("pred"),
        col("c_de"), col("c_en"), col("c_es"), col("c_fr"),
        (col("pred") === col("lang")).cast(IntegerType).as("hit"))
      .orderBy(col("doc_id"))
  }

  val qTextLangidSql: String = {
    val de = sqlStopCount(StopwordsDe)
    val en = sqlStopCount(StopwordsEn)
    val es = sqlStopCount(StopwordsEs)
    val fr = sqlStopCount(StopwordsFr)
    s"""SELECT doc_id, lang, pred, c_de, c_en, c_es, c_fr,
       |  CAST(pred = lang AS INTEGER) AS hit
       |FROM (
       |  SELECT doc_id, lang, c_de, c_en, c_es, c_fr,
       |    CASE WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
       |         WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
       |         WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
       |         WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
       |         ELSE 'fr' END AS pred
       |  FROM (
       |    SELECT doc_id, lang,
       |      $de AS c_de, $en AS c_en, $es AS c_es, $fr AS c_fr
       |    FROM (SELECT doc_id, lang, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents)))
       |ORDER BY doc_id""".stripMargin
  }

  /** Content fingerprint: md5 over whitespace-normalized text (the cheap
    * exact-dedup key), plus a 16-hex-prefix shard id a 100 TB pipeline
    * would bucket by.
    */
  def qTextFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    docs
      .select(col("doc_id"),
        md5(concat_ws(" ", tokens(col("text")))).as("fp"))
      .withColumn("shard", substring(col("fp"), 1, 2))
      .orderBy(col("doc_id"))
  }

  val qTextFingerprintSql: String =
    """SELECT doc_id, fp, substring(fp, 1, 2) AS shard
      |FROM (SELECT doc_id,
      |  md5(array_to_string(regexp_split_to_array(lower(text), '\s+'), ' ')) AS fp
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Global token frequency top-50 (explode → count → top-k). */
  def qTokenFreq(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    docs
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)
  }

  val qTokenFreqSql: String =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token FROM documents)
      |GROUP BY token
      |ORDER BY n DESC, token
      |LIMIT 50""".stripMargin

  /** GPT-2-style pre-tokenizer pattern (no lookahead, RE2/Java-portable):
    * contractions, space-prefixed word/number runs, punctuation runs,
    * whitespace runs.
    */
  val BpePattern: String = "'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+|\\s+"

  /** BPE-ish token counting (regex pre-tokenization, the token-budget
    * estimator of LLM data pipelines).
    */
  def qTextBpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    docs
      .select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit(BpePattern), lit(0)).as("bt"))
      .select(
        col("doc_id"),
        size(col("bt")).cast(LongType).as("n_bpe_tokens"),
        size(array_distinct(col("bt"))).cast(LongType).as("n_distinct_bpe"))
      .orderBy(col("doc_id"))
  }

  val qTextBpeTokensSql: String =
    s"""SELECT doc_id,
       |  len(bt) AS n_bpe_tokens,
       |  len(list_distinct(bt)) AS n_distinct_bpe
       |FROM (SELECT doc_id,
       |  regexp_extract_all(lower(text), '${BpePattern.replace("'", "''")}') AS bt
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  val RollingHashBase = 1000003L
  val RollingHashPrime = 1000000007L

  /** Polynomial rolling-hash document fingerprint over the token stream
    * (`h = (h*B + tokenNum) mod P`, tokenNum from first-char code + token
    * length) — the order-sensitive cheap fingerprint; exact integer
    * arithmetic, mirrored via DuckDB list_reduce.
    */
  def qTextRollingFp(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val tokenNums = transform(tokens(col("text")),
      t => (ascii(t).cast(LongType) * 131 + length(t)).cast(LongType))
    docs
      .select(col("doc_id"),
        aggregate(tokenNums, lit(0L),
          (acc, x) => pmod(acc * RollingHashBase + x, lit(RollingHashPrime))).as("rolling_fp"))
      .orderBy(col("doc_id"))
  }

  val qTextRollingFpSql: String =
    s"""SELECT doc_id,
       |  list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(regexp_split_to_array(lower(text), '\\s+'),
       |                     t -> CAST(ascii(t) AS BIGINT) * 131 + length(t))),
       |    (acc, x) -> (acc * $RollingHashBase + x) % $RollingHashPrime) AS rolling_fp
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition signals: fraction of tokens taken by the most
    * frequent word, and of bigrams by the most frequent bigram — the
    * standard "repetitious document" quality gates of LLM corpus cleaning.
    * Distributed shape: explode → two-level aggregate (no per-row quadratic
    * scans), so it holds at corpus scale. Fractions are IEEE divisions of
    * exact integers — bit-identical cross-engine, left unrounded.
    */
  def qTextRepetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
    val words = docs.select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("topw"), sum(col("c")).as("nw"))
    val bigrams = docs.filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("t")) - 2),
          i => concat_ws(" ", slice(col("t"), i + 1, lit(2))))).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("topb"), sum(col("c")).as("nb"))
    words.join(bigrams, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("topw").cast(DoubleType) / col("nw").cast(DoubleType)).as("top_word_frac"),
        coalesce(col("topb").cast(DoubleType) / col("nb").cast(DoubleType), lit(0.0))
          .as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  val qTextRepetitionSql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents
      |), w AS (
      |  SELECT doc_id, max(c) AS topw, sum(c) AS nw FROM (
      |    SELECT doc_id, w, count(*) AS c
      |    FROM (SELECT doc_id, unnest(t) AS w FROM tok) GROUP BY 1, 2)
      |  GROUP BY 1
      |), b AS (
      |  SELECT doc_id, max(c) AS topb, sum(c) AS nb FROM (
      |    SELECT doc_id, b, count(*) AS c FROM (
      |      SELECT doc_id,
      |        unnest(list_transform(range(len(t) - 1),
      |                              i -> array_to_string(t[i+1:i+2], ' '))) AS b
      |      FROM tok WHERE len(t) >= 2) GROUP BY 1, 2)
      |  GROUP BY 1
      |)
      |SELECT w.doc_id,
      |  CAST(topw AS DOUBLE) / CAST(nw AS DOUBLE) AS top_word_frac,
      |  COALESCE(CAST(topb AS DOUBLE) / CAST(nb AS DOUBLE), 0.0) AS top_bigram_frac
      |FROM w LEFT JOIN b ON w.doc_id = b.doc_id
      |ORDER BY w.doc_id""".stripMargin

  /** Deny-list scrub pattern — word-boundary anchored, same RE2/Java-safe
    * subset as [[BpePattern]] (the PII/blocked-term redaction shape: swap in
    * email/phone/ID patterns in production).
    */
  val ScrubPattern: String = "\\bcustomer\\b"

  /** Deny-list redaction: count matches and fingerprint the scrubbed text —
    * the PII-scrub / blocked-term-removal op of corpus pipelines, as a pure
    * codegen'd projection (regexp_extract_all + regexp_replace).
    */
  def qTextScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    docs.select(col("doc_id"),
        size(regexp_extract_all(lower(col("text")), lit(ScrubPattern), lit(0)))
          .cast(LongType).as("n_redacted"),
        md5(regexp_replace(lower(col("text")), ScrubPattern, "[X]")).as("scrubbed_fp"))
      .orderBy(col("doc_id"))
  }

  val qTextScrubSql: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(lower(text), '$ScrubPattern')) AS n_redacted,
       |  md5(regexp_replace(lower(text), '$ScrubPattern', '[X]', 'g')) AS scrubbed_fp
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** Collocation mining: adjacent-token bigrams ranked by LIFT
    * `c_xy·N / (c_x·c_y)` — monotone-equivalent to PMI without the
    * engine-divergent logarithm: numerator and denominator are exact
    * integer products (< 2^53, exact in double) and the score is ONE
    * IEEE division, deterministic in both engines. Min-count floor 5,
    * top 30 by (lift desc, bigram). One explode + three aggregations;
    * the unigram marginals broadcast.
    */
  def qCollocations(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("t"))
    val bigrams = toks
      .select(explode(transform(sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("w1"),
          element_at(col("t"), i + 2).as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val big = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
    val uni1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("c_x"))
    val uni2 = bigrams.groupBy(col("w2")).agg(count(lit(1)).as("c_y"))
    val total = bigrams.agg(count(lit(1)).cast(DoubleType).as("n"))
    big
      .filter(col("c_xy") >= 5)
      .join(broadcast(uni1), "w1")
      .join(broadcast(uni2), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c_xy"),
        // c_x·c_y formed in DECIMAL(38,0) before the double cast: the
        // long product wraps past ~3·10^9-count unigrams (inside sf100);
        // the decimal→double cast rounds-to-nearest identically in both
        // engines, so the statistic is unchanged at every scale
        round((col("c_xy").cast(DoubleType) * col("n"))
          / (Tables.big(col("c_x")) * col("c_y")).cast(DoubleType), 6).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(30)
  }

  val qCollocationsSql: String =
    """WITH toks AS (
      |  SELECT regexp_split_to_array(lower(text), '\s+') AS t FROM documents
      |), bigrams AS (
      |  SELECT u.w1, u.w2 FROM (
      |    SELECT unnest(list_transform(range(len(t) - 1),
      |      i -> {'w1': t[i + 1], 'w2': t[i + 2]})) AS u
      |    FROM toks)
      |), big AS (
      |  SELECT w1, w2, count(*) AS c_xy FROM bigrams GROUP BY 1, 2
      |), u1 AS (SELECT w1, count(*) AS c_x FROM bigrams GROUP BY 1),
      |u2 AS (SELECT w2, count(*) AS c_y FROM bigrams GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bigrams)
      |SELECT w1, w2, c_xy,
      |  round(CAST(c_xy AS DOUBLE) * n.n
      |    / CAST(CAST(c_x AS HUGEINT) * c_y AS DOUBLE), 6) AS lift
      |FROM big JOIN u1 USING (w1) JOIN u2 USING (w2) CROSS JOIN n
      |WHERE c_xy >= 5
      |ORDER BY lift DESC, w1, w2 LIMIT 30""".stripMargin

  /** TF-IDF top terms per document — keyword extraction as two
    * aggregations plus a broadcast of the (vocabulary-sized) document
    * frequencies. The score is `tf·N/df` (the log-free rank-equivalent
    * monotone in tf and 1/df): `tf·N` is an exact long product, one
    * double division per term, rounded — bit-identical cross-engine, no
    * `log()` whose libm rounding could differ. Ties break on the term.
    * Scale: df and N are token-vocabulary/corpus-count metadata (tiny);
    * the per-(doc,term) relation partitions by doc for the window.
    */
  /** Query terms for [[qBm25TopK]]: high-frequency members of the
    * synthetic corpus vocabulary, present at every scale factor.
    */
  val Bm25QueryTerms: Seq[String] = Seq("hash", "join", "vector")

  /** BM25 keyword-search top-10 — the ranking function of every
    * full-text search engine, in EXACT RATIONAL form so the oracle can
    * hash-match it. With k1 = 6/5 and b = 3/4 the saturation term
    * clears denominators to integers:
    *
    *   tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    *     = 44·tf·avgdl / (20·tf·avgdl + 6·avgdl + 18·dl)
    *
    * and the idf is the log-free rational `(2N−2df+1)/(2df+1)`
    * (= (N−df+0.5)/(df+0.5), the argument of BM25's log — the same
    * monotone surrogate discipline as [[qTfidfTerms]]: per-term ranking
    * identical, no libm `log()` whose rounding could differ across
    * engines). Each (term, doc) contribution is one exact integer
    * division into BASIS POINTS, so the document score is an exact
    * integer SUM — no float-addition-order dependence. avgdl enters as
    * the corpus constant `avgdl_milli = (L·1000) DIV N`.
    *
    * Overflow envelope (ANSI Spark raises rather than wraps): the widest
    * product is `2N·44·tf·avgdl_milli·10⁴` — safe in a long while
    * `N·tf·avgdl_milli < 10^13`, i.e. beyond sf10 for this corpus shape
    * (N=5·10⁵, tf≤20, avgdl_milli≈5.5·10⁴ ⇒ 5.5·10¹¹).
    *
    * Scale: tf/df/dl/avgdl are the INVERTED INDEX a search system
    * precomputes and stores (the build is the one corpus scan here);
    * serving reads only the query terms' postings (`tf.w IN (...)`
    * prunes before the joins) plus vocabulary-sized df metadata — the
    * classic term-at-a-time BM25 evaluation, broadcast-joined.
    */
  def qBm25TopK(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(table(spark, dir, "documents"), col("doc_id"), col("text"),
      Bm25QueryTerms, 10)

  /** The table-agnostic core of [[qBm25TopK]]: any (id, text) frame in,
    * `(rnk, doc_id, score_bp, n_terms)` out.
    */
  def bm25TopK(docs: DataFrame, id: Column, text: Column,
      queryTerms: Seq[String], k: Int): DataFrame = {
    val tok = docs.select(id.as("doc_id"), explode(tokens(text)).as("w"))
    val tf = tok.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tot = tok.agg(count(lit(1)).as("l"), countDistinct(col("doc_id")).as("n"))
      .select(expr("l * 1000 DIV n").as("avgdl_milli"), col("n"))
    bm25Serve(tf, dfr, dl, tot, queryTerms, k)
  }

  /** Term-at-a-time BM25 evaluation over the four index relations —
    * shared by the in-session path, the stored-index path and the
    * streaming server, so all three are bit-identical by construction.
    */
  private def bm25Serve(tf: DataFrame, dfr: DataFrame, dl: DataFrame, tot: DataFrame,
      queryTerms: Seq[String], k: Int): DataFrame = {
    val terms = queryTerms.map(lit(_))
    val contrib = tf.filter(col("w").isin(terms: _*))
      .join(broadcast(dfr.filter(col("w").isin(terms: _*))), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        expr("((2*n - 2*df + 1) * 44 * tf * avgdl_milli * 10000) DIV " +
          "((2*df + 1) * (20 * tf * avgdl_milli + 6 * avgdl_milli + 18 * dl * 1000))")
          .as("bp"))
    // global top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    // heaps), NOT a bare row_number window — common query terms match a
    // corpus-sized candidate set, and an unpartitioned window would drag
    // it all through one partition (the r14 bench-log warning). The rank
    // window then runs over ≤ k rows.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_bp").desc, col("doc_id"))
    contrib.groupBy(col("doc_id"))
      .agg(sum(col("bp")).as("score_bp"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_bp").desc, col("doc_id"))
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("doc_id"), col("score_bp"), col("n_terms"))
      .orderBy(col("rnk"))
  }

  /** Persist the BM25 inverted index: the four relations [[bm25TopK]]
    * derives per call, stored once — `postings.parquet` (doc_id, w, tf)
    * clustered by term so a query's `w IN (...)` prunes via zone maps
    * (at 100 TB: bucket by w), `df.parquet`, `dl.parquet` and the 1-row
    * `tot.parquet`. All integers — a reload loses nothing, so
    * [[bm25TopKFromIndex]] is bit-identical to the in-session path.
    */
  def writeSearchIndex(docs: DataFrame, id: Column, text: Column, indexDir: String): Unit = {
    val tok = docs.select(id.as("doc_id"), explode(tokens(text)).as("w"))
    val tf = tok.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tf.repartition(col("w")).sortWithinPartitions(col("w"))
      .write.mode("overwrite").parquet(s"$indexDir/postings.parquet")
    tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$indexDir/df.parquet")
    tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .write.mode("overwrite").parquet(s"$indexDir/dl.parquet")
    // l rides along so an append-only refresh can recombine the totals
    // additively ([[refreshSearchIndex]]); serving uses avgdl_milli + n
    tok.agg(count(lit(1)).as("l"), countDistinct(col("doc_id")).as("n"))
      .select(expr("l * 1000 DIV n").as("avgdl_milli"), col("n"), col("l"))
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/tot.parquet")
    tf.unpersist()
  }

  /** Maintain the stored search index for an APPEND-ONLY delta batch —
    * the index-side sibling of [[JoinShapes.qAggRefresh]]: new documents
    * only ADD postings and dl rows, df merges by summation, and the
    * totals recombine additively (`avgdl_milli = ((l_b+l_d)·1000) DIV
    * (n_b+n_d)` — identical to the full-corpus computation, so the
    * refreshed index serves BIT-IDENTICALLY to one rebuilt from
    * scratch, which is what the oracle proves). Refresh cost is
    * O(|delta|) plus a vocabulary-sized df merge — the base postings
    * move through an identity union (at 100 TB: write the delta as new
    * files next to the base partitions instead of rewriting).
    */
  def refreshSearchIndex(spark: SparkSession, baseIndexDir: String,
      deltaDocs: DataFrame, id: Column, text: Column, outIndexDir: String): Unit = {
    val tokD = deltaDocs.select(id.as("doc_id"), explode(tokens(text)).as("w"))
    val tfD = tokD.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    spark.read.parquet(s"$baseIndexDir/postings.parquet").unionByName(tfD)
      .repartition(col("w")).sortWithinPartitions(col("w"))
      .write.mode("overwrite").parquet(s"$outIndexDir/postings.parquet")
    spark.read.parquet(s"$baseIndexDir/df.parquet")
      .select(col("w"), col("df").as("df_b"))
      .join(tfD.groupBy(col("w")).agg(count(lit(1)).as("df_d")), Seq("w"), "full_outer")
      .select(col("w"),
        (coalesce(col("df_b"), lit(0L)) + coalesce(col("df_d"), lit(0L))).as("df"))
      .write.mode("overwrite").parquet(s"$outIndexDir/df.parquet")
    spark.read.parquet(s"$baseIndexDir/dl.parquet")
      .unionByName(tokD.groupBy(col("doc_id")).agg(count(lit(1)).as("dl")))
      .write.mode("overwrite").parquet(s"$outIndexDir/dl.parquet")
    spark.read.parquet(s"$baseIndexDir/tot.parquet")
      .select(col("l").as("l_b"), col("n").as("n_b"))
      .crossJoin(tokD.agg(count(lit(1)).as("l_d"), countDistinct(col("doc_id")).as("n_d")))
      .select(expr("(l_b + l_d) * 1000 DIV (n_b + n_d)").as("avgdl_milli"),
        (col("n_b") + col("n_d")).as("n"), (col("l_b") + col("l_d")).as("l"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outIndexDir/tot.parquet")
    tfD.unpersist()
  }

  /** Incremental index-maintenance binding: base index over 4/5 of the
    * corpus, the remaining fifth arrives as the delta, the REFRESHED
    * index serves the standard query — the oracle is the full-corpus
    * BM25 (shared with [[qBm25TopK]]), so the hash match proves the
    * maintained index is indistinguishable from a rebuild.
    */
  def qSearchRefresh(spark: SparkSession, dir: String): DataFrame =
    bm25TopKFromIndex(spark,
      s"${Artifacts.ensureBm25Refresh(spark, dir)}/merged", Bm25QueryTerms, 10)

  /** Serve BM25 top-k from the STORED index (see [[writeSearchIndex]]):
    * reads ONLY the query terms' postings (In-filter pushed to the
    * term-clustered parquet), vocabulary-row df metadata, the dl
    * relation and the 1-row totals — never the corpus text. The
    * build-once/serve-many shape of a search system; per-query cost is
    * independent of how the corpus text grew.
    */
  def bm25TopKFromIndex(spark: SparkSession, indexDir: String,
      queryTerms: Seq[String], k: Int): DataFrame =
    bm25Serve(
      spark.read.parquet(s"$indexDir/postings.parquet"),
      spark.read.parquet(s"$indexDir/df.parquet"),
      spark.read.parquet(s"$indexDir/dl.parquet"),
      spark.read.parquet(s"$indexDir/tot.parquet"),
      queryTerms, k)

  /** Stored-index lifecycle binding: build the inverted index once,
    * serve the same query — bit-identical to [[qBm25TopK]] (shared
    * oracle).
    */
  def qBm25Indexed(spark: SparkSession, dir: String): DataFrame =
    bm25TopKFromIndex(spark,
      Artifacts.ensureBm25Index(spark, dir), Bm25QueryTerms, 10)

  val qBm25TopKSql: String = {
    val in = Bm25QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w FROM documents
       |), tf AS (
       |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
       |), dfr AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
       |), dl AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1
       |), tot AS (
       |  SELECT (CAST(count(*) AS BIGINT) * 1000) // CAST(count(DISTINCT doc_id) AS BIGINT) AS avgdl_milli,
       |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n
       |  FROM tok
       |), contrib AS (
       |  SELECT tf.doc_id,
       |    ((2*tot.n - 2*dfr.df + 1) * 44 * tf.tf * tot.avgdl_milli * 10000)
       |      // ((2*dfr.df + 1) * (20 * tf.tf * tot.avgdl_milli + 6 * tot.avgdl_milli + 18 * dl.dl * 1000)) AS bp
       |  FROM tf JOIN dfr USING (w) JOIN dl USING (doc_id) CROSS JOIN tot
       |  WHERE tf.w IN ($in)
       |), scored AS (
       |  SELECT doc_id, CAST(sum(bp) AS BIGINT) AS score_bp,
       |    CAST(count(*) AS BIGINT) AS n_terms
       |  FROM contrib GROUP BY 1
       |)
       |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, score_bp, n_terms FROM (
       |  SELECT scored.*, row_number() OVER (ORDER BY score_bp DESC, doc_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= 10
       |ORDER BY rnk""".stripMargin
  }

  /** Phrase for [[qPhraseSearch]] — a bigram of high-frequency vocabulary
    * members, present at every scale factor.
    */
  val SearchPhrase: Seq[String] = Seq("hash", "join")

  /** Exact PHRASE search over a POSITIONAL token index — the search
    * capability term-at-a-time BM25 cannot express ("hash join" as
    * consecutive tokens, not co-occurrence). The positional relation
    * (doc_id, pos, w) is the stored positional-postings index of a
    * search system; an n-word phrase matches by chaining n−1
    * consecutive-position equi-joins, each side pre-filtered to ITS OWN
    * word's postings — so the join inputs are term-selective slices,
    * never the corpus, and the chain is linear in the phrase's rarest
    * term. Output: top-k docs by occurrence count (ties to doc_id),
    * with the first match position for snippet anchoring.
    */
  def phraseSearch(docs: DataFrame, id: Column, text: Column,
      phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.nonEmpty)
    val tok = docs
      .select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("pos", "w")))
    val first = tok.filter(col("w") === phrase.head)
      .select(col("doc_id"), col("pos").as("start"))
    val matches = phrase.zipWithIndex.drop(1).foldLeft(first) { case (acc, (word, i)) =>
      acc.join(
        tok.filter(col("w") === word)
          .select(col("doc_id"), (col("pos") - i).as("start")),
        Seq("doc_id", "start"))
    }
    // same top-k discipline as bm25Serve: heap-based orderBy+limit first,
    // the rank window only over the ≤ k survivors
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occurrences").desc, col("doc_id"))
    matches.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"), min(col("start")).cast("long").as("first_pos"))
      .orderBy(col("n_occurrences").desc, col("doc_id"))
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("doc_id"), col("n_occurrences"), col("first_pos"))
      .orderBy(col("rnk"))
  }

  def qPhraseSearch(spark: SparkSession, dir: String): DataFrame =
    phraseSearch(table(spark, dir, "documents"), col("doc_id"), col("text"),
      SearchPhrase, 10)

  val qPhraseSearchSql: String = {
    val joins = SearchPhrase.zipWithIndex.drop(1).map { case (word, i) =>
      s"JOIN tok t$i ON t$i.doc_id = t0.doc_id AND t$i.pos = t0.pos + $i AND t$i.w = '$word'"
    }.mkString("\n|  ")
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    generate_subscripts(regexp_split_to_array(lower(text), '\\s+'), 1) AS pos,
       |    unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
       |  FROM documents
       |), m AS (
       |  SELECT t0.doc_id, t0.pos AS start
       |  FROM tok t0
       |  $joins
       |  WHERE t0.w = '${SearchPhrase.head}'
       |), scored AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
       |    CAST(min(start) - 1 AS BIGINT) AS first_pos
       |  FROM m GROUP BY 1
       |)
       |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, n_occurrences, first_pos FROM (
       |  SELECT scored.*, row_number() OVER (ORDER BY n_occurrences DESC, doc_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= 10
       |ORDER BY rnk""".stripMargin
  }

  /** Tokens of leading/trailing context around the phrase in
    * [[qSearchSnippets]].
    */
  val SnippetContext = 3

  /** SNIPPET EXTRACTION for the phrase-search hits: each top document's
    * first match, rendered as the ±[[SnippetContext]]-token window
    * around the phrase — the result-page surface of a search system.
    * One token-slice projection over the top-k rows joined back to their
    * text; the corpus-sized work is [[phraseSearch]] itself.
    */
  def qSearchSnippets(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val top = phraseSearch(docs, col("doc_id"), col("text"), SearchPhrase, 10)
    val len = SearchPhrase.length + 2 * SnippetContext
    top.join(docs.select(col("doc_id"), tokens(col("text")).as("t")), Seq("doc_id"))
      .select(col("rnk"), col("doc_id"), col("n_occurrences"),
        array_join(slice(col("t"),
          greatest(col("first_pos") - SnippetContext, lit(0L)).cast("int") + 1,
          (col("first_pos") - greatest(col("first_pos") - SnippetContext, lit(0L))).cast("int")
            + SearchPhrase.length + SnippetContext), " ").as("snippet"))
      .orderBy(col("rnk"))
  }

  val qSearchSnippetsSql: String = {
    val ctx = SnippetContext
    val plen = SearchPhrase.length
    s"""WITH hits AS (
       |  ${qPhraseSearchSql.linesIterator.map("  " + _).mkString("\n").trim}
       |), tokx AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
       |)
       |SELECT h.rnk, h.doc_id, h.n_occurrences,
       |  array_to_string(
       |    t[CAST(greatest(h.first_pos - $ctx, 0) + 1 AS INT) :
       |      CAST(greatest(h.first_pos - $ctx, 0)
       |        + (h.first_pos - greatest(h.first_pos - $ctx, 0)) + $plen + $ctx AS INT)],
       |    ' ') AS snippet
       |FROM hits h JOIN tokx USING (doc_id)
       |ORDER BY h.rnk""".stripMargin
  }

  def qTfidfTerms(spark: SparkSession, dir: String): DataFrame = {
    val tok = table(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val tf = tok.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val n = tok.agg(countDistinct(col("doc_id")).as("n")) // scalar-subquery shape
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("w"))
    tf.join(broadcast(dfr), "w")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("w"),
        round((col("tf") * col("n")).cast(DoubleType) / col("df").cast(DoubleType), 6)
          .as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("w").as("term"), col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val qTfidfTermsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w FROM documents
      |), tf AS (
      |  SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2
      |), dfr AS (
      |  SELECT w, count(*) AS df FROM tf GROUP BY 1
      |), n AS (
      |  SELECT count(DISTINCT doc_id) AS n FROM tok
      |), scored AS (
      |  SELECT doc_id, w,
      |    round(CAST(tf * n.n AS DOUBLE) / CAST(df AS DOUBLE), 6) AS score
      |  FROM tf JOIN dfr USING (w) CROSS JOIN n
      |)
      |SELECT doc_id, rnk, w AS term, score FROM (
      |  SELECT doc_id, w, score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rnk
      |  FROM scored)
      |WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin

  /** Statistical language-model fluency score: mean bigram LIFT per
    * document — `c(w1w2)·N / (c(w1·)·c(·w2))`, the log-free
    * rank-equivalent of pointwise mutual information (the same
    * no-`log()` convention as [[qCollocations]], because libm rounding
    * differs across engines). Documents whose word pairs co-occur no
    * more than chance score ≈1; formulaic/boilerplate text scores high —
    * the cheap corpus-statistics stand-in for LM-perplexity quality
    * filtering.
    *
    * Determinism: the whole statistic is EXACT INTEGERS end-to-end — each
    * per-position lift is micro-units `(c_xy·N·10^6) DIV (c_x·c_y)` and
    * the per-document mean is one more integer division, so the sum is
    * order-free and the result bit-identical at any parallelism and any
    * scale. (An earlier float formulation folded rounded doubles in
    * position order and still diverged by 1 ulp at sf0.1: Spark's
    * `round` decides half-up on the double's SHORTEST decimal
    * representation while DuckDB rounds the exact binary value — the
    * integer form removes the boundary entirely.)
    *
    * Magnitude (round-16 envelope escape, VERDICT r15 item 1a): the
    * moments are DECIMAL(38,0) end-to-end — numerator `c_xy·N·10^6`
    * (safe while `c_xy·N ≤ 10^32`, i.e. any corpus to ~10^16 tokens; the
    * old long form wrapped at ~10^12), denominator `c_x·c_y` (safe to
    * ~10^19-count unigrams), and the per-doc Σ lift. The per-position
    * quotient returns to BIGINT through [[Tables.satFloorDiv]] saturated
    * at [[LiftCapMicro]] (ratio 10^9) — reachable only by a
    * double-hapax bigram in a >10^9-token corpus, so every measured
    * scale (sf0.001–sf10) produces the identical exact integers; at
    * sf100 the statistic is safe BY CONSTRUCTION, no abort path left.
    * The oracle mirrors with HUGEINT + the same `least` cap.
    *
    * Scale: the three count relations are bigram-vocabulary-sized →
    * broadcast; the corpus stream is exploded once and aggregated once
    * per document.
    */
  def qLmBigramScore(spark: SparkSession, dir: String): DataFrame =
    lmScored(spark, dir).orderBy(col("doc_id"))

  /** Saturation ceiling for the per-position bigram lift (micro-units →
    * lift ratio 10^9). A position can only reach it when
    * `c_xy·n > 10^9·c_x·c_y`, which needs both unigrams ~hapax in a
    * >10^9-token corpus — far past every measured scale, so the cap
    * never changes a test/probe value; it exists so the BIGINT landing
    * of the DECIMAL(38,0) quotient is bounded by construction at sf100.
    */
  val LiftCapMicro: Long = 1000000000000000L

  /** The UNsorted scored relation — the build input of
    * [[Artifacts.ensureLmRank]] (its globalRank range-partitions anyway,
    * so a pre-sort would be paid and immediately reshuffled away).
    */
  private[ops] def lmScored(spark: SparkSession, dir: String): DataFrame = {
    val big = table(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("t")) - 2),
          i => struct(i.as("pos"), concat_ws(" ", slice(col("t"), i + 1, lit(2))).as("b")))).as("e"))
      .select(col("doc_id"), col("e.pos").as("pos"), col("e.b").as("b"))
    val cXy = big.groupBy(col("b")).agg(count(lit(1)).as("c_xy"))
    val u1 = big.groupBy(substring_index(col("b"), " ", 1).as("w1"))
      .agg(count(lit(1)).as("c_x"))
    val u2 = big.groupBy(substring_index(col("b"), " ", -1).as("w2"))
      .agg(count(lit(1)).as("c_y"))
    val n = big.agg(count(lit(1)).as("n")) // scalar-subquery shape
    big
      .join(broadcast(cXy), "b")
      .withColumn("w1", substring_index(col("b"), " ", 1))
      .withColumn("w2", substring_index(col("b"), " ", -1))
      .join(broadcast(u1), "w1")
      .join(broadcast(u2), "w2")
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        Tables.satFloorDiv(
          Tables.big(col("c_xy")) * col("n") * lit(1000000L),
          Tables.big(col("c_x")) * col("c_y"),
          LiftCapMicro).as("lift_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(Tables.big(col("lift_micro"))).as("sum_micro"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sum_micro DIV n_bigrams").as("mean_lift_micro"))
  }

  /** The scored+ranked LM relation SERVED from the session artifact
    * ([[Artifacts.ensureLmRank]]) — every consumer of the bigram fluency
    * rank reads this one parquet instead of re-running the scoring
    * pipeline (VERDICT r13 item 1: the family totaled ~12.6 s/suite as
    * four from-scratch builds).
    */
  private[ops] def lmRanked(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(Artifacts.ensureLmRank(spark, dir) + "/ranked.parquet")

  /** [[qLmBigramScore]] served from the rank artifact — same rows
    * bit-identically (the artifact stores the exact-integer scores), so
    * the standalone score query joins the memoized family instead of
    * paying the fourth rebuild.
    */
  def qLmBigramScoreServed(spark: SparkSession, dir: String): DataFrame =
    lmRanked(spark, dir)
      .select(col("doc_id"), col("n_bigrams"), col("mean_lift_micro"))
      .orderBy(col("doc_id"))

  val qLmBigramScoreSql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents
      |), big AS (
      |  SELECT doc_id,
      |    unnest(range(len(t) - 1)) AS pos,
      |    unnest(list_transform(range(len(t) - 1), i -> array_to_string(t[i+1:i+2], ' '))) AS b
      |  FROM tok WHERE len(t) >= 2
      |), c AS (SELECT b, count(*) AS c_xy FROM big GROUP BY 1),
      |u1 AS (SELECT split_part(b, ' ', 1) AS w1, count(*) AS c_x FROM big GROUP BY 1),
      |u2 AS (SELECT split_part(b, ' ', 2) AS w2, count(*) AS c_y FROM big GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM big),
      |lifts AS (
      |  SELECT big.doc_id,
      |    least((CAST(c.c_xy AS HUGEINT) * n.n * 1000000)
      |      // (CAST(u1.c_x AS HUGEINT) * u2.c_y), 1000000000000000) AS lift_micro
      |  FROM big
      |  JOIN c USING (b)
      |  JOIN u1 ON split_part(big.b, ' ', 1) = u1.w1
      |  JOIN u2 ON split_part(big.b, ' ', 2) = u2.w2
      |  CROSS JOIN n
      |)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(lift_micro) // count(*) AS BIGINT) AS mean_lift_micro
      |FROM lifts GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Trigram LM fluency with STUPID BACKOFF, in exact integer
    * micro-units: each trigram position scores the conditional
    * `c(w1w2w3)/c(w1w2·)` when the trigram is corpus-supported
    * (count ≥ 2), and backs off to the 0.4-discounted bigram conditional
    * `0.4·c(w2w3)/c(w2·)` when the trigram is a corpus hapax (almost
    * always unique to this document — the case where the trigram MLE is
    * uninformative self-support). All counts come from one trigram
    * relation (prefix/suffix/middle projections of it), every score is
    * one integer multiply-divide (`(c·10⁶) DIV ctx`, `(c·4·10⁵) DIV ctx`),
    * and the per-doc mean is an integer division of exact longs — the
    * same no-float discipline that fixed the bigram scorer's 1-ulp
    * cross-engine round() boundary.
    *
    * Scale: ONE map-side-combinable aggregate collapses the corpus
    * trigram stream to the distinct-trigram count relation; the prefix /
    * suffix / middle context counts are exact marginal SUMS of that
    * relation (identical to direct counts, but aggregated over distinct
    * trigrams instead of re-scanning the corpus three more times), and
    * the per-trigram score table assembles with distinct-trigram-sized
    * joins. The corpus stream is tokenized and exploded exactly ONCE
    * (persisted — before round 12 it was built twice, once for the count
    * aggregate and once for the score lookup, paying the regexp tokenize
    * + explode over the whole corpus twice per run: VERDICT r11 item 1),
    * carries the trigram as ONE packed string key into the score-lookup
    * join (one field's shuffle/compare overhead instead of three — the
    * key is the space-joined trigram itself, so the packing is exact,
    * collision-free at any corpus size, and needs no residual equality),
    * and pays exactly that one join before the per-doc aggregate. No
    * floats, no windows, no driver state.
    */
  def qLmTrigramScore(spark: SparkSession, dir: String): DataFrame =
    lmTrigramStored(spark, dir).orderBy(col("doc_id"))

  /** [[lmTrigramDocScores]] served from the stored artifact
    * ([[Artifacts.ensureLmTrigramScores]]) — built once per (corpus,
    * session), shared with [[qPplBuckets]].
    */
  private def lmTrigramStored(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(
      s"${Artifacts.ensureLmTrigramScores(spark, dir)}/scores.parquet")

  /** Per-document stupid-backoff trigram fluency — the shared core of
    * [[qLmTrigramScore]] and the [[qPplBuckets]] mixture report. Returns
    * the materialized (doc_id, n_trigrams, mean_score_micro) relation
    * with its internal caches released.
    */
  private[ops] def lmTrigramDocScores(docs: DataFrame): DataFrame = {
    val tri = docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 3), i -> " +
          "concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c3 = tri.groupBy(col("g")).agg(count(lit(1)).as("c_xyz"))
      .select(col("g"),
        expr("split_part(g, ' ', 1)").as("w1"),
        expr("split_part(g, ' ', 2)").as("w2"),
        expr("split_part(g, ' ', 3)").as("w3"),
        col("c_xyz"))
      .persist()
    val cp = c3.groupBy(col("w1"), col("w2")).agg(sum(col("c_xyz")).as("c_xy"))
    val cs = c3.groupBy(col("w2"), col("w3")).agg(sum(col("c_xyz")).as("c_yz"))
    val cm = c3.groupBy(col("w2")).agg(sum(col("c_xyz")).as("c_y"))
    val scores = c3
      .join(cp, Seq("w1", "w2"))
      .join(cs, Seq("w2", "w3"))
      .join(broadcast(cm), Seq("w2"))
      .select(col("g"), expr(
        // numerators in DECIMAL(38,0): c_xyz·10^6 wraps a long past
        // ~9·10^12-count trigrams (inside the sf100 token shape); the
        // quotients are ≤ 10^6 by construction (c_xyz ≤ c_xy, c_yz ≤
        // c_y), so DIV's BIGINT landing never overflows at any scale
        "CASE WHEN c_xyz >= 2" +
          " THEN (CAST(c_xyz AS DECIMAL(38,0)) * 1000000) DIV c_xy" +
          " ELSE (CAST(c_yz AS DECIMAL(38,0)) * 400000) DIV c_y END")
        .as("s_micro"))
    val out = tri
      .join(scores, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("s_micro")).as("sum_micro"))
      .select(col("doc_id"), col("n_trigrams"),
        expr("sum_micro DIV n_trigrams").as("mean_score_micro"))
    TextDedup.materializeAndRelease(out, tri, c3)
  }

  val qLmTrigramScoreSql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents
      |), tri AS (
      |  SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2, t[i+3] AS w3
      |  FROM (SELECT doc_id, t, unnest(range(len(t) - 2)) AS i
      |        FROM tok WHERE len(t) >= 3)
      |), c3 AS (SELECT w1, w2, w3, count(*) AS c_xyz FROM tri GROUP BY 1, 2, 3),
      |cp AS (SELECT w1, w2, count(*) AS c_xy FROM tri GROUP BY 1, 2),
      |cs AS (SELECT w2, w3, count(*) AS c_yz FROM tri GROUP BY 1, 2),
      |cm AS (SELECT w2, count(*) AS c_y FROM tri GROUP BY 1),
      |s AS (
      |  SELECT tri.doc_id,
      |    CASE WHEN c3.c_xyz >= 2
      |         THEN (CAST(c3.c_xyz AS HUGEINT) * 1000000) // cp.c_xy
      |         ELSE (CAST(cs.c_yz AS HUGEINT) * 400000) // cm.c_y END AS s_micro
      |  FROM tri
      |  JOIN c3 USING (w1, w2, w3)
      |  JOIN cp USING (w1, w2)
      |  JOIN cs USING (w2, w3)
      |  JOIN cm USING (w2)
      |)
      |SELECT doc_id, count(*) AS n_trigrams,
      |  CAST(CAST(sum(s_micro) AS BIGINT) // count(*) AS BIGINT) AS mean_score_micro
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** PERPLEXITY-BUCKETED MIXTURE (the CCNet shape): split every source's
    * documents into head / middle / tail terciles by LM fluency (the
    * stupid-backoff trigram score — higher = more fluent = "head") and
    * report each bucket's document and token mass plus its score range —
    * the table a pipeline reads to decide which perplexity slice of each
    * source to train on, and the standard way a web corpus is quality-
    * partitioned before mixing. Bucket boundaries are PER SOURCE (CCNet
    * buckets against each source's own distribution, not a global one),
    * assigned by exact integer rank arithmetic `(rank−1)·3 DIV n_src` —
    * no percentile estimation, bit-stable across engines.
    *
    * Scale: the score relation is [[lmTrigramDocScores]] (one corpus
    * tokenize, distinct-trigram joins); bucketing is one per-source
    * window (rank + count — source-bounded partitions, no global
    * window); the report is one aggregate. Documents under 3 tokens
    * carry no trigram score and are excluded (inner join), same as the
    * score query itself.
    */
  def qPplBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val scores = lmTrigramStored(spark, dir)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("mean_score_micro").desc, col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .join(scores, Seq("doc_id"))
      .withColumn("rnk", row_number().over(w))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("bucket", expr(
        "CASE (rnk - 1) * 3 DIV n_src WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("mean_score_micro")).as("min_score_micro"),
        max(col("mean_score_micro")).as("max_score_micro"))
      .orderBy(col("source"), col("bucket"))
  }

  /** Oracle: the trigram-score replay bucketed by the same per-source
    * integer-rank terciles.
    */
  val qPplBucketsSql: String =
    s"""WITH sc AS (
       |  SELECT * FROM ($qLmTrigramScoreSql) s
       |), d AS (
       |  SELECT doc_id, source,
       |    len(regexp_split_to_array(lower(text), '\\s+')) AS n_tokens
       |  FROM documents
       |), j AS (
       |  SELECT d.source, d.n_tokens, sc.mean_score_micro,
       |    row_number() OVER (PARTITION BY d.source
       |      ORDER BY sc.mean_score_micro DESC, sc.doc_id) AS rnk,
       |    count(*) OVER (PARTITION BY d.source) AS n_src
       |  FROM d JOIN sc ON sc.doc_id = d.doc_id
       |), b AS (
       |  SELECT source,
       |    CASE (rnk - 1) * 3 // n_src WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
       |      ELSE 'tail' END AS bucket,
       |    n_tokens, mean_score_micro
       |  FROM j
       |)
       |SELECT source, bucket, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  min(mean_score_micro) AS min_score_micro,
       |  max(mean_score_micro) AS max_score_micro
       |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The keyword→topic taxonomy for [[qTopicTags]] — the tiny curated
    * dimension every taxonomy tagger ships (FlashText/Aho-Corasick over a
    * keyword list); broadcast by construction. Shared verbatim with the
    * oracle so the engines cannot drift.
    */
  val TopicKeywords: Seq[(String, String)] = Seq(
    "join" -> "relational", "merge" -> "relational", "group" -> "relational",
    "agg" -> "relational", "filter" -> "relational", "sort" -> "relational",
    "scan" -> "storage", "column" -> "storage", "table" -> "storage",
    "row" -> "storage", "key" -> "storage", "part" -> "storage",
    "hash" -> "storage",
    "stream" -> "streaming", "batch" -> "streaming", "window" -> "streaming",
    "query" -> "search", "vector" -> "search")

  /** KEYWORD-TAXONOMY TOPIC TAGGING: tag every document with its dominant
    * topic — the topic whose keywords it mentions most (ties to the
    * lexicographically smallest topic), against the curated
    * [[TopicKeywords]] taxonomy — and report each source's topic mixture
    * in exact basis points. This is the domain-classification step a
    * training pipeline runs before domain mixing (DoReMi weights, topic
    * quotas): cheap, transparent, and auditable, where a learned
    * classifier is none of those.
    *
    * Scale: one token explode joined against the BROADCAST taxonomy
    * (tiny by construction), one (doc, topic) count, one per-doc argmax
    * as a hash aggregate (`min(struct(-c, topic))` — the
    * [[Graph.labelPropagation]] discipline, no window sort), one mixture
    * aggregate with a per-source window over ≤ |topics| rows. Documents
    * mentioning no keyword are untagged and excluded; `share_bp` is of
    * TAGGED documents.
    */
  /** Per-document dominant topic against [[TopicKeywords]] — the shared
    * core of [[qTopicTags]] and [[qMixReweight]]. Untagged documents (no
    * keyword hit) are absent.
    */
  private[ops] def dominantTopics(spark: SparkSession, dir: String): DataFrame =
    dominantTopicsOf(table(spark, dir, "documents"))

  /** [[dominantTopics]] over an arbitrary (doc_id, source, text) relation —
    * the form the arrival-time monitors ([[graft.streaming.TopicDriftStream]],
    * [[qTopicDrift]]'s split sides) feed.
    */
  private[graft] def dominantTopicsOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val kw = TopicKeywords.toDF("w", "topic")
    docs
      .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("w"))
      .join(broadcast(kw), Seq("w"))
      .groupBy(col("doc_id"), col("source"), col("topic"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("source"))
      .agg(min(struct((-col("c")).as("negc"), col("topic"))).as("m"))
      .select(col("doc_id"), col("source"), col("m.topic").as("topic"))
  }

  /** Per-(source, topic) share of TAGGED documents in basis points — the
    * mixture table both [[qTopicTags]] and the drift monitor read.
    */
  private[graft] def topicMixtureOf(docs: DataFrame): DataFrame =
    dominantTopicsOf(docs)
      .groupBy(col("source"), col("topic"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("n_src",
        sum(col("n_docs")).over(Window.partitionBy(col("source"))))
      .select(col("source"), col("topic"), col("n_docs"),
        expr("n_docs * 10000 DIV n_src").as("share_bp"))

  /** TOPIC-MIXTURE DRIFT between the standing corpus (doc_id ≢ 0 mod 5 —
    * the suite's corpus/arrival convention) and the arrival split: per
    * source, the L1 distance between the two dominant-topic mixtures in
    * exact basis points, `Σ_topics |share_corpus − share_arrivals|`. This
    * is the distribution-shift alarm a curation pipeline keeps on every
    * ingest source — a crawler that silently changed its seed list shows
    * up here before it shows up in eval — the taxonomy-level sibling of
    * [[qSourceDrift]]'s token-level divergence. Topics absent on one side
    * count their full share (a NEW topic is maximal drift for that cell).
    *
    * Scale: two broadcast-taxonomy tag passes + a |sources|·|topics|-
    * bounded full-outer join; the streaming dual
    * ([[graft.streaming.TopicDriftStream]]) re-measures per commit over
    * the accumulated arrivals.
    */
  def qTopicDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    topicDriftOf(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(5)) === 0))
  }

  /** The drift table for any (corpus, arrivals) pair of document
    * relations: (source, n_topics, drift_bp) sorted by source.
    */
  private[graft] def topicDriftOf(corpus: DataFrame, arrivals: DataFrame): DataFrame = {
    val c = topicMixtureOf(corpus)
      .select(col("source"), col("topic"), col("share_bp").as("c_bp"))
    val a = topicMixtureOf(arrivals)
      .select(col("source"), col("topic"), col("share_bp").as("a_bp"))
    c.join(a, Seq("source", "topic"), "full_outer")
      .select(col("source"), col("topic"),
        coalesce(col("c_bp"), lit(0L)).as("c_bp"),
        coalesce(col("a_bp"), lit(0L)).as("a_bp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_topics"),
        sum(expr("abs(c_bp - a_bp)")).as("drift_bp"))
      .orderBy(col("source"))
  }

  val qTopicDriftSql: String = {
    def side(alias: String, pred: String): String =
      s"""${alias}_agg AS (
         |  SELECT source, topic, count(*) AS n_docs FROM dom
         |  WHERE doc_id $pred GROUP BY 1, 2
         |), $alias AS (
         |  SELECT source, topic,
         |    CAST(n_docs * 10000 // (sum(n_docs) OVER (PARTITION BY source))
         |      AS BIGINT) AS bp
         |  FROM ${alias}_agg
         |)""".stripMargin
    s"""WITH ${topicDomCtes(withDocId = true)},
       |${side("cmix", "% 5 <> 0")},
       |${side("amix", "% 5 = 0")}
       |SELECT source, CAST(count(*) AS BIGINT) AS n_topics,
       |  CAST(sum(abs(coalesce(c.bp, 0) - coalesce(a.bp, 0))) AS BIGINT)
       |    AS drift_bp
       |FROM cmix c FULL OUTER JOIN amix a USING (source, topic)
       |GROUP BY source ORDER BY source""".stripMargin
  }

  def qTopicTags(spark: SparkSession, dir: String): DataFrame =
    topicMixtureOf(table(spark, dir, "documents"))
      .orderBy(col("source"), col("topic"))

  /** The shared dominant-topic CTE chain (`kw`, `tok`, `hits`, `dom`) of
    * the [[qTopicTags]], [[qMixReweight]] and [[qTopicDrift]] oracles;
    * `withDocId` keeps doc_id in `dom` for split-filtered consumers.
    */
  private def topicDomCtes(withDocId: Boolean = false): String = {
    val vals = TopicKeywords
      .map { case (w, t) => s"('$w', '$t')" }.mkString(", ")
    val docId = if (withDocId) "doc_id, " else ""
    s"""kw(w, topic) AS (
       |  SELECT * FROM (VALUES $vals) v(w, topic)
       |), tok AS (
       |  SELECT doc_id, source,
       |    unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
       |  FROM documents
       |), hits AS (
       |  SELECT doc_id, source, topic, count(*) AS c
       |  FROM tok JOIN kw USING (w) GROUP BY 1, 2, 3
       |), dom AS (
       |  SELECT ${docId}source, topic FROM (
       |    SELECT doc_id, source, topic,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, topic) AS rn
       |    FROM hits) WHERE rn = 1
       |)""".stripMargin
  }

  val qTopicTagsSql: String =
    s"""WITH ${topicDomCtes()}, agg AS (
       |  SELECT source, topic, count(*) AS n_docs FROM dom GROUP BY 1, 2
       |)
       |SELECT source, topic, n_docs,
       |  CAST(n_docs * 10000 // (sum(n_docs) OVER (PARTITION BY source)) AS BIGINT)
       |    AS share_bp
       |FROM agg ORDER BY source, topic""".stripMargin

  /** TARGET-MIXTURE REWEIGHTING: per (source, topic) cell, the importance
    * weight that makes each source's TAGGED documents sample to a UNIFORM
    * topic mixture — `weight_micro = n_src · 10⁶ DIV (n_topics_src ·
    * n_cell)`, the inverse-frequency weight against the per-source uniform
    * target over the topics that source actually contains. This is the
    * domain-rebalancing step downstream of topic tagging (the per-topic
    * dual of [[Corpus]]'s per-source DoReMi / temperature weights): a
    * sampler drawing each document with probability ∝ its cell weight
    * expects equal mass per topic within every source. Exact integer
    * micro-units end-to-end.
    *
    * Scale: rides [[dominantTopics]] (broadcast taxonomy + two hash
    * aggregates); the weight arithmetic is one per-source window over
    * ≤ |topics| rows.
    */
  def qMixReweight(spark: SparkSession, dir: String): DataFrame = {
    val srcW = Window.partitionBy(col("source"))
    dominantTopics(spark, dir)
      .groupBy(col("source"), col("topic"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("n_src", sum(col("n_docs")).over(srcW))
      .withColumn("n_topics_src", count(lit(1)).over(srcW))
      .select(col("source"), col("topic"), col("n_docs"),
        expr("n_src * 1000000 DIV (n_topics_src * n_docs)").as("weight_micro"))
      .orderBy(col("source"), col("topic"))
  }

  val qMixReweightSql: String =
    s"""WITH ${topicDomCtes()}, agg AS (
       |  SELECT source, topic, count(*) AS n_docs FROM dom GROUP BY 1, 2
       |)
       |SELECT source, topic, n_docs,
       |  CAST(sum(n_docs) OVER (PARTITION BY source) * 1000000
       |    // (count(*) OVER (PARTITION BY source) * n_docs) AS BIGINT)
       |    AS weight_micro
       |FROM agg ORDER BY source, topic""".stripMargin

  /** Vocabulary size for [[qVocabOov]] (top-K tokens by corpus count). */
  val VocabK = 10

  /** Vocabulary coverage: build the top-[[VocabK]] token vocabulary
    * (count desc, token asc — fully deterministic), then per-document
    * token count, out-of-vocabulary count, and OOV rate. The
    * vocab-build + coverage-filter pair is the tokenizer-prep op of a
    * training pipeline (docs with high OOV against a fixed vocab get
    * routed or re-tokenized). The vocabulary is a broadcast relation;
    * one explode+aggregate per doc otherwise.
    */
  def qVocabOov(spark: SparkSession, dir: String): DataFrame = {
    val tok = table(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(VocabK)
      .select(col("w"), lit(1).as("inv"))
    tok.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        coalesce(sum(when(col("inv").isNull, 1L).otherwise(0L)), lit(0L)).as("oov"))
      .select(col("doc_id"), col("n_tokens"), col("oov"),
        round(col("oov").cast(DoubleType) / col("n_tokens").cast(DoubleType), 6)
          .as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  val qVocabOovSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w FROM documents
       |), vocab AS (
       |  SELECT w FROM (
       |    SELECT w, count(*) AS cnt FROM tok GROUP BY 1
       |    ORDER BY cnt DESC, w LIMIT $VocabK)
       |)
       |SELECT doc_id,
       |  count(*) AS n_tokens,
       |  CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov,
       |  round(CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |        / CAST(count(*) AS DOUBLE), 6) AS oov_rate
       |FROM tok LEFT JOIN vocab ON tok.w = vocab.w
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** Sparse TF-IDF similarity join: top-20 most similar document pairs
    * by inverted-index dot product over word-trigram shingles — the
    * classic IR retrieval join (weighted sparse vectors via a posting
    * join), complementing the dense-vector paths in [[VectorSearch]]
    * and the set-based Jaccard join in [[TextDedup]].
    *
    * Weights are exact longs (`tf · (N·1000 DIV df)`) so the pair scores
    * are order-independent integer sums. Postings are pruned to
    * 2 ≤ df ≤ hi: df=1 terms can't contribute to any pair, and the
    * upper cut is the standard stop-posting cut that bounds per-term
    * pair fanout at df² — the skew guard that keeps the self-join
    * sub-quadratic. `hi` is DERIVED from the corpus's own df
    * distribution — `max(100, 20 × mean df)` in exact integer
    * arithmetic, mirrored term-for-term in the oracle — not a blind
    * constant: a denser corpus raises its posting budget
    * proportionally instead of losing recall, while extreme
    * stop-grams (> 20× the mean document frequency, the
    * non-discriminative head of any heavy-tailed df distribution)
    * are still cut before they readmit quadratic postings. On this
    * corpus measured df ≤ 25 at every scale, so the floor of 100
    * binds and results are unchanged.
    */
  def qSparseSimJoin(spark: SparkSession, dir: String): DataFrame = {
    val grams = table(spark, dir, "documents")
      .withColumn("t", tokens(col("text")))
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), size(col("t")) - 3),
          i => concat_ws(" ", slice(col("t"), i + 1, lit(3))))).as("w"))
    // tf feeds three consumers (df, N, postings) — materialize it once
    // instead of re-running the shingle explode per consumer
    val tf = grams.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfr = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct(col("doc_id")).as("n"))
    // data-derived stop-posting cut: one vocab-sized scalar aggregate,
    // broadcast as a 1-row bound (the Corpus quantile-trim discipline)
    val band = dfr.agg(
      greatest(lit(100L), expr("(sum(df) * 20) DIV count(1)")).as("hi"))
    // Materialized ONCE (round 17): the pruned-weighted posting relation
    // feeds BOTH sides of the pair self-join, and left live each side
    // re-ran the df attach and its own copy of the band/N broadcast
    // builds (guide §7.2 duplicated subtrees — the before-plan carried
    // every broadcast subtree twice and scanned the tf cache six times).
    // The checkpointed leaf is what the self-join shuffles, so the pair
    // stage reads one materialized relation from both sides.
    val post = tf.join(dfr, "w")
      .crossJoin(broadcast(band))
      .filter(col("df") >= 2 && col("df") <= col("hi"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("w"),
        (col("tf") * expr("(n * 1000) DIV df")).as("wt"))
      .localCheckpoint()
    tf.unpersist(blocking = false)
    val top = post.toDF("d1", "w", "w1")
      .join(post.toDF("d2", "w", "w2"), Seq("w"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(sum(col("w1") * col("w2")).as("score"))
      .orderBy(col("score").desc, col("d1"), col("d2"))
      .limit(20)
    // Returned with the pair join LIVE: the caller still gets the
    // inspectable equi-join plan — PlanShapeSpec certifies the shape on
    // it — and pays the pair stage once at its own sink. The posting
    // checkpoint blocks are released by the harness unpersist-all after
    // materialization (Bench/Verify between queries; CacheHygieneSpec
    // pins the contract).
    top
  }

  val qSparseSimJoinSql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ts FROM documents
      |), grams AS (
      |  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS w
      |  FROM tok, unnest(generate_series(1, len(ts) - 2)) AS g(i)
      |), tf AS (
      |  SELECT doc_id, w, count(*) AS tf FROM grams GROUP BY 1, 2
      |), dfr AS (
      |  SELECT w, count(*) AS df FROM tf GROUP BY 1
      |), n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
      |band AS (
      |  SELECT greatest(100, (sum(df) * 20) // count(*)) AS hi FROM dfr
      |), post AS (
      |  SELECT tf.doc_id, tf.w, tf.tf * ((n.n * 1000) // dfr.df) AS wt
      |  FROM tf JOIN dfr USING (w) CROSS JOIN n CROSS JOIN band
      |  WHERE dfr.df >= 2 AND dfr.df <= band.hi
      |)
      |SELECT a.doc_id AS d1, b.doc_id AS d2,
      |  CAST(sum(a.wt * b.wt) AS BIGINT) AS score
      |FROM post a JOIN post b ON a.w = b.w AND a.doc_id < b.doc_id
      |GROUP BY 1, 2
      |ORDER BY score DESC, d1, d2 LIMIT 20""".stripMargin

  /** Per-document n-gram novelty: the fraction of a doc's distinct word
    * 3-shingles whose FIRST corpus occurrence (min doc_id over the whole
    * corpus) is the doc itself — the marginal-new-content curve a corpus
    * curator watches while ingesting (novelty collapsing toward zero means
    * the new source is re-treading existing data; the dedup-adjacent
    * diagnostic that needs no pairwise comparison at all).
    *
    * Exact integers end-to-end: counts are longs and the basis-point ratio
    * is one integer division, so the result is hash-gated. Shares
    * [[TextDedup.shingles]] (and its oracle formulation) verbatim with the
    * dedup/contamination pack.
    *
    * Scale: the shingle index is built once (cached — two consumers) and
    * every aggregate is map-side-combined: min per shingle (shuffle on
    * shingle), then two doc-keyed counts. Nothing pairwise, nothing
    * collected; ultra-common shingles cost one combiner cell each, so the
    * hot-shingle skew that forces df-bands in the similarity join is
    * harmless here.
    */
  def qNgramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sh = TextDedup.shingles(
      table(spark, dir, "documents"), col("doc_id"), col("text"), Dedup.ShingleK)
    val firstDoc = sh.groupBy(col("s")).agg(min(col("id")).as("first_doc"))
    val nNew = firstDoc.groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_new"))
    val nTot = sh.groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    nTot.join(nNew, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        expr("coalesce(n_new, CAST(0 AS BIGINT)) * 10000 DIV n_shingles")
          .as("novelty_bp"))
      .orderBy(col("doc_id"))
  }

  val qNgramNoveltySql: String = {
    val k = Dedup.ShingleK
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(len(t) - ${k - 1}),
       |    i -> array_to_string(t[i+1:i+$k], ' ')))) AS s
       |  FROM tok WHERE len(t) >= $k
       |), first AS (
       |  SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY 1
       |), n_new AS (
       |  SELECT first_doc AS doc_id, count(*) AS n_new FROM first GROUP BY 1
       |), n_tot AS (
       |  SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1
       |)
       |SELECT t.doc_id, t.n_shingles, coalesce(n.n_new, 0) AS n_new,
       |  (coalesce(n.n_new, 0) * 10000) // t.n_shingles AS novelty_bp
       |FROM n_tot t LEFT JOIN n_new n ON n.doc_id = t.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  /** Token-distribution drift between the corpus's two largest sources:
    * top-20 tokens by cross-product divergence `|c_a·N_b − c_b·N_a|` —
    * the exact-integer L1-style drift statistic (zero iff the token's
    * relative frequency is identical in both sources; the log-free stand-in
    * for KL/chi-square, same discipline as the lift-ranked collocations).
    * The source-mix monitoring dual of [[Corpus.qSampleTemperature]]:
    * temperature sampling rebalances source SIZES, this detects when two
    * sources' CONTENT distributions diverge.
    *
    * The two largest sources are data-derived in-plan (row_number over the
    * source-dimension totals — a ~|sources|-row single-partition window,
    * control-plane-sized) and broadcast as 1-row relations into the
    * per-source count filters. At test scale the products fit comfortably
    * in longs; at 100 TB token counts can reach 10^12, so the product
    * column upgrades to decimal(38,0) — same exact-arithmetic contract.
    *
    * Scale: one corpus scan into a map-side-combined (source, token)
    * count; everything downstream is vocabulary-sized (the full-outer
    * token alignment shuffles on token) or dimension-sized.
    */
  def qSourceDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = table(spark, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = c.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val top2 = tot.withColumn("rn",
      row_number().over(Window.orderBy(col("n").desc, col("source"))))
      .filter(col("rn") <= 2)
    val a = top2.filter(col("rn") === 1)
      .select(col("source").as("src_a"), col("n").as("na"))
    val b = top2.filter(col("rn") === 2)
      .select(col("source").as("src_b"), col("n").as("nb"))
    val ca = c.join(broadcast(a), col("source") === col("src_a"))
      .select(col("w").as("wa"), col("c").as("ca"))
    val cb = c.join(broadcast(b), col("source") === col("src_b"))
      .select(col("w").as("wb"), col("c").as("cb"))
    ca.join(cb, col("wa") === col("wb"), "full_outer")
      .select(coalesce(col("wa"), col("wb")).as("token"),
        coalesce(col("ca"), lit(0L)).as("n_a"),
        coalesce(col("cb"), lit(0L)).as("n_b"))
      .crossJoin(broadcast(a))
      .crossJoin(broadcast(b))
      .select(col("src_a"), col("src_b"), col("token"), col("n_a"), col("n_b"),
        abs(col("n_a") * col("nb") - col("n_b") * col("na")).as("drift"))
      .orderBy(col("drift").desc, col("token"))
      .limit(20)
  }

  val qSourceDriftSql: String =
    s"""WITH tok AS (
       |  SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
       |  FROM documents
       |), c AS (
       |  SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2
       |), tot AS (
       |  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1
       |), t2 AS (
       |  SELECT source, n, row_number() OVER (ORDER BY n DESC, source) AS rn FROM tot
       |), a AS (SELECT source AS src_a, n AS na FROM t2 WHERE rn = 1),
       |b AS (SELECT source AS src_b, n AS nb FROM t2 WHERE rn = 2),
       |ca AS (SELECT c.w, c.c FROM c JOIN a ON c.source = a.src_a),
       |cb AS (SELECT c.w, c.c FROM c JOIN b ON c.source = b.src_b),
       |m AS (
       |  SELECT coalesce(ca.w, cb.w) AS token,
       |    coalesce(ca.c, 0) AS n_a, coalesce(cb.c, 0) AS n_b
       |  FROM ca FULL JOIN cb ON ca.w = cb.w
       |)
       |SELECT a.src_a, b.src_b, m.token, m.n_a, m.n_b,
       |  abs(m.n_a * b.nb - m.n_b * a.na) AS drift
       |FROM m CROSS JOIN a CROSS JOIN b
       |ORDER BY drift DESC, token LIMIT 20""".stripMargin

  /** Per-source shingle redundancy: total 3-shingle OCCURRENCES vs
    * distinct shingles, and the redundant mass in basis points — which
    * sources are internally repetitive (boilerplate, templated pages)
    * before any pairwise dedup runs. The corpus-level complement of
    * [[qTextRepetition]]'s within-document fractions and
    * [[qNgramNovelty]]'s per-document first-occurrence curve: novelty
    * asks "is this doc new vs the corpus", redundancy asks "how much of
    * this source is self-repetition".
    *
    * Exact integers only (two counts, one integer division). Scale: one
    * corpus scan exploding the NON-distinct shingle stream into a
    * (source, shingle)-keyed partial-distinct aggregate — Spark plans
    * count + count(DISTINCT) per group as the standard two-phase expand
    * with map-side partials; nothing pairwise, nothing collected.
    */
  def qSourceRedundancy(spark: SparkSession, dir: String): DataFrame = {
    val k = Dedup.ShingleK
    val occ = table(spark, dir, "documents")
      .withColumn("t", tokens(col("text")))
      .filter(size(col("t")) >= k)
      .select(col("source"),
        explode(transform(
          sequence(lit(0), size(col("t")) - k),
          i => concat_ws(" ", slice(col("t"), i + 1, lit(k))))).as("s"))
    occ.groupBy(col("source"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("s")).as("n_distinct"))
      .select(col("source"), col("n_occ"), col("n_distinct"),
        expr("(n_occ - n_distinct) * 10000 DIV n_occ").as("redundancy_bp"))
      .orderBy(col("source"))
  }

  val qSourceRedundancySql: String = {
    val k = Dedup.ShingleK
    s"""WITH tok AS (
       |  SELECT source, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
       |), occ AS (
       |  SELECT source, unnest(list_transform(
       |    range(len(t) - ${k - 1}),
       |    i -> array_to_string(t[i+1:i+$k], ' '))) AS s
       |  FROM tok WHERE len(t) >= $k
       |)
       |SELECT source, count(*) AS n_occ, count(DISTINCT s) AS n_distinct,
       |  ((count(*) - count(DISTINCT s)) * 10000) // count(*) AS redundancy_bp
       |FROM occ GROUP BY source ORDER BY source""".stripMargin
  }

  /** Per-source token diversity as the INVERSE SIMPSON index — the
    * "effective vocabulary size" `N²/Σc²` (= N/expected-collision-count;
    * equals the vocabulary size iff tokens are uniform, collapses toward
    * 1 as one token dominates). The log-free diversity stand-in for
    * Shannon entropy, same discipline as the lift-ranked collocations:
    * both moments are exact long sums, and the index is ONE division of
    * exact integers rounded to 6 dp — bit-identical across engines where
    * an entropy's Σp·log p never is.
    *
    * Scale: one scan into a map-side-combined (source, token) count, then
    * a source-keyed second moment — both aggregates partial. N² reaches
    * 10^24 at trillion-token sources: upgrade the moment columns to
    * decimal(38,0) there, same contract.
    */
  def qSourceDiversity(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"), sum(col("c") * col("c")).as("sum_sq"))
      .select(col("source"), col("n_tokens"), col("sum_sq"),
        round((col("n_tokens") * col("n_tokens")).cast("double")
          / col("sum_sq").cast("double"), 6).as("inv_simpson"))
      .orderBy(col("source"))

  val qSourceDiversitySql: String =
    """WITH c AS (
      |  SELECT source, w, count(*) AS c FROM (
      |    SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
      |    FROM documents) t
      |  GROUP BY 1, 2
      |), m AS (
      |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(sum(c * c) AS BIGINT) AS sum_sq
      |  FROM c GROUP BY 1
      |)
      |SELECT source, n_tokens, sum_sq,
      |  round(CAST(n_tokens * n_tokens AS DOUBLE) / CAST(sum_sq AS DOUBLE), 6)
      |    AS inv_simpson
      |FROM m ORDER BY source""".stripMargin

  /** Shingle width for the boilerplate detector [[qDupNgrams]]. */
  val DupNgramK = 5

  /** Cross-document boilerplate detector: top-20 5-gram shingles by
    * document frequency (df ≥ 2) — the repeated header/footer/license
    * phrases that exact- and near-dup passes miss because the documents
    * CARRYING them differ. Shingles are deduped per doc first so one
    * spammy document can't promote its own repetition into "boilerplate";
    * ranking is (df desc, gram asc) — exact integers, total order.
    *
    * Scale: explode → two-level aggregate with map-side partial combine,
    * top-20 via TakeOrderedAndProject — no all-pairs, no window over the
    * full gram relation; the df ≥ 2 filter drops the hapax tail (the vast
    * majority of grams) before the ordering.
    */
  def qDupNgrams(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= DupNgramK)
      .select(col("doc_id"), explode(shingleSet(col("t"), DupNgramK)).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("first_doc"))
      .filter(col("df") >= 2)
      .orderBy(col("df").desc, col("g"))
      .limit(20)

  val qDupNgramsSql: String = {
    val k = DupNgramK
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(len(t) - ${k - 1}),
       |    i -> array_to_string(t[i+1:i+$k], ' ')))) AS g
       |  FROM tok WHERE len(t) >= $k
       |)
       |SELECT g, count(*) AS df, min(doc_id) AS first_doc
       |FROM sh GROUP BY 1 HAVING count(*) >= 2
       |ORDER BY df DESC, g LIMIT 20""".stripMargin
  }

  /** Per-document readability profile: token, sentence, and vowel-group
    * counts plus the two classic readability ratios (words/sentence,
    * vowel-groups/word — the syllable proxy) in exact basis points —
    * the integer skeleton of Flesch-style scoring without the
    * engine-divergent float constants. Sentences are `[.!?]+` runs;
    * documents with no terminator count as one sentence.
    *
    * Scale: a pure per-row projection (three regexp passes fused in one
    * codegen stage), no shuffle until the presentation sort.
    */
  def qReadability(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val nTok = size(tokens(col("text"))).cast("long")
    val nSent = greatest(
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"), lit(1L))
    val nVow = size(regexp_extract_all(lower(col("text")), lit("[aeiou]+"), lit(0))).cast("long")
    docs.select(col("doc_id"),
        nTok.as("n_tokens"), nSent.as("n_sentences"), nVow.as("n_vowel_groups"))
      .withColumn("words_per_sentence_bp", expr("n_tokens * 10000 DIV n_sentences"))
      .withColumn("syllables_per_word_bp",
        expr("CASE WHEN n_tokens = 0 THEN 0 ELSE n_vowel_groups * 10000 DIV n_tokens END"))
      .orderBy(col("doc_id"))
  }

  val qReadabilitySql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT) AS n_tokens,
      |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS n_sentences,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS n_vowel_groups
      |  FROM documents
      |)
      |SELECT doc_id, n_tokens, n_sentences, n_vowel_groups,
      |  (n_tokens * 10000) // n_sentences AS words_per_sentence_bp,
      |  CASE WHEN n_tokens = 0 THEN 0
      |       ELSE (n_vowel_groups * 10000) // n_tokens END AS syllables_per_word_bp
      |FROM m ORDER BY doc_id""".stripMargin

  /** Per-source Pearson correlation between document length (tokens) and
    * lexical diversity (distinct tokens) — "do longer documents in this
    * source actually add vocabulary, or just repeat?" (a source whose long
    * documents are repetitive scores near zero and is a dedup/quality
    * candidate). All six moments (n, Σx, Σy, Σx², Σy², Σxy) are exact
    * longs; r is ONE final float expression over identical integers in
    * both engines (correctly-rounded sqrt/mul/div), rounded to 6 — the
    * same determinism contract as the cosine scores.
    *
    * Scale: one scan, map-side-combined moment aggregation, |sources|-row
    * output. Moment magnitudes are Σxy ≤ n·L² for per-doc token count L —
    * longs hold to ~10^9 docs/source at L=10^4; lift to DECIMAL(38,0)
    * beyond.
    */
  def qLengthCorr(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("source"),
        size(tokens(col("text"))).cast("long").as("x"),
        size(array_distinct(tokens(col("text")))).cast("long").as("y"))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("source"), col("n").as("n_docs"),
        // degenerate (zero-variance) sources yield NULL, not NaN — a
        // single-doc or constant-length source has no defined correlation
        when((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
            (col("n") * col("syy") - col("sy") * col("sy")) > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6))
          .as("len_div_corr"))
      .orderBy(col("source"))
  }

  val qLengthCorrSql: String =
    """WITH m AS (
      |  SELECT source,
      |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT) AS x,
      |    CAST(len(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS BIGINT) AS y
      |  FROM documents
      |), agg AS (
      |  SELECT source, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM m GROUP BY 1
      |)
      |SELECT source, n AS n_docs,
      |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      |    THEN round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |       sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
      |    ELSE NULL END AS len_div_corr
      |FROM agg ORDER BY source""".stripMargin

  /** Per-document "stutter" score: how many adjacent token positions
    * repeat the previous token (`t_i = t_{i+1}`), in count and exact basis
    * points — the degenerate-generation / copy-paste-loop signal that
    * word-frequency repetition fractions miss (a doc can stutter badly
    * while its global top-word fraction stays modest). Pure array
    * arithmetic: one `filter(range)` comparison pass per row, no explode,
    * no shuffle before the presentation sort.
    */
  def qTextStutter(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
    docs
      .select(col("doc_id"), (size(col("t")) - 1).cast("long").as("n_adjacent"),
        // guarded: sequence(1, 0) would DESCEND for single-token docs and
        // index out of range under ANSI — such docs are filtered out below
        when(size(col("t")) >= 2,
          size(filter(sequence(lit(1), size(col("t")) - 1),
            i => element_at(col("t"), i) === element_at(col("t"), i + 1))))
          .otherwise(0).cast("long").as("n_stutter"))
      .filter(col("n_adjacent") >= 1)
      .select(col("doc_id"), col("n_adjacent"), col("n_stutter"),
        expr("n_stutter * 10000 DIV n_adjacent").as("stutter_bp"))
      .orderBy(col("doc_id"))
  }

  val qTextStutterSql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents
      |), m AS (
      |  SELECT doc_id,
      |    CAST(len(t) - 1 AS BIGINT) AS n_adjacent,
      |    CAST(len(list_filter(range(1, len(t)), i -> t[i] = t[i + 1])) AS BIGINT)
      |      AS n_stutter
      |  FROM tok
      |)
      |SELECT doc_id, n_adjacent, n_stutter,
      |  (n_stutter * 10000) // n_adjacent AS stutter_bp
      |FROM m WHERE n_adjacent >= 1
      |ORDER BY doc_id""".stripMargin

  /** Language-ID CONFUSION MATRIX — the classifier-eval view of
    * [[qTextLangid]]: labeled lang × predicted lang with counts and
    * row-normalized shares in exact basis points. The heuristic has no
    * zh stopword list, so the zh row concentrates under 'und' — exactly
    * the blind spot the matrix exists to surface before anyone trusts
    * per-language corpus budgets built on predicted labels.
    *
    * Scale: one pass to predict + a counts aggregate; the row-marginal
    * join touches only the (langs × preds)-sized matrix, broadcast.
    */
  def qLangConfusion(spark: SparkSession, dir: String): DataFrame = {
    val counts = table(spark, dir, "documents")
      .select(col("lang"), langPredC(tokens(col("text"))).as("pred"))
      .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n_docs"))
    counts
      .join(broadcast(counts.groupBy(col("lang")).agg(sum(col("n_docs")).as("n_lang"))),
        Seq("lang"))
      .select(col("lang"), col("pred"), col("n_docs"),
        expr("(n_docs * 10000) DIV n_lang").as("row_bp"))
      .orderBy(col("lang"), col("pred"))
  }

  val qLangConfusionSql: String = {
    val de = sqlStopCount(StopwordsDe)
    val en = sqlStopCount(StopwordsEn)
    val es = sqlStopCount(StopwordsEs)
    val fr = sqlStopCount(StopwordsFr)
    s"""WITH scored AS (
       |  SELECT lang, $de AS c_de, $en AS c_en, $es AS c_es, $fr AS c_fr
       |  FROM (SELECT lang, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents)
       |), p AS (
       |  SELECT lang, $langPredSql AS pred FROM scored
       |), c AS (
       |  SELECT lang, pred, CAST(count(*) AS BIGINT) AS n_docs FROM p GROUP BY 1, 2
       |), m AS (
       |  SELECT lang, CAST(sum(n_docs) AS BIGINT) AS n_lang FROM c GROUP BY 1
       |)
       |SELECT c.lang, c.pred, c.n_docs,
       |  CAST((c.n_docs * 10000) // m.n_lang AS BIGINT) AS row_bp
       |FROM c JOIN m USING (lang) ORDER BY lang, pred""".stripMargin
  }

  // RE2-safe (and Java-regex-identical) structured-PII patterns: no
  // backslash classes, no anchors — `[.]` instead of `\.` so the same
  // literal works quoted in both engines.
  private[graft] val PiiEmail = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
  private[graft] val PiiIpv4 = "[0-9]{1,3}([.][0-9]{1,3}){3}"
  private[graft] val PiiId = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  /** Match count of one PII pattern in a text column — the single
    * definition shared by the batch audit ([[qPiiAudit]]) and the
    * streaming arrival gate ([[graft.streaming.IngestDedup.piiGate]]),
    * so an edit to a pattern can never desynchronize the two.
    */
  private[graft] def piiMatchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Structured-PII scrubbing AUDIT — per-source counts of email /
    * IPv4 / SSN-shaped matches plus the share of documents flagged, the
    * report a release gate reads before a corpus ships. Match counting
    * is `size(regexp_extract_all(...))` per pattern — all three patterns
    * evaluate in the SAME projection, one corpus pass, map-side combined
    * into a sources-sized result. On the clean synthetic corpus every
    * count is zero — the gate pins the accounting; PiiAuditSpec plants
    * real PII and pins the patterns.
    */
  def qPiiAudit(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("source"),
        piiMatchCount(col("text"), PiiEmail).as("e"),
        piiMatchCount(col("text"), PiiIpv4).as("i"),
        piiMatchCount(col("text"), PiiId).as("s"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("e").cast(LongType)).as("n_emails"),
        sum(col("i").cast(LongType)).as("n_ipv4"),
        sum(col("s").cast(LongType)).as("n_ids"),
        sum(when(col("e") + col("i") + col("s") > 0, 1L).otherwise(0L)).as("n_flagged"))
      .withColumn("flagged_bp", expr("(n_flagged * 10000) DIV n_docs"))
      .orderBy(col("source"))

  val qPiiAuditSql: String =
    s"""WITH d AS (
       |  SELECT source,
       |    len(regexp_extract_all(text, '$PiiEmail')) AS e,
       |    len(regexp_extract_all(text, '$PiiIpv4')) AS i,
       |    len(regexp_extract_all(text, '$PiiId')) AS s
       |  FROM documents
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(e) AS BIGINT) AS n_emails,
       |  CAST(sum(i) AS BIGINT) AS n_ipv4,
       |  CAST(sum(s) AS BIGINT) AS n_ids,
       |  CAST(sum(CASE WHEN e + i + s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |  CAST((CAST(sum(CASE WHEN e + i + s > 0 THEN 1 ELSE 0 END) AS BIGINT) * 10000)
       |    // count(*) AS BIGINT) AS flagged_bp
       |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** Ladder of vocabulary sizes probed by [[qVocabCoverage]]. */
  val CoverageLadder = Seq(5, 10, 20, 50, 100)

  /** VOCABULARY COVERAGE CURVE — the tokenizer-budget planning view:
    * for each candidate vocabulary size k, the share of all corpus token
    * positions covered by the top-k types (count-desc, token-asc). This
    * is the curve that decides how large a vocab (or how aggressive a
    * BPE merge budget) a corpus needs before OOV flatlines.
    *
    * Scale: the corpus collapses once to the type-count relation; its
    * ranking uses [[Rank.globalRank]]'s range-partitioned two-pass (a
    * web-scale vocabulary is billions of types — no single-reducer
    * window); the ladder expansion and coverage sums then touch only
    * ladder × vocab rows, with the 1-row total broadcast.
    */
  def qVocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val counts = table(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val ranked = Rank.globalRank(counts, Seq(col("cnt").desc, col("tok")), 8)
    val ladder = CoverageLadder.map(k => lit(k.toLong))
    ranked
      .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("total"))))
      .select(explode(array(ladder: _*)).as("k"), col("cnt"), col("total"), col("rnk"))
      .filter(col("rnk") <= col("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_types"), sum(col("cnt")).as("covered_tokens"),
        max(col("total")).as("total"))
      .select(col("k"), col("n_types"), col("covered_tokens"),
        expr("(covered_tokens * 10000) DIV total").as("coverage_bp"))
      .orderBy(col("k"))
  }

  val qVocabCoverageSql: String =
    s"""WITH c AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok FROM documents)
       |  GROUP BY tok
       |), r AS (
       |  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rnk FROM c
       |), t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
       |SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_types,
       |  CAST(sum(cnt) AS BIGINT) AS covered_tokens,
       |  CAST((CAST(sum(cnt) AS BIGINT) * 10000) // max(total) AS BIGINT) AS coverage_bp
       |FROM r CROSS JOIN t CROSS JOIN (SELECT unnest([${CoverageLadder.mkString(", ")}]) AS k) ks
       |WHERE rnk <= k GROUP BY k ORDER BY k""".stripMargin

  /** Token length of the anchored prefix [[qTemplatePrefixes]] groups by.
    * Library default would be ~5; the gate uses 2 because the synthetic
    * corpus draws from a ~40-word vocabulary (5-token prefixes are
    * unique there; real template intros repeat verbatim).
    */
  val PrefixLen = 2

  /** TEMPLATE-INTRO detection — documents sharing an identical opening
    * token sequence, the anchored complement of the position-free
    * boilerplate 5-gram scan ([[qDupNgrams]]): scraper templates and
    * form letters repeat their OPENING verbatim even when bodies
    * diverge. One projection to the prefix key + one count; top-20
    * groups by (n_docs desc, prefix asc).
    */
  def qTemplatePrefixes(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= PrefixLen)
      .select(concat_ws(" ", slice(col("t"), 1, PrefixLen)).as("prefix"))
      .groupBy(col("prefix")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("prefix")).limit(20)

  val qTemplatePrefixesSql: String =
    s"""WITH p AS (
       |  SELECT array_to_string(t[1:$PrefixLen], ' ') AS prefix
       |  FROM (SELECT regexp_split_to_array(lower(text), '\\s+') AS t FROM documents)
       |  WHERE len(t) >= $PrefixLen
       |)
       |SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs
       |FROM p GROUP BY prefix HAVING count(*) >= 2
       |ORDER BY n_docs DESC, prefix LIMIT 20""".stripMargin

  /** INTRA-document repetition profile (Rae et al. 2021, Gopher §A1.1 —
    * the standard LLM quality-filter family over WITHIN-doc repetition,
    * complementing [[qTextRepetition]]'s token-frequency fractions):
    * per document, the duplicate-LINE and duplicate-PARAGRAPH fractions
    * (by unit count and by character mass over ALL occurrences of a
    * repeated unit) and the top-2/3/4-gram character-mass shares — all in
    * exact basis points (`x · 10000 DIV y`), no floats.
    *
    * Deterministic top-gram convention: Gopher's "most frequent n-gram"
    * is tie-ambiguous across engines (equal-count grams of different
    * lengths), so the mass leader is defined as `max(count · len(gram))`
    * over the doc's n-grams — a total integer order, same filter intent.
    * Lines/paragraphs split the RAW text on `\n` / `\n\n`; grams ride the
    * suite's lowercase-whitespace tokens.
    *
    * Shape at 100 TB: the profile is a PURE ROW FUNCTION of the
    * document, so it is ONE narrow codegen projection
    * ([[graft.functions.RepetitionProfile]] — per-row state bounded by
    * the doc's own unit counts) over one corpus scan: zero shuffle,
    * zero joins, zero aggregates, embarrassingly parallel. (The first
    * formulation exploded every unit and paid a unit-level hash
    * aggregate — ~4× the token stream through a shuffle for a per-row
    * answer; it measured 15.5× on the first decade before this
    * rewrite.)
    */
  def qDocRepetition(spark: SparkSession, dir: String): DataFrame =
    docRepetitionProfile(spark, dir).orderBy(col("doc_id"))

  private def docRepetitionProfile(spark: SparkSession, dir: String): DataFrame =
    docRepetitionProfileOf(table(spark, dir, "documents"))

  /** The profile projection over any documents-shaped relation — shared
    * by the batch queries and the streaming repetition gate
    * ([[graft.streaming.RepetitionGateStream]]) so the column layout of
    * the expression's bp vector is unpacked in exactly one place.
    */
  private[graft] def docRepetitionProfileOf(docs: DataFrame): DataFrame = {
    val names = Seq("dup_line_bp", "dup_line_char_bp", "dup_para_bp",
      "dup_para_char_bp", "top2_bp", "top3_bp", "top4_bp")
    docs.select(col("doc_id") +:
      names.zipWithIndex.map { case (n, i) =>
        element_at(graft.functions.RepetitionProfile(col("text")), i + 1).as(n)
      }: _*)
  }

  private[ops] def docRepetitionProfileSql(withOrder: Boolean,
      where: String = ""): String = {
    val order = if (withOrder) "\nORDER BY doc_id" else ""
    s"""WITH d AS (
       |  SELECT doc_id, length(text) AS n_chars,
       |    regexp_split_to_array(lower(text), '\\s+') AS t, text
       |  FROM documents $where
       |), units AS (
       |  SELECT doc_id, n_chars, 'line' AS kind, unnest(str_split(text, chr(10))) AS u FROM d
       |  UNION ALL
       |  SELECT doc_id, n_chars, 'para', unnest(str_split(text, chr(10)||chr(10))) FROM d
       |  UNION ALL
       |  SELECT doc_id, n_chars, 'g2', unnest(list_transform(range(len(t)-1), i -> array_to_string(t[i+1:i+2], ' '))) FROM d WHERE len(t) >= 2
       |  UNION ALL
       |  SELECT doc_id, n_chars, 'g3', unnest(list_transform(range(len(t)-2), i -> array_to_string(t[i+1:i+3], ' '))) FROM d WHERE len(t) >= 3
       |  UNION ALL
       |  SELECT doc_id, n_chars, 'g4', unnest(list_transform(range(len(t)-3), i -> array_to_string(t[i+1:i+4], ' '))) FROM d WHERE len(t) >= 4
       |), c AS (
       |  SELECT doc_id, n_chars, kind, u, count(*) AS c FROM units GROUP BY ALL
       |), k AS (
       |  SELECT doc_id, n_chars, kind, sum(c) AS n_units, count(*) AS n_distinct,
       |    sum(CASE WHEN c >= 2 THEN c * length(u) ELSE 0 END) AS dup_chars,
       |    sum(c * length(u)) AS tot_chars,
       |    max(c * length(u)) AS top_mass
       |  FROM c GROUP BY 1, 2, 3
       |)
       |SELECT doc_id,
       |  CAST(coalesce(max(CASE WHEN kind = 'line' THEN (n_units - n_distinct) * 10000 // n_units END), 0) AS BIGINT) AS dup_line_bp,
       |  CAST(coalesce(max(CASE WHEN kind = 'line' AND tot_chars > 0 THEN dup_chars * 10000 // tot_chars END), 0) AS BIGINT) AS dup_line_char_bp,
       |  CAST(coalesce(max(CASE WHEN kind = 'para' THEN (n_units - n_distinct) * 10000 // n_units END), 0) AS BIGINT) AS dup_para_bp,
       |  CAST(coalesce(max(CASE WHEN kind = 'para' AND tot_chars > 0 THEN dup_chars * 10000 // tot_chars END), 0) AS BIGINT) AS dup_para_char_bp,
       |  CAST(coalesce(max(CASE WHEN kind = 'g2' AND n_chars > 0 THEN top_mass * 10000 // n_chars END), 0) AS BIGINT) AS top2_bp,
       |  CAST(coalesce(max(CASE WHEN kind = 'g3' AND n_chars > 0 THEN top_mass * 10000 // n_chars END), 0) AS BIGINT) AS top3_bp,
       |  CAST(coalesce(max(CASE WHEN kind = 'g4' AND n_chars > 0 THEN top_mass * 10000 // n_chars END), 0) AS BIGINT) AS top4_bp
       |FROM k GROUP BY doc_id, n_chars$order""".stripMargin
  }

  val qDocRepetitionSql: String = docRepetitionProfileSql(withOrder = true)

  /** Gopher §A1.1 (Table A1) repetition-filter thresholds, in exact
    * basis points: a doc is KEPT iff duplicate-line/paragraph fraction
    * ≤ 30%, duplicate line/paragraph char fraction ≤ 20%, and top-2/3/4
    * gram mass shares ≤ 20/18/16%.
    */
  val RepetitionKeep: String =
    "dup_line_bp <= 3000 AND dup_para_bp <= 3000 AND " +
      "dup_line_char_bp <= 2000 AND dup_para_char_bp <= 2000 AND " +
      "top2_bp <= 2000 AND top3_bp <= 1800 AND top4_bp <= 1600"

  /** The repetition filter APPLIED ([[qDocRepetition]] + the published
    * Gopher thresholds): per verdict the doc count and the kept/dropped
    * gram-mass maxima — the keep bucket's maxima sitting under the
    * thresholds is the boundary proof. Same one-scan profile plus a
    * 2-row aggregate.
    */
  def qRepetitionFilter(spark: SparkSession, dir: String): DataFrame =
    docRepetitionProfile(spark, dir)
      .select(when(expr(RepetitionKeep), "keep").otherwise("drop").as("verdict"),
        col("top2_bp"), col("top3_bp"), col("top4_bp"))
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("top2_bp")).as("max_top2_bp"),
        max(col("top3_bp")).as("max_top3_bp"),
        max(col("top4_bp")).as("max_top4_bp"))
      .orderBy(col("verdict"))

  val qRepetitionFilterSql: String =
    s"""WITH p AS (
       |${docRepetitionProfileSql(withOrder = false)}
       |)
       |SELECT CASE WHEN $RepetitionKeep THEN 'keep' ELSE 'drop' END AS verdict,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(max(top2_bp) AS BIGINT) AS max_top2_bp,
       |  CAST(max(top3_bp) AS BIGINT) AS max_top3_bp,
       |  CAST(max(top4_bp) AS BIGINT) AS max_top4_bp
       |FROM p GROUP BY 1 ORDER BY verdict""".stripMargin

  /** CCNet-style QUALITY BUCKETS (Wenzek et al. 2020, arXiv:1911.00359):
    * rank every document by the LM fluency score ([[qLmBigramScore]]'s
    * exact-integer mean bigram lift standing in for perplexity) and cut
    * the corpus into equal head / middle / tail thirds — the canonical
    * pretraining-data triage where `head` trains, `middle` gets
    * sampled, `tail` gets dropped or re-filtered. Bucket assignment is
    * pure integer arithmetic on the global rank: `((rnk−1)·3) DIV N`.
    *
    * Scale: scoring is the one-pass bigram pipeline; ranking uses
    * [[Rank.globalRank]] (range-partitioned two-pass, no single-reducer
    * window); the bucket summary is a 3-row aggregate.
    */
  def qQualityBuckets(spark: SparkSession, dir: String): DataFrame = {
    // served from the rank artifact (VERDICT r13 item 1): two cheap scans
    // of a doc-count-sized parquet replace a full score+rank rebuild
    val ranked = lmRanked(spark, dir)
    ranked
      .crossJoin(broadcast(ranked.agg(max(col("rnk")).as("n"))))
      .select(
        expr("CASE WHEN ((rnk - 1) * 3) DIV n = 0 THEN 'head' " +
          "WHEN ((rnk - 1) * 3) DIV n = 1 THEN 'middle' ELSE 'tail' END").as("bucket"),
        col("n_bigrams"), col("mean_lift_micro"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bigrams")).as("n_bigrams"),
        min(col("mean_lift_micro")).as("min_score_micro"),
        max(col("mean_lift_micro")).as("max_score_micro"))
      .orderBy(col("bucket"))
  }

  val qQualityBucketsSql: String = {
    val scored = qLmBigramScoreSql.replace(
      "\nFROM lifts GROUP BY doc_id ORDER BY doc_id", "\nFROM lifts GROUP BY doc_id")
    s"""WITH scored AS (
       |$scored
       |), r AS (
       |  SELECT doc_id, n_bigrams, mean_lift_micro,
       |    row_number() OVER (ORDER BY mean_lift_micro DESC, doc_id) AS rnk,
       |    count(*) OVER () AS n
       |  FROM scored
       |)
       |SELECT CASE WHEN ((rnk - 1) * 3) // n = 0 THEN 'head'
       |            WHEN ((rnk - 1) * 3) // n = 1 THEN 'middle' ELSE 'tail' END AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
       |  CAST(min(mean_lift_micro) AS BIGINT) AS min_score_micro,
       |  CAST(max(mean_lift_micro) AS BIGINT) AS max_score_micro
       |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  /** Epochs in the [[qCurriculumMix]] competence schedule. */
  val CurriculumEpochs = 4

  /** COMPETENCE-BASED CURRICULUM schedule (Platanios et al. 2019,
    * arXiv:1903.09848): early training sees only the EASIEST slice of the
    * corpus and the admissible pool grows linearly to the full corpus —
    * epoch e of E admits the documents whose global easy-first rank
    * satisfies `rnk·E ≤ N·(e+1)` (exact integer inequality, no float
    * thresholds). Difficulty is the suite's LM fluency stand-in
    * ([[qLmBigramScore]], high lift = formulaic/easy); the output is the
    * schedule itself — per epoch the admitted doc/bigram mass, the cutoff
    * rank, and the admitted score range — which is what a data loader
    * consumes ([[Corpus.qEpochOrder]] then orders each epoch's pool).
    *
    * Scale: scoring is the one-pass bigram pipeline; ranking is
    * [[Rank.globalRank]] (range-partitioned two-pass, no single-reducer
    * window); the epoch explode multiplies the RANKED relation by the
    * constant E and feeds one E-row aggregate.
    */
  def qCurriculumMix(spark: SparkSession, dir: String): DataFrame =
    curriculumMixLazy(spark, dir)._1

  /** The curriculum plan + its rank input (now the [[lmRanked]] artifact
    * scan — nothing cached, so the second element exists only for the
    * plan-shape guard's historical shape; its unpersist is a no-op).
    */
  private[graft] def curriculumMixLazy(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ranked = lmRanked(spark, dir)
    val out = ranked
      .crossJoin(broadcast(ranked.agg(max(col("rnk")).as("n"))))
      .select(col("rnk"), col("n_bigrams"), col("mean_lift_micro"), col("n"),
        explode(sequence(lit(0L), lit(CurriculumEpochs - 1L))).as("epoch"))
      .filter(col("rnk") * CurriculumEpochs <= col("n") * (col("epoch") + 1))
      .groupBy(col("epoch"))
      .agg(count(lit(1)).as("n_docs"), max(col("rnk")).as("cutoff_rank"),
        sum(col("n_bigrams")).as("n_bigrams"),
        min(col("mean_lift_micro")).as("min_score_micro"),
        max(col("mean_lift_micro")).as("max_score_micro"))
      .orderBy(col("epoch"))
    (out, ranked)
  }

  val qCurriculumMixSql: String = {
    val scored = qLmBigramScoreSql.replace(
      "\nFROM lifts GROUP BY doc_id ORDER BY doc_id", "\nFROM lifts GROUP BY doc_id")
    s"""WITH scored AS (
       |$scored
       |), r AS (
       |  SELECT doc_id, n_bigrams, mean_lift_micro,
       |    row_number() OVER (ORDER BY mean_lift_micro DESC, doc_id) AS rnk,
       |    count(*) OVER () AS n
       |  FROM scored
       |)
       |SELECT epoch, count(*) AS n_docs, CAST(max(rnk) AS BIGINT) AS cutoff_rank,
       |  CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
       |  CAST(min(mean_lift_micro) AS BIGINT) AS min_score_micro,
       |  CAST(max(mean_lift_micro) AS BIGINT) AS max_score_micro
       |FROM r CROSS JOIN (SELECT unnest(range($CurriculumEpochs)) AS epoch) e
       |WHERE rnk * $CurriculumEpochs <= n * (epoch + 1)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Sources labeled "high quality" for the trainable classifier — the
    * stand-in for CCNet's Wikipedia-domain positives (the synthetic
    * corpus has no domain column; a fixed five-source slice plays the
    * reference-corpus role).
    */
  val QualityPosSources: Seq[String] = (0 to 4).map(i => s"src$i")

  /** TRAINED quality classifier — the CCNet stage [[qQualityBuckets]]
    * only proxied: CCNet's actual filter is a CLASSIFIER trained to
    * separate a high-quality reference corpus from crawl text (Wenzek
    * et al. 2020, arXiv:1911.00359 §3; fastText linear model over token
    * counts), not an LM rank. Here: a multinomial Naive-Bayes-weighted
    * linear model over token counts — TRAIN on the 80% split
    * (`doc_id % 5 ≠ 0`) labeled pos/neg by source membership
    * ([[QualityPosSources]] = reference corpus), APPLY to the held-out
    * 20%, and report the confusion matrix with per-cell score extrema.
    *
    * Weights stay in the suite's log-free exact-integer discipline: the
    * per-token Laplace-smoothed class-likelihood ratio in micro-units,
    * `w = ((c_pos+1)·(tot_neg+V)·10⁶) DIV ((c_neg+1)·(tot_pos+V))`
    * (neutral = 10⁶), and a document's score is the integer MEAN token
    * lift — the arithmetic-mean analogue of the NB log-likelihood-ratio
    * sum, rank-comparable and bit-identical across engines where
    * `log()`/libm would diverge (same convention as [[qLmBigramScore]]).
    * Unseen held-out tokens get the c_pos=c_neg=0 smoothed weight via
    * the left-join coalesce. Predicted class = score ≥ neutral.
    *
    * Magnitude: the weight numerator is ≤ (tot_pos+1)·(tot_neg+V)·10⁶ —
    * longs hold to ~3·10⁶ train tokens per class; lift to DECIMAL(38,0)
    * beyond (the [[qLmBigramScore]] bound).
    *
    * Scale: training is ONE map-side-combinable aggregate over the
    * exploded train split (token-vocabulary-sized result); totals are a
    * 1-row broadcast; the weight table is vocab-sized (Heaps-sublinear
    * in the corpus) → broadcast into the held-out token stream, so
    * applying the model is one broadcast-join projection + one per-doc
    * aggregate — no shuffle on the apply side beyond the final 4-row
    * confusion matrix.
    */
  /** The labeled/tokenized documents relation both classifier variants
    * read: (doc_id, actual ∈ pos/neg, t).
    */
  private[graft] def nbLabeled(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        when(col("source").isin(QualityPosSources: _*), lit("pos"))
          .otherwise(lit("neg")).as("actual"),
        tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)

  /** Train the NB weight tables over the 80% split of `docs`:
    * (weights (tok, w_micro), totals (tot_pos, tot_neg, v)).
    */
  private[graft] def nbTrain(docs: DataFrame): (DataFrame, DataFrame) = {
    val trainTok = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("actual"), explode(col("t")).as("tok"))
    val counts = trainTok.groupBy(col("tok")).agg(
      sum(when(col("actual") === "pos", 1L).otherwise(0L)).as("cnt_pos"),
      sum(when(col("actual") === "neg", 1L).otherwise(0L)).as("cnt_neg"))
    val totals = counts.agg(
      sum(col("cnt_pos")).as("tot_pos"), sum(col("cnt_neg")).as("tot_neg"),
      count(lit(1)).as("v"))
    val weights = counts.crossJoin(broadcast(totals))
      .select(col("tok"),
        expr("((cnt_pos + 1) * (tot_neg + v) * 1000000)" +
          " DIV ((cnt_neg + 1) * (tot_pos + v))").as("w_micro"))
    (weights, totals)
  }

  /** The ONE place the NB scoring formula lives (smoothed unseen-token
    * default, integer mean token lift) — shared by the confusion-matrix
    * apply, the stored-model serve, and the streaming gate, so the
    * threshold/smoothing cannot silently diverge between them: exploded
    * token rows (`keyCols` + `tok`) → per-key `(n_toks, score_micro)`.
    */
  private[graft] def nbScore(tokRows: DataFrame, keyCols: Seq[String],
      weights: DataFrame, totals: DataFrame): DataFrame =
    tokRows
      .join(broadcast(weights), Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(keyCols.map(col) :+
        coalesce(col("w_micro"),
          expr("((tot_neg + v) * 1000000) DIV (tot_pos + v)")).as("w"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("sum_w"))
      .select(keyCols.map(col) :+ col("n_toks") :+
        expr("sum_w DIV n_toks").as("score_micro"): _*)

  /** The pos/neg decision shared with [[nbScore]]'s consumers. */
  private[graft] def nbVerdict(score: Column): Column =
    when(score >= 1000000L, "pos").otherwise("neg")

  /** Score `held` (doc_id, actual, t) with the NB weight tables and fold
    * to the confusion matrix — one broadcast weight join, one per-doc
    * aggregate, one 4-row aggregate.
    */
  private[graft] def nbApply(
      held: DataFrame, weights: DataFrame, totals: DataFrame): DataFrame =
    nbScore(held.select(col("doc_id"), col("actual"), explode(col("t")).as("tok")),
        Seq("doc_id", "actual"), weights, totals)
      .select(col("actual"), nbVerdict(col("score_micro")).as("predicted"),
        col("score_micro"))
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("score_micro")).as("min_score_micro"),
        max(col("score_micro")).as("max_score_micro"))
      .orderBy(col("actual"), col("predicted"))

  def qQualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val docs = nbLabeled(spark, dir)
    val (weights, totals) = nbTrain(docs)
    nbApply(docs.filter(col("doc_id") % 5 === 0), weights, totals)
  }

  /** [[qQualityClassifier]] SERVED FROM THE STORED MODEL — the classifier
    * joining the stored-artifact lifecycle every index family already
    * has: train once per (corpus, session) through
    * [[Artifacts.ensureQualityNb]] (weights + totals parquet under the
    * md5-keyed scratch path), then apply is a pure read→broadcast→score
    * pass with NO training aggregates in the plan. Training is
    * deterministic, so the confusion matrix is bit-identical to the
    * in-session variant and both share one oracle. At 100 TB this is the
    * shape that matters: the weight table is trained once offline and
    * every downstream filter pass (or streaming gate) serves it.
    */
  def qQualityClassifierIndexed(spark: SparkSession, dir: String): DataFrame = {
    val d = Artifacts.ensureQualityNb(spark, dir)
    nbApply(nbLabeled(spark, dir).filter(col("doc_id") % 5 === 0),
      spark.read.parquet(s"$d/weights.parquet"),
      spark.read.parquet(s"$d/totals.parquet"))
  }

  val qQualityClassifierSql: String = {
    val pos = QualityPosSources.map("'" + _ + "'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CASE WHEN source IN ($pos) THEN 'pos' ELSE 'neg' END AS actual,
       |    regexp_split_to_array(lower(text), '\\s+') AS t
       |  FROM documents
       |  WHERE len(regexp_split_to_array(lower(text), '\\s+')) >= 1
       |), traintok AS (
       |  SELECT actual, unnest(t) AS tok FROM d WHERE doc_id % 5 <> 0
       |), c AS (
       |  SELECT tok,
       |    CAST(sum(CASE WHEN actual = 'pos' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_pos,
       |    CAST(sum(CASE WHEN actual = 'neg' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_neg
       |  FROM traintok GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(cnt_pos) AS BIGINT) AS tot_pos,
       |    CAST(sum(cnt_neg) AS BIGINT) AS tot_neg,
       |    CAST(count(*) AS BIGINT) AS v
       |  FROM c
       |), w AS (
       |  SELECT tok, ((cnt_pos + 1) * (tot_neg + v) * 1000000)
       |    // ((cnt_neg + 1) * (tot_pos + v)) AS w_micro
       |  FROM c CROSS JOIN tot
       |), sc AS (
       |  SELECT h.doc_id, h.actual,
       |    CAST(count(*) AS BIGINT) AS n_toks,
       |    CAST(sum(coalesce(w.w_micro,
       |      ((tot_neg + v) * 1000000) // (tot_pos + v))) AS BIGINT) AS sum_w
       |  FROM (SELECT doc_id, actual, unnest(t) AS tok FROM d WHERE doc_id % 5 = 0) h
       |  LEFT JOIN w USING (tok) CROSS JOIN tot
       |  GROUP BY 1, 2
       |)
       |SELECT actual,
       |  CASE WHEN (sum_w // n_toks) >= 1000000 THEN 'pos' ELSE 'neg' END AS predicted,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(min(sum_w // n_toks) AS BIGINT) AS min_score_micro,
       |  CAST(max(sum_w // n_toks) AS BIGINT) AS max_score_micro
       |FROM sc GROUP BY 1, 2 ORDER BY actual, predicted""".stripMargin
  }

  /** QUALITY × DUPLICATION interaction matrix — the corpus-health question
    * behind "dedup before or after quality filtering": are duplicates
    * CONCENTRATED in the tail-quality bucket (cheap templated spam —
    * filter first and dedup shrinks) or spread evenly (dedup first)?
    * Buckets are [[qQualityBuckets]]'s head/middle/tail thirds by the
    * exact-integer LM score rank; duplication is NEAR-DUP pair membership
    * (the capped exact-Jaccard relation — this corpus carries
    * near-duplicates but no byte-identical texts); shares are
    * within-bucket basis points.
    *
    * Scale: the score ranking is the one globalRank pass quality buckets
    * already pay; the dup side rides the already-capped pair relation;
    * the matrix is bucket×2 rows.
    */
  def qQualityDupMatrix(spark: SparkSession, dir: String): DataFrame = {
    val ranked = lmRanked(spark, dir)
    val buckets = ranked
      .crossJoin(broadcast(ranked.agg(max(col("rnk")).as("n"))))
      .select(col("doc_id"),
        expr("CASE WHEN ((rnk - 1) * 3) DIV n = 0 THEN 'head' " +
          "WHEN ((rnk - 1) * 3) DIV n = 1 THEN 'middle' ELSE 'tail' END").as("bucket"))
    val dupIds = Dedup.qDedupNgramJaccard(spark, dir)
      .select(explode(array(col("da"), col("db"))).as("doc_id"))
      .distinct().withColumn("d", lit(1))
    val dupFlags = table(spark, dir, "documents")
      .select(col("doc_id"))
      .join(dupIds, Seq("doc_id"), "left")
      .select(col("doc_id"), col("d").isNotNull.as("is_dup"))
    val cells = buckets.join(dupFlags, Seq("doc_id"))
      .groupBy(col("bucket"), col("is_dup"))
      .agg(count(lit(1)).as("n_docs"))
    val out = cells
      .withColumn("tot", sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("bucket"))))
      .select(col("bucket"), col("is_dup"), col("n_docs"),
        expr("(n_docs * 10000) DIV tot").as("share_bp"))
      .orderBy(col("bucket"), col("is_dup"))
    out
  }

  val qQualityDupMatrixSql: String = {
    val scored = qLmBigramScoreSql.replace(
      "\nFROM lifts GROUP BY doc_id ORDER BY doc_id", "\nFROM lifts GROUP BY doc_id")
    s"""WITH scored AS (
       |$scored
       |), r AS (
       |  SELECT doc_id, mean_lift_micro,
       |    row_number() OVER (ORDER BY mean_lift_micro DESC, doc_id) AS rnk,
       |    count(*) OVER () AS n
       |  FROM scored
       |), b AS (
       |  SELECT doc_id,
       |    CASE WHEN ((rnk - 1) * 3) // n = 0 THEN 'head'
       |         WHEN ((rnk - 1) * 3) // n = 1 THEN 'middle' ELSE 'tail' END AS bucket
       |  FROM r
       |), pairs AS (
       |  ${Dedup.qDedupNgramSql.replace("ORDER BY da, db", "")
            .linesIterator.mkString("\n  |  ")}
       |), dup_ids AS (
       |  SELECT da AS doc_id FROM pairs UNION SELECT db FROM pairs
       |), d AS (
       |  SELECT documents.doc_id, (dup_ids.doc_id IS NOT NULL) AS is_dup
       |  FROM documents LEFT JOIN dup_ids ON dup_ids.doc_id = documents.doc_id
       |), cells AS (
       |  SELECT bucket, is_dup, count(*) AS n_docs
       |  FROM b JOIN d USING (doc_id) GROUP BY 1, 2
       |)
       |SELECT bucket, is_dup, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST((n_docs * 10000) // (sum(n_docs) OVER (PARTITION BY bucket)) AS BIGINT)
       |    AS share_bp
       |FROM cells ORDER BY bucket, is_dup""".stripMargin
  }

  /** QUALITY SMOOTHING over the near-dup graph: for every document with
    * at least one near-duplicate, its own quality score next to the mean
    * quality of its neighbors (both in exact millionths — the micro-unit
    * discipline) and the signed gap. A document scoring far BELOW its
    * near-dup cluster is a truncated/mangled copy (drop it, keep the
    * neighbor); far above, the cluster is dragging a good document into a
    * dedup decision it shouldn't lose. This is one graph-smoothing hop of
    * label propagation applied to quality — the cross-check between the
    * quality gate and the dedup stage that neither runs alone.
    *
    * Scale: rides the capped pair relation ([[TextDedup.jaccardPairs]] —
    * the expensive pass is already bounded); the smoothing itself is one
    * pair-sized aggregation plus a doc-dimension join. Exact integers
    * throughout: quality in micro, the neighbor mean as `Σq·1 DIV n`.
    */
  def qQualitySmoothing(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val quality = docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"),
        floor(qualityScoreC(stopRatioC(col("t")), typeTokenRatioC(col("t")),
          lengthOkC(col("t"))) * 1000000).cast("long").as("q_micro"))
    val pairs = Dedup.storedPairs(spark, dir, Dedup.JaccardThreshold)
    val edges = pairs.select(col("id_a").as("doc_id"), col("id_b").as("nb"))
      .union(pairs.select(col("id_b").as("doc_id"), col("id_a").as("nb")))
    val nbAvg = edges
      .join(quality.select(col("doc_id").as("nb"), col("q_micro").as("nb_q")), Seq("nb"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_neighbors"), sum(col("nb_q")).as("nb_sum"))
      .withColumn("nb_mean_micro", expr("nb_sum DIV n_neighbors"))
    nbAvg.join(quality, Seq("doc_id"))
      .select(col("doc_id"), col("n_neighbors"), col("q_micro"),
        col("nb_mean_micro"),
        (col("q_micro") - col("nb_mean_micro")).as("gap_micro"))
      .orderBy(col("doc_id"))
  }

  val qQualitySmoothingSql: String = {
    val de = sqlStopCount(StopwordsDe)
    val en = sqlStopCount(StopwordsEn)
    val es = sqlStopCount(StopwordsEs)
    val fr = sqlStopCount(StopwordsFr)
    val k = Dedup.ShingleK
    s"""WITH base AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
       |), quality AS (
       |  SELECT doc_id,
       |    CAST(floor((CAST($en AS DOUBLE) / CAST(len(t) AS DOUBLE) * 2
       |     + CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)
       |     + CAST(len(t) >= 10 AND len(t) <= 1000 AS INTEGER)) / 4 * 1000000) AS BIGINT)
       |      AS q_micro
       |  FROM (SELECT doc_id, t, $de AS c_de, $en AS c_en, $es AS c_es, $fr AS c_fr
       |        FROM base) c
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(len(t) - ${k - 1}), i -> array_to_string(t[i+1:i+$k], ' ')))) AS s
       |  FROM base WHERE len(t) >= $k
       |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT da, db FROM (
       |    SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
       |    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |    GROUP BY 1, 2) cm
       |  JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
       |  WHERE CAST(common AS DOUBLE) / CAST(x.n + y.n - common AS DOUBLE)
       |    >= ${Dedup.JaccardThreshold}
       |), edges AS (
       |  SELECT da AS doc_id, db AS nb FROM pairs
       |  UNION ALL SELECT db, da FROM pairs
       |), nbavg AS (
       |  SELECT e.doc_id, count(*) AS n_neighbors,
       |    CAST(sum(q.q_micro) // count(*) AS BIGINT) AS nb_mean_micro
       |  FROM edges e JOIN quality q ON q.doc_id = e.nb
       |  GROUP BY 1
       |)
       |SELECT n.doc_id, n.n_neighbors, q.q_micro, n.nb_mean_micro,
       |  q.q_micro - n.nb_mean_micro AS gap_micro
       |FROM nbavg n JOIN quality q USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** SPLIT CONTENT-DRIFT audit: the [[qSourceDrift]] divergence applied to
    * the train/test assignment — the tokens whose frequency differs most
    * between the two splits, by the exact-integer cross-product score
    * `|n_train·N_test − n_test·N_train|`. An md5 split SHOULD read as
    * noise here; a top token with an extreme one-sided count means the
    * split correlates with content (leakage of a systematic kind the
    * pair-level [[Dedup
    * .qDedupNgramJaccard]]-based q_split_leakage can't see) — the check a
    * pipeline runs before trusting held-out numbers.
    *
    * Scale: one token scan into (split, token) counts, two broadcast
    * 1-row totals, one full-outer merge of two dimension-sized count
    * relations, top-20.
    */
  def qSplitDrift(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "documents")
      .select(Corpus.splitCol(col("doc_id")).as("split"),
        explode(tokens(col("text"))).as("w"))
      .filter(col("split").isin("train", "test"))
      .groupBy(col("split"), col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = c.groupBy(col("split")).agg(sum(col("c")).as("n"))
    val a = tot.filter(col("split") === "train").select(col("n").as("na"))
    val b = tot.filter(col("split") === "test").select(col("n").as("nb"))
    val ca = c.filter(col("split") === "train").select(col("w").as("wa"), col("c").as("ca"))
    val cb = c.filter(col("split") === "test").select(col("w").as("wb"), col("c").as("cb"))
    val out = ca.join(cb, col("wa") === col("wb"), "full_outer")
      .select(coalesce(col("wa"), col("wb")).as("token"),
        coalesce(col("ca"), lit(0L)).as("n_train"),
        coalesce(col("cb"), lit(0L)).as("n_test"))
      .crossJoin(broadcast(a))
      .crossJoin(broadcast(b))
      .select(col("token"), col("n_train"), col("n_test"),
        abs(col("n_train") * col("nb") - col("n_test") * col("na")).as("drift"))
      .orderBy(col("drift").desc, col("token"))
      .limit(20)
    TextDedup.materializeAndRelease(out, c)
  }

  val qSplitDriftSql: String =
    s"""WITH tok AS (
       |  SELECT ${Corpus.splitColSql("doc_id")} AS split,
       |    unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
       |  FROM documents
       |), c AS (
       |  SELECT split, w, count(*) AS c FROM tok
       |  WHERE split IN ('train', 'test') GROUP BY 1, 2
       |), tot AS (
       |  SELECT split, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1
       |), a AS (SELECT n AS na FROM tot WHERE split = 'train'),
       |b AS (SELECT n AS nb FROM tot WHERE split = 'test'),
       |ca AS (SELECT w, c FROM c WHERE split = 'train'),
       |cb AS (SELECT w, c FROM c WHERE split = 'test')
       |SELECT coalesce(ca.w, cb.w) AS token,
       |  CAST(coalesce(ca.c, 0) AS BIGINT) AS n_train,
       |  CAST(coalesce(cb.c, 0) AS BIGINT) AS n_test,
       |  CAST(abs(coalesce(ca.c, 0) * nb - coalesce(cb.c, 0) * na) AS BIGINT) AS drift
       |FROM ca FULL OUTER JOIN cb ON ca.w = cb.w
       |CROSS JOIN a CROSS JOIN b
       |ORDER BY drift DESC, token
       |LIMIT 20""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_smoothing" -> (qQualitySmoothing _),
    "q_split_drift" -> (qSplitDrift _),
    "q_quality_dup_matrix" -> (qQualityDupMatrix _),
    "q_quality_buckets" -> (qQualityBuckets _),
    "q_quality_classifier" -> (qQualityClassifier _),
    "q_curriculum_mix" -> (qCurriculumMix _),
    "q_quality_classifier_indexed" -> (qQualityClassifierIndexed _),
    "q_vocab_coverage" -> (qVocabCoverage _),
    "q_template_prefixes" -> (qTemplatePrefixes _),
    "q_lang_confusion" -> (qLangConfusion _),
    "q_pii_audit" -> (qPiiAudit _),
    "q_text_stutter" -> (qTextStutter _),
    "q_length_corr" -> (qLengthCorr _),
    "q_dup_ngrams" -> (qDupNgrams _),
    "q_readability" -> (qReadability _),
    "q_source_diversity" -> (qSourceDiversity _),
    "q_source_redundancy" -> (qSourceRedundancy _),
    "q_ngram_novelty" -> (qNgramNovelty _),
    "q_source_drift" -> (qSourceDrift _),
    "q_sparse_sim_join" -> (qSparseSimJoin _),
    "q_tfidf_terms" -> (qTfidfTerms _),
    "q_bm25_topk" -> (qBm25TopK _),
    "q_bm25_indexed" -> (qBm25Indexed _),
    "q_search_refresh" -> (qSearchRefresh _),
    "q_phrase_search" -> (qPhraseSearch _),
    "q_search_snippets" -> (qSearchSnippets _),
    "q_vocab_oov" -> (qVocabOov _),
    "q_lm_bigram_score" -> (qLmBigramScoreServed _),
    "q_lm_trigram_score" -> (qLmTrigramScore _),
    "q_ppl_buckets" -> (qPplBuckets _),
    "q_topic_tags" -> (qTopicTags _),
    "q_mix_reweight" -> (qMixReweight _),
    "q_topic_drift" -> (qTopicDrift _),
    "q_collocations" -> (qCollocations _),
    "q_text_repetition" -> (qTextRepetition _),
    "q_doc_repetition" -> (qDocRepetition _),
    "q_repetition_filter" -> (qRepetitionFilter _),
    "q_text_scrub" -> (qTextScrub _),
    "q_text_bpe_tokens" -> (qTextBpeTokens _),
    "q_text_rolling_fp" -> (qTextRollingFp _),
    "q_text_stats" -> (qTextStats _),
    "q_text_quality" -> (qTextQuality _),
    "q_text_langid" -> (qTextLangid _),
    "q_text_fingerprint" -> (qTextFingerprint _),
    "q_token_freq" -> (qTokenFreq _),
  )

  def oracle: Map[String, String] = Map(
    "q_quality_smoothing" -> qQualitySmoothingSql,
    "q_split_drift" -> qSplitDriftSql,
    "q_quality_buckets" -> qQualityBucketsSql,
    "q_quality_classifier" -> qQualityClassifierSql,
    "q_curriculum_mix" -> qCurriculumMixSql,
    "q_quality_classifier_indexed" -> qQualityClassifierSql,
    "q_quality_dup_matrix" -> qQualityDupMatrixSql,
    "q_vocab_coverage" -> qVocabCoverageSql,
    "q_template_prefixes" -> qTemplatePrefixesSql,
    "q_lang_confusion" -> qLangConfusionSql,
    "q_pii_audit" -> qPiiAuditSql,
    "q_text_stutter" -> qTextStutterSql,
    "q_length_corr" -> qLengthCorrSql,
    "q_dup_ngrams" -> qDupNgramsSql,
    "q_readability" -> qReadabilitySql,
    "q_source_diversity" -> qSourceDiversitySql,
    "q_source_redundancy" -> qSourceRedundancySql,
    "q_ngram_novelty" -> qNgramNoveltySql,
    "q_source_drift" -> qSourceDriftSql,
    "q_sparse_sim_join" -> qSparseSimJoinSql,
    "q_tfidf_terms" -> qTfidfTermsSql,
    "q_bm25_topk" -> qBm25TopKSql,
    // the stored-index path is bit-identical — the index holds integers
    "q_bm25_indexed" -> qBm25TopKSql,
    // the refreshed index must be indistinguishable from a full rebuild
    "q_search_refresh" -> qBm25TopKSql,
    "q_phrase_search" -> qPhraseSearchSql,
    "q_search_snippets" -> qSearchSnippetsSql,
    "q_vocab_oov" -> qVocabOovSql,
    "q_lm_bigram_score" -> qLmBigramScoreSql,
    "q_lm_trigram_score" -> qLmTrigramScoreSql,
    "q_ppl_buckets" -> qPplBucketsSql,
    "q_topic_tags" -> qTopicTagsSql,
    "q_mix_reweight" -> qMixReweightSql,
    "q_topic_drift" -> qTopicDriftSql,
    "q_collocations" -> qCollocationsSql,
    "q_text_repetition" -> qTextRepetitionSql,
    "q_doc_repetition" -> qDocRepetitionSql,
    "q_repetition_filter" -> qRepetitionFilterSql,
    "q_text_scrub" -> qTextScrubSql,
    "q_text_bpe_tokens" -> qTextBpeTokensSql,
    "q_text_rolling_fp" -> qTextRollingFpSql,
    "q_text_stats" -> qTextStatsSql,
    "q_text_quality" -> qTextQualitySql,
    "q_text_langid" -> qTextLangidSql,
    "q_text_fingerprint" -> qTextFingerprintSql,
    "q_token_freq" -> qTokenFreqSql,
  )
}
