package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** BPE merge induction — TOKENIZER TRAINING, not tokenization: the
  * iterative most-frequent-adjacent-pair merging that builds a BPE
  * vocabulary (Sennrich et al.'s procedure), complementing
  * [[TextAnalysis.qTextBpeTokens]] which only APPLIES a GPT-2-style
  * pre-tokenizer pattern.
  *
  * Structure, chosen for scale: the corpus collapses ONCE into a
  * word-frequency table (the only pass over the data — one shuffle,
  * map-side partial counts), capped at the `vocabWords` most frequent
  * [a-z]+ words (ties by word — deterministic). Every merge round then
  * runs on that VOCABULARY-sized dimension table: adjacent-pair counts
  * weighted by word frequency, the arg-max pair (total order:
  * count desc, pair asc), and a literal-string merge of the winning
  * pair in every word representation. Per-round state is ~vocabWords
  * rows regardless of corpus size — the classic reason BPE training is
  * feasible at 100 TB: the heavy lifting is one aggregation, the
  * iteration is metadata-sized.
  *
  * Determinism & the oracle: word representations are space-delimited
  * symbol strings (`" l o w "`); a merge of pair (a, b) is
  * `replace(repr, " a b ", " a b " → " ab ")` — non-overlapping,
  * left-to-right in both engines, which IS BPE's greedy-left merge
  * order. Counts are exact longs; the arg-max per round collects ONE
  * row to the driver (control-plane, like the k-core stats). The
  * DuckDB oracle replays every round as chained CTEs and must produce
  * the identical merge table.
  */
object BpeTrain {

  val VocabWords = 2000
  val MergeRounds = 10

  /** The learned merge table: one row per round — the merged pair and
    * its weighted adjacency count at merge time.
    */
  def bpeMerges(docs: DataFrame, vocabWords: Int, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    val wf = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(vocabWords)
    // " a b c " — leading/trailing spaces make every symbol boundary a
    // literal " x y " window for the merge replace
    var words = wf
      .select(concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("repr"),
        col("freq"))
      .localCheckpoint() // vocab-sized; each round reads the state twice
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    for (r <- 1 to rounds if !done) {
      val top = words
        .select(col("freq"), split(trim(col("repr")), " ").as("t"))
        // guard: sequence(0, -1) would DESCEND in Spark — drop fully
        // merged single-symbol words before building pair indices
        .filter(size(col("t")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS a, t[i + 1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect() // control-plane: the single arg-max row per round
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, cnt))
        words = words
          .withColumn("_s", lit(s" $a $b "))
          .withColumn("_r", lit(s" $a$b "))
          .withColumn("repr", expr("replace(repr, _s, _r)"))
          .select(col("repr"), col("freq"))
          .localCheckpoint() // next round's state, vocab-sized
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("round", "a", "b", "cnt")
      .select(col("round"), col("a"), col("b"), col("cnt"))
      .orderBy(col("round"))
  }

  /** 10 merge rounds over the 2000 most frequent words of `documents`.
    * Served from the stored merge table ([[Artifacts.ensureBpeMerges]] —
    * trained once per (corpus, session); all three BPE queries share it).
    */
  def qBpeMerges(spark: SparkSession, dir: String): DataFrame =
    storedMerges(spark, dir).orderBy(col("round"))

  /** The stored merge table of [[Artifacts.ensureBpeMerges]]. */
  private def storedMerges(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${Artifacts.ensureBpeMerges(spark, dir)}/merges.parquet")

  /** Every per-round CTE is MATERIALIZED and each is referenced with a
    * single 1-row cross join: a plain (inlined) CTE chain re-expands the
    * whole prefix at every reference — exponential plan blow-up and one
    * parquet re-open per expansion ("too many open files" observed at
    * 10 rounds).
    */
  val qBpeMergesSql: String = {
    def round(i: Int): String = mergeRoundSql(i)
    s"""WITH tok AS (
       |  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w FROM documents
       |), wf AS MATERIALIZED (
       |  SELECT w, count(*) AS freq FROM tok
       |  WHERE regexp_full_match(w, '[a-z]+')
       |  GROUP BY 1 ORDER BY freq DESC, w LIMIT $VocabWords
       |), w0 AS MATERIALIZED (
       |  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS repr, freq FROM wf
       |), ${(1 to MergeRounds).map(round).mkString(", ")}
       |SELECT round, a, b, CAST(cnt AS BIGINT) AS cnt
       |FROM (${(1 to MergeRounds).map(i => s"SELECT * FROM m$i").mkString(" UNION ALL ")}) u
       |ORDER BY round""".stripMargin
  }

  /** TOKENIZER APPLICATION: encode the whole corpus with the merge table
    * [[bpeMerges]] just learned, reporting per-source symbol counts
    * before/after and the compression in basis points — the end-to-end
    * train→apply loop of a real tokenizer pipeline (and the metric that
    * tells you whether 10 merges were worth anything on this corpus).
    *
    * The merge table is COLLECTED to the driver (control-plane —
    * `rounds` rows) and baked into the encode expression as literal
    * chained `replace`s in merge order: greedy-left, non-overlapping —
    * the exact application order BPE training assumed. Encoding is then
    * ONE corpus scan through a fully-codegen'd string pipeline with ZERO
    * joins; the oracle reaches the same values by cross-joining the ten
    * 1-row materialized merge CTEs into nested replaces.
    *
    * Scale: training cost is [[bpeMerges]]'s (one corpus pass + metadata
    * rounds); encoding adds exactly one more corpus pass. At 100 TB the
    * merge table would be 30k-50k rows — still driver-trivial — but the
    * chained-replace expression goes deep; production encoders switch to
    * a trie-based `Expression` at that vocab size (same output contract).
    */
  def qBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val merges = storedMerges(spark, dir)
      .orderBy(col("round")).collect()
    val repr0: org.apache.spark.sql.Column =
      concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 "))
    val reprN = merges.foldLeft(repr0) { (acc, m) =>
      val (a, b) = (m.getString(1), m.getString(2))
      replace(acc, lit(s" $a $b "), lit(s" $a$b "))
    }
    docs
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
      .select(col("source"), length(col("w")).as("nb"),
        size(split(trim(reprN), " ")).as("na"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("nb")).as("n_sym_before"), sum(col("na").cast("long")).as("n_sym_after"))
      .select(col("source"), col("n_words"), col("n_sym_before"), col("n_sym_after"),
        expr("(n_sym_before - n_sym_after) * 10000 DIV n_sym_before")
          .as("compression_bp"))
      .orderBy(col("source"))
  }

  val qBpeEncodeSql: String = {
    val rep = (1 to MergeRounds).foldLeft("repr") { (acc, i) =>
      s"replace($acc, ' ' || m$i.a || ' ' || m$i.b || ' ', ' ' || m$i.a || m$i.b || ' ')"
    }
    s"""WITH tok AS (
       |  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w FROM documents
       |), wf AS MATERIALIZED (
       |  SELECT w, count(*) AS freq FROM tok
       |  WHERE regexp_full_match(w, '[a-z]+')
       |  GROUP BY 1 ORDER BY freq DESC, w LIMIT $VocabWords
       |), w0 AS MATERIALIZED (
       |  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS repr, freq FROM wf
       |), ${(1 to MergeRounds).map(mergeRoundSql).mkString(", ")},
       |dtok AS (
       |  SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
       |  FROM documents
       |), drepr AS (
       |  SELECT source, length(w) AS nb,
       |    ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS repr
       |  FROM dtok
       |), enc AS (
       |  SELECT source, nb, len(str_split(trim($rep), ' ')) AS na
       |  FROM drepr, ${(1 to MergeRounds).map(i => s"m$i").mkString(", ")}
       |)
       |SELECT source, count(*) AS n_words,
       |  CAST(sum(nb) AS BIGINT) AS n_sym_before,
       |  CAST(sum(na) AS BIGINT) AS n_sym_after,
       |  ((CAST(sum(nb) AS BIGINT) - CAST(sum(na) AS BIGINT)) * 10000)
       |    // CAST(sum(nb) AS BIGINT) AS compression_bp
       |FROM enc GROUP BY source ORDER BY source""".stripMargin
  }

  /** One training round's CTE pair (shared by the merges and encode
    * oracles): the arg-max pair then the merged word state.
    */
  private def mergeRoundSql(i: Int): String =
    s"""m$i AS MATERIALIZED (
       |  SELECT $i AS round, a, b, cnt FROM (
       |    SELECT l[i] AS a, l[i+1] AS b, sum(freq) AS cnt
       |    FROM (SELECT str_split(trim(repr), ' ') AS l, freq FROM w${i - 1}) s,
       |         unnest(generate_series(1, len(l) - 1)) AS g(i)
       |    GROUP BY 1, 2)
       |  ORDER BY cnt DESC, a, b LIMIT 1
       |), w$i AS MATERIALIZED (
       |  SELECT replace(repr, ' ' || m.a || ' ' || m.b || ' ',
       |                 ' ' || m.a || m.b || ' ') AS repr, freq
       |  FROM w${i - 1}, m$i m
       |)""".stripMargin

  /** TOKENIZER FERTILITY BY LANGUAGE — tokens-per-word of the trained BPE
    * vocabulary, split by the n-gram language prediction: the audit that
    * says WHO pays for an under-trained vocabulary (a tokenizer trained
    * on mostly-English text fragments non-English words into near-
    * characters, inflating their sequence lengths and training cost —
    * the fertility gap is the standard multilingual-tokenizer metric).
    * Fertility is reported in exact millionths
    * (`Σ BPE tokens · 10^6 DIV Σ words`), so the row hash-gates.
    *
    * Scale: training is [[bpeMerges]] (shared contract); scoring is one
    * corpus scan — the language prediction is a per-document projection,
    * the encode the same zero-join chained-replace pipeline as
    * [[qBpeEncode]], and the aggregate collapses to |languages| rows.
    */
  def qBpeFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val merges = storedMerges(spark, dir)
      .orderBy(col("round")).collect()
    val repr0: org.apache.spark.sql.Column =
      concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 "))
    val reprN = merges.foldLeft(repr0) { (acc, m) =>
      val (a, b) = (m.getString(1), m.getString(2))
      replace(acc, lit(s" $a $b "), lit(s" $a$b "))
    }
    // per-word encode folded INSIDE the token array (`transform` +
    // `aggregate`) instead of an explode: a Generate here would re-evaluate
    // the per-DOC language prediction once per output WORD (the round-10
    // GenerateExec lesson, SCALE.md) — measured 23.7 s vs 3 s at sf0.1
    def encLen(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val r0 = concat(lit(" "), regexp_replace(w, "(.)", "$1 "))
      val rN = merges.foldLeft(r0) { (acc, m) =>
        val (a, b) = (m.getString(1), m.getString(2))
        replace(acc, lit(s" $a $b "), lit(s" $a$b "))
      }
      size(split(trim(rN), " ")).cast("long")
    }
    docs
      .select(TextOps.tokens(col("text")).as("t"))
      .select(TextAnalysis.langPredC(col("t")).as("lang"),
        size(col("t")).cast("long").as("nw"),
        aggregate(col("t"), lit(0L), (acc, w) => acc + encLen(w)).as("na"))
      .groupBy(col("lang"))
      .agg(sum(col("nw")).as("n_words"), sum(col("na")).as("n_bpe_tokens"))
      .withColumn("fertility_micro", expr("n_bpe_tokens * 1000000 DIV n_words"))
      .orderBy(col("lang"))
  }

  val qBpeFertilitySql: String = {
    val rep = (1 to MergeRounds).foldLeft("repr") { (acc, i) =>
      s"replace($acc, ' ' || m$i.a || ' ' || m$i.b || ' ', ' ' || m$i.a || m$i.b || ' ')"
    }
    val de = TextAnalysis.sqlStopCount(TextAnalysis.StopwordsDe)
    val en = TextAnalysis.sqlStopCount(TextAnalysis.StopwordsEn)
    val es = TextAnalysis.sqlStopCount(TextAnalysis.StopwordsEs)
    val fr = TextAnalysis.sqlStopCount(TextAnalysis.StopwordsFr)
    s"""WITH tok AS (
       |  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w FROM documents
       |), wf AS MATERIALIZED (
       |  SELECT w, count(*) AS freq FROM tok
       |  WHERE regexp_full_match(w, '[a-z]+')
       |  GROUP BY 1 ORDER BY freq DESC, w LIMIT $VocabWords
       |), w0 AS MATERIALIZED (
       |  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS repr, freq FROM wf
       |), ${(1 to MergeRounds).map(mergeRoundSql).mkString(", ")},
       |base AS (
       |  SELECT regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
       |), cnts AS (
       |  SELECT t, $de AS c_de, $en AS c_en, $es AS c_es, $fr AS c_fr FROM base
       |), pl AS (
       |  SELECT ${TextAnalysis.langPredSql} AS lang, t FROM cnts
       |), words AS (
       |  SELECT lang, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS repr
       |  FROM (SELECT lang, unnest(t) AS w FROM pl)
       |), enc AS (
       |  SELECT lang, len(str_split(trim($rep), ' ')) AS na
       |  FROM words, ${(1 to MergeRounds).map(i => s"m$i").mkString(", ")}
       |)
       |SELECT lang, count(*) AS n_words, CAST(sum(na) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(na) * 1000000 // count(*) AS BIGINT) AS fertility_micro
       |FROM enc GROUP BY lang ORDER BY lang""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_bpe_merges" -> (qBpeMerges _), "q_bpe_encode" -> (qBpeEncode _),
      "q_bpe_fertility" -> (qBpeFertility _))

  def oracle: Map[String, String] = Map(
    "q_bpe_merges" -> qBpeMergesSql,
    "q_bpe_encode" -> qBpeEncodeSql,
    "q_bpe_fertility" -> qBpeFertilitySql)
}
