package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._
import TextOps._

/** The composite training-data pipeline: the individual operators
  * (quality scoring, language ID, exact dedup, near-dup dedup with
  * survivor selection) chained the way a 100 TB corpus-cleaning job runs
  * them, as ONE declarative plan.
  *
  * Stage order is the cheap-filter-first discipline: narrow per-row gates
  * (quality, langid — pure projections) cut the corpus before anything
  * that shuffles (exact-dedup groupBy), and the near-dup pair join — the
  * only super-linear stage — sees only exact-unique, gated survivors.
  *
  * The reference has no such pipeline (it is a per-file ETL —
  * `/root/reference/src/hubverse_transform/model_output.py:324-331`); this
  * is extension surface per SURVEY.md §2.9, oracle-checked end to end.
  */
object Pipeline {

  val QualityMin = 0.5

  /** Corpus cleaning end-to-end: en-language, quality-gated, exact-deduped,
    * near-dup-deduped (connected-component min-id survivors). Returns the
    * surviving documents with their pipeline stats.
    */
  def qPipelineCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val withT = docs.select(col("doc_id"), col("text"), tokens(col("text")).as("t"))

    // stage 1+2: quality + language gates (one narrow projection, no shuffle)
    val gated = withT
      .withColumn("n_tokens", size(col("t")).cast(LongType))
      .withColumn("quality_score",
        TextAnalysis.qualityScoreC(
          TextAnalysis.stopRatioC(col("t")),
          TextAnalysis.typeTokenRatioC(col("t")),
          TextAnalysis.lengthOkC(col("t"))))
      .filter(TextAnalysis.langPredC(col("t")) === "en" &&
        col("quality_score") >= QualityMin)
      .withColumn("fp", md5(concat_ws(" ", col("t"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // stage 3: exact dedup — survivor is the min doc_id per fingerprint
    val keep = gated.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val exactKept = gated.join(keep, Seq("fp", "doc_id"), "left_semi")

    // stage 4: near-dup dedup — pair generation over exact survivors only,
    // then connected-component min-label survivor selection
    val pairs = TextDedup.jaccardPairs(
      exactKept, col("doc_id"), col("text"), Dedup.ShingleK, Dedup.JaccardThreshold)
    val canon = TextDedup.canonicalize(pairs, exactKept.select(col("doc_id").as("id")))
    val survivors = canon.filter(col("canonical") === col("id"))
      .select(col("id").as("doc_id"))

    val out = exactKept.join(survivors, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("fp"), col("n_tokens"), col("quality_score"))
      .orderBy(col("doc_id"))
    TextDedup.materializeAndRelease(out, gated)
  }

  /** DuckDB mirror: same stages, recursive-CTE closure for the components. */
  val qPipelineCorpusSql: String = {
    val de = TextAnalysis.sqlStopCount(TextAnalysis.StopwordsDe)
    val en = TextAnalysis.sqlStopCount(TextAnalysis.StopwordsEn)
    val es = TextAnalysis.sqlStopCount(TextAnalysis.StopwordsEs)
    val fr = TextAnalysis.sqlStopCount(TextAnalysis.StopwordsFr)
    val k = Dedup.ShingleK
    s"""WITH RECURSIVE base AS (
       |  SELECT doc_id, text, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
       |), cnts AS (
       |  SELECT doc_id, text, t,
       |    $de AS c_de, $en AS c_en, $es AS c_es, $fr AS c_fr
       |  FROM base
       |), scored AS (
       |  SELECT doc_id, text, t, len(t) AS n_tokens,
       |    (CAST(c_en AS DOUBLE) / CAST(len(t) AS DOUBLE) * 2
       |     + CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)
       |     + CAST(len(t) >= 10 AND len(t) <= 1000 AS INTEGER)) / 4 AS quality_score,
       |    ${TextAnalysis.langPredSql} AS pred
       |  FROM cnts
       |), gated AS (
       |  SELECT doc_id, text, t, n_tokens, quality_score,
       |    md5(array_to_string(t, ' ')) AS fp
       |  FROM scored WHERE pred = 'en' AND quality_score >= $QualityMin
       |), keep AS (
       |  SELECT fp, min(doc_id) AS doc_id FROM gated GROUP BY fp
       |), ek AS (
       |  SELECT g.* FROM gated g JOIN keep USING (fp, doc_id)
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(len(t) - ${k - 1}),
       |    i -> array_to_string(t[i+1:i+$k], ' ')))) AS s
       |  FROM ek WHERE len(t) >= $k
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
       |), commons AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), pairs AS (
       |  SELECT da, db
       |  FROM commons JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
       |  WHERE CAST(common AS DOUBLE) / CAST(x.n + y.n - common AS DOUBLE) >= ${Dedup.JaccardThreshold}
       |), edges AS (
       |  SELECT da AS src, db AS dst FROM pairs
       |  UNION ALL SELECT db AS src, da AS dst FROM pairs
       |), walk(id, lbl) AS (
       |  SELECT doc_id, doc_id FROM ek
       |  UNION
       |  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id
       |), canon AS (
       |  SELECT id, min(lbl) AS canonical FROM walk GROUP BY id
       |)
       |SELECT g.doc_id, g.fp, g.n_tokens, g.quality_score
       |FROM ek g JOIN canon c ON g.doc_id = c.id AND c.canonical = g.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** Cross-modal near-dup verification: embedding-cosine pairs joined back
    * to TEXT-side features of both endpoints — predicted-language agreement
    * and token-count gap — the "do the vector neighbors make textual
    * sense?" check a pipeline runs before trusting embedding dedup. The
    * join keys are the (already tiny) pair ids, so the enrichment joins
    * shuffle pair-sized relations, not the corpus. The pair source is the
    * cluster-bounded [[VectorSearch.clusterCosinePairs]] (round 10 — the
    * exact all-pairs scan measured 103× at the 10× probe; see
    * [[Dedup.qDedupEmbedding]]).
    */
  def qPipelineCrossmodal(spark: SparkSession, dir: String): DataFrame = {
    val pairs = VectorSearch.clusterCosinePairs(
      table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), Dedup.CosineThreshold,
      probes = Dedup.ClusterPairProbes)
    val feat = table(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"),
        TextAnalysis.langPredC(col("t")).as("lang"),
        size(col("t")).cast(LongType).as("ntok"))
    pairs
      .join(feat.toDF("id_a", "lang_a", "ntok_a"), Seq("id_a"))
      .join(feat.toDF("id_b", "lang_b", "ntok_b"), Seq("id_b"))
      .select(
        col("id_a").as("va"), col("id_b").as("vb"), col("cos_sim"),
        (col("lang_a") === col("lang_b")).cast(IntegerType).as("same_lang"),
        abs(col("ntok_a") - col("ntok_b")).as("tok_diff"))
      .orderBy(col("va"), col("vb"))
  }

  val qPipelineCrossmodalSql: String = {
    val de = TextAnalysis.sqlStopCount(TextAnalysis.StopwordsDe)
    val en = TextAnalysis.sqlStopCount(TextAnalysis.StopwordsEn)
    val es = TextAnalysis.sqlStopCount(TextAnalysis.StopwordsEs)
    val fr = TextAnalysis.sqlStopCount(TextAnalysis.StopwordsFr)
    s"""WITH p AS (
       |  SELECT va, vb, cos_sim FROM (
       |${Dedup.qDedupEmbeddingSql.linesIterator.map("    " + _).mkString("\n")}
       |  ) pp
       |), cnts AS (
       |  SELECT doc_id, t, $de AS c_de, $en AS c_en, $es AS c_es, $fr AS c_fr
       |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents)
       |), f AS (
       |  SELECT doc_id,
       |    ${TextAnalysis.langPredSql} AS lang,
       |    len(t) AS ntok
       |  FROM cnts
       |)
       |SELECT va, vb, cos_sim,
       |  CAST(fa.lang = fb.lang AS INTEGER) AS same_lang,
       |  abs(fa.ntok - fb.ntok) AS tok_diff
       |FROM p JOIN f fa ON va = fa.doc_id JOIN f fb ON vb = fb.doc_id
       |ORDER BY va, vb""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_corpus" -> (qPipelineCorpus _),
    "q_pipeline_crossmodal" -> (qPipelineCrossmodal _))

  def oracle: Map[String, String] = Map(
    "q_pipeline_corpus" -> qPipelineCorpusSql,
    "q_pipeline_crossmodal" -> qPipelineCrossmodalSql)
}
