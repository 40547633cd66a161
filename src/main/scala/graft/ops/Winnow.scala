package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._
import TextOps.tokens

/** Winnowing fingerprints + cross-document shared-span detection — the
  * exact-substring-overlap dedup shape (MOSS / "deduplicating training
  * data" lineage): pick a guaranteed-coverage subset of k-gram hashes per
  * document, invert, and count fingerprints shared by document pairs.
  *
  * Winnowing (Schleimer et al., SIGMOD '03): hash every token k-gram, then
  * for EVERY window of `w` consecutive k-grams select the minimum hash
  * (leftmost on ties). The selected set is ~2/(w+1) of all grams yet any
  * shared token run of length ≥ k + w - 1 is guaranteed to produce at
  * least one shared fingerprint — unlike uniform sampling, which can miss
  * arbitrarily long overlaps.
  *
  * Implementation shape: the argmin-per-window is ONE window-function pass
  * — hash and position are packed into a single long (`h·2^20 + pos`, so
  * `min` picks lowest hash then leftmost position with plain integer
  * ordering), `min OVER (ROWS CURRENT..w-1 FOLLOWING)` slides the window,
  * and DISTINCT collapses re-selected positions. No self-join, no UDF;
  * both engines replay it exactly (md5-derived 40-bit hashes).
  *
  * Scale: fingerprint selection is a narrow per-document pass (window
  * partitioned by doc — no global sort); the pair count shuffles only
  * SELECTED fingerprints (~2/(w+1) of the gram stream) on the hash key.
  * Ultra-common fingerprints (boilerplate) should be stop-listed before
  * the self-join — same skew note as the shingle inverted index; the
  * pair-count join is the classic "documents sharing rare keys" shape.
  */
object Winnow {

  /** pos must fit below this in the packed key (documents of up to 2^20
    * grams — 1M tokens; larger docs should be chunked upstream).
    */
  private val PosPack = 1L << 20

  /** Selected `(id, pos, h)` winnowing fingerprints: 40-bit md5 gram
    * hashes, window `w`, token k-grams.
    */
  def fingerprints(docs: DataFrame, id: Column, text: Column, k: Int, w: Int): DataFrame = {
    val t = tokens(text)
    val grams = docs
      .select(id.as("id"), t.as("t"))
      .select(col("id"), (size(col("t")) - (k - 1)).as("n_grams"),
        posexplode(transform(sequence(lit(0), size(col("t")) - k),
          i => concat_ws(" ", slice(col("t"), i + 1, lit(k))))).as(Seq("pos", "gram")))
    val keyed = grams.select(col("id"), col("pos"), col("n_grams"),
      (conv(substring(md5(col("gram")), 1, 10), 16, 10).cast(LongType) * PosPack
        + col("pos")).as("key"))
    val win = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    keyed
      .select(col("id"), col("pos"), col("n_grams"), min(col("key")).over(win).as("sel"))
      // a window starts at every pos ≤ n_grams - w (shorter docs: the
      // single partial window starting at 0 still selects one fingerprint)
      .filter(col("pos") <= greatest(col("n_grams") - w, lit(0)))
      // unpack with bit ops — a double division would lose exactness above
      // 2^53 (keys reach 2^60)
      .select(col("id"),
        col("sel").bitwiseAND(lit(PosPack - 1)).cast(IntegerType).as("pos"),
        shiftrightunsigned(col("sel"), 20).as("h"))
      .distinct()
  }

  /** Document pairs sharing ≥ `minShared` winnowing fingerprints, with the
    * shared count — the exact-substring-overlap candidate set.
    *
    * `maxDocFreq` (0 = off) stop-lists fingerprints present in more than
    * that many documents BEFORE the self-join — the skew guard: a
    * boilerplate fingerprint shared by f docs contributes f² candidate
    * rows and lands on one shuffle key, so at corpus scale ultra-common
    * fingerprints (license headers, templates) must be dropped. The cost
    * is one extra aggregation on the (already small) selected-fingerprint
    * relation; detection of genuinely rare shared spans is unaffected.
    */
  def sharedSpans(docs: DataFrame, id: Column, text: Column,
      k: Int = 4, w: Int = 4, minShared: Int = 3, maxDocFreq: Long = 0L): DataFrame = {
    val fpAll = fingerprints(docs, id, text, k, w).select(col("id"), col("h")).distinct()
    val fp =
      if (maxDocFreq <= 0) fpAll
      else {
        val rare = fpAll.groupBy(col("h"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDocFreq)
          .select(col("h"))
        // join moves the key column first — restore (id, h) order for the
        // positional toDF below
        fpAll.join(rare, Seq("h"), "left_semi").select(col("id"), col("h"))
      }
    fp.toDF("id_a", "h")
      .join(fp.toDF("id_b", "h"), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("id_a"), col("id_b"))
  }

  def qWinnowSpans(spark: SparkSession, dir: String): DataFrame =
    sharedSpans(table(spark, dir, "documents"), col("doc_id"), col("text"))
      .withColumnRenamed("id_a", "doc_a").withColumnRenamed("id_b", "doc_b")

  /** DuckDB replay: same packed-key argmin winnowing (40-bit md5 hash ·
    * 2^20 + pos), same window frame, same pair count.
    */
  val qWinnowSpansSql: String = {
    val (k, w, minShared) = (4, 4, 3)
    s"""WITH grams AS (
       |  SELECT doc_id, len(t) - ${k - 1} AS n_grams, u.pos, u.g
       |  FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(len(t) - ${k - 1}),
       |        i -> {'pos': i, 'g': array_to_string(t[i + 1:i + $k], ' ')})) AS u,
       |      t
       |    FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents))
       |), keyed AS (
       |  SELECT doc_id, pos, n_grams,
       |    CAST(concat('0x', substring(md5(g), 1, 10)) AS BIGINT) * 1048576 + pos AS key
       |  FROM grams
       |), sel AS (
       |  SELECT DISTINCT doc_id, s // 1048576 AS h
       |  FROM (
       |    SELECT doc_id, pos, n_grams,
       |      min(key) OVER (PARTITION BY doc_id ORDER BY pos
       |                     ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS s
       |    FROM keyed)
       |  WHERE pos <= greatest(n_grams - $w, 0)
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING count(*) >= $minShared
       |ORDER BY 1, 2""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_winnow_spans" -> (qWinnowSpans _))

  def oracle: Map[String, String] = Map("q_winnow_spans" -> qWinnowSpansSql)
}
