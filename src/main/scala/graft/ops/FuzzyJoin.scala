package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/** Similarity (edit-distance) self-join — the entity-resolution /
  * data-cleaning operator: all string pairs within Levenshtein distance
  * `maxDist`, WITHOUT the quadratic all-pairs compare.
  *
  * Candidate generation is PassJoin-style pigeonhole segment blocking:
  * split every string into `maxDist+1` contiguous segments — an edit
  * script of ≤ maxDist edits cannot touch all of them, so for any
  * qualifying pair (s, t) at least one segment of s appears EXACTLY in t,
  * at a position shifted by at most maxDist (net insertions/deletions
  * before it). One side therefore emits its own segments, the other emits
  * every substring that could match a segment of a partner whose length is
  * within maxDist of its own — an equi-join on (segment index, assumed
  * length, substring) yields a CANDIDATE-COMPLETE set, and every candidate
  * is verified with the exact distance. The oracle is the brute-force
  * levenshtein join, so the hash match PROVES the blocking loses no pair.
  *
  * Scale: the blocking turns an O(n²) nested-loop into an equi-join
  * shuffled on short segment keys — per string the fan-out is
  * `(k+1)·(2k+1)²` probe rows (k=2 → 75), constant in corpus size; the
  * verify touches candidates only. Boilerplate segments (common prefixes)
  * skew the join key like every inverted index here — stop-list or
  * salt them at corpus scale (same note as the shingle index).
  */
object FuzzyJoin {

  /** All unordered pairs of `str` values within `maxDist` edits:
    * `(s_a, s_b, dist)`, canonicalized `s_a < s_b`.
    */
  def selfJoin(df: DataFrame, str: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val k = maxDist
    val nseg = k + 1
    val strings = df.select(str.as("s")).where(col("s").isNotNull).distinct()

    // segment i of an ℓ-length string spans [floor(iℓ/n), floor((i+1)ℓ/n))
    def segStart(i: Column, len: Column): Column = floor(i * len / nseg).cast(IntegerType)

    val idxSeq = sequence(lit(0), lit(k))
    val segSide = strings
      .select(col("s"),
        explode(transform(idxSeq, i => struct(
          i.cast(IntegerType).as("i"),
          length(col("s")).as("l"),
          col("s").substr(segStart(i, length(col("s"))) + 1,
            segStart(i + 1, length(col("s"))) - segStart(i, length(col("s")))).as("seg")
        ))).as("e"))
      .select(col("s").as("sa"), col("e.i").as("i"), col("e.l").as("l"), col("e.seg").as("seg"))

    // probe side: for every assumed partner length ℓ within ±k of its own,
    // every segment index, every position shift δ in [-k, k]
    val probeSide = strings
      .select(col("s"),
        explode(flatten(transform(
          sequence(length(col("s")) - k, length(col("s")) + k), l =>
            flatten(transform(idxSeq, i =>
              transform(sequence(lit(-k), lit(k)), d => struct(
                i.cast(IntegerType).as("i"),
                l.cast(IntegerType).as("l"),
                col("s").substr(
                  greatest(segStart(i, l) + d, lit(0)) + 1,
                  segStart(i + 1, l) - segStart(i, l)).as("seg")
              ))))))).as("e"))
      .select(col("s").as("sb"), col("e.i").as("i"), col("e.l").as("l"), col("e.seg").as("seg"))

    segSide
      .join(probeSide, Seq("i", "l", "seg"))
      .filter(col("sa") =!= col("sb"))
      .select(least(col("sa"), col("sb")).as("s_a"),
        greatest(col("sa"), col("sb")).as("s_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast(LongType))
      .filter(col("dist") <= k)
      .orderBy(col("s_a"), col("s_b"))
  }

  /** Part names within 2 edits of each other — near-duplicate catalog
    * entries. Oracle = brute-force levenshtein join (semantic spec); the
    * hash match proves segment blocking found every pair.
    */
  def qFuzzyJoin(spark: SparkSession, dir: String): DataFrame =
    selfJoin(table(spark, dir, "part"), col("p_name"), maxDist = 2)
      .withColumnRenamed("s_a", "name_a").withColumnRenamed("s_b", "name_b")

  val qFuzzyJoinSql: String =
    """WITH n AS (SELECT DISTINCT p_name AS s FROM part WHERE p_name IS NOT NULL)
      |SELECT a.s AS name_a, b.s AS name_b,
      |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
      |FROM n a JOIN n b ON a.s < b.s
      |WHERE levenshtein(a.s, b.s) <= 2
      |ORDER BY name_a, name_b""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_fuzzy_join" -> (qFuzzyJoin _))

  def oracle: Map[String, String] = Map("q_fuzzy_join" -> qFuzzyJoinSql)
}
