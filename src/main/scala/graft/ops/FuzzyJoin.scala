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

  /** END-TO-END ENTITY RESOLUTION — the record-linkage pipeline composed
    * from pieces this engine already owns: segment-blocked fuzzy pairs
    * ([[selfJoin]], candidate-complete for ≤ 2 edits) → connected
    * components ([[TextDedup.canonicalize]]: driver union-find under the
    * edge cap, large-star/small-star rounds past it) → one ENTITY row per
    * non-singleton cluster (canonical member = min id, its name, member
    * count). This is the dedup-the-catalog / master-data operator: "these
    * k near-identical part names are one product".
    *
    * Names map to stable ids (min p_partkey per distinct name — groups
    * are disjoint row sets, so the ids are unique) so the components pass
    * runs on longs, not strings.
    *
    * Scale: the pair stage is the PassJoin equi-join (never all-pairs),
    * the edge list is orders of magnitude smaller than the catalog, and
    * the entity projection is one aggregation over the label relation.
    */
  def qEntityResolution(spark: SparkSession, dir: String): DataFrame =
    resolveEntities(table(spark, dir, "part"), col("p_name"), col("p_partkey"), maxDist = 2)

  /** The table-agnostic core of [[qEntityResolution]]: any (name, row-id)
    * frame in, one `(entity_id, entity_name, n_members)` row per
    * non-singleton name cluster out.
    */
  def resolveEntities(df: DataFrame, name: Column, rowId: Column, maxDist: Int): DataFrame = {
    val names = df.select(name.as("s"), rowId.as("rid")).where(col("s").isNotNull)
      .groupBy(col("s")).agg(min(col("rid")).as("id"))
    val pairs = selfJoin(df, name, maxDist)
      .join(names.select(col("s").as("s_a"), col("id").as("id_a")), Seq("s_a"))
      .join(names.select(col("s").as("s_b"), col("id").as("id_b")), Seq("s_b"))
      .select(col("id_a"), col("id_b"))
    val labels = TextDedup.canonicalize(pairs, names.select(col("id")))
    labels.groupBy(col("canonical").as("entity_id"))
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > 1)
      .join(names.select(col("id").as("entity_id"), col("s").as("entity_name")), Seq("entity_id"))
      .select(col("entity_id"), col("entity_name"), col("n_members"))
      .orderBy(col("entity_id"))
  }

  val qEntityResolutionSql: String =
    """WITH RECURSIVE n AS (
      |  SELECT p_name AS s, min(p_partkey) AS id
      |  FROM part WHERE p_name IS NOT NULL GROUP BY 1
      |), pairs AS (
      |  SELECT a.id AS ia, b.id AS ib
      |  FROM n a JOIN n b ON a.s < b.s
      |  WHERE levenshtein(a.s, b.s) <= 2
      |), edges AS (
      |  SELECT ia AS src, ib AS dst FROM pairs
      |  UNION ALL SELECT ib AS src, ia AS dst FROM pairs
      |), walk(id, lbl) AS (
      |  SELECT id, id FROM n
      |  UNION
      |  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id
      |), labels AS (
      |  SELECT id, min(lbl) AS canonical FROM walk GROUP BY 1
      |)
      |SELECT l.canonical AS entity_id, n.s AS entity_name,
      |  CAST(count(*) AS BIGINT) AS n_members
      |FROM labels l JOIN n ON n.id = l.canonical
      |GROUP BY 1, 2 HAVING count(*) > 1
      |ORDER BY entity_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_join" -> (qFuzzyJoin _),
    "q_entity_resolution" -> (qEntityResolution _))

  def oracle: Map[String, String] = Map(
    "q_fuzzy_join" -> qFuzzyJoinSql,
    "q_entity_resolution" -> qEntityResolutionSql)
}
