package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** ANN queries over the `embeddings` table — thin bindings of
  * [[VectorSearch]] (which accepts any DataFrame + columns).
  */
object Similarity {

  val QueryIds: Seq[Long] = Seq(0L, 100L, 200L, 300L, 400L)
  val K = 10

  private def rename(df: DataFrame): DataFrame =
    df.withColumnRenamed("qid", "q_vec_id").withColumnRenamed("id", "vec_id")

  /** Brute-force cosine top-k (exactness baseline; linear per query). */
  def qSimTopK(spark: SparkSession, dir: String): DataFrame =
    rename(VectorSearch.cosineTopK(
      table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), QueryIds, K))

  val qSimTopKSql: String =
    s"""WITH n AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings
       |), p AS (
       |  SELECT q.vec_id AS q_vec_id, v.vec_id,
       |    round(list_sum(list_transform(list_zip(q.embedding, v.embedding),
       |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) / (q.nrm * v.nrm), 6) AS cos_sim
       |  FROM n q JOIN n v ON v.vec_id <> q.vec_id
       |  WHERE q.vec_id IN (${QueryIds.mkString(", ")})
       |), r AS (
       |  SELECT p.*, row_number() OVER (PARTITION BY q_vec_id ORDER BY cos_sim DESC, vec_id) AS rnk
       |  FROM p
       |)
       |SELECT q_vec_id, rnk, vec_id, cos_sim FROM r WHERE rnk <= $K
       |ORDER BY q_vec_id, rnk""".stripMargin

  /** Random-hyperplane LSH top-k — the scale path. Oracle-exact: planes are
    * md5-derived and projections integer-quantized (see
    * [[VectorSearch.lshTopK]]), so DuckDB recomputes the identical
    * signatures, candidate set, and re-ranked top-k.
    */
  def qSimLshTopK(spark: SparkSession, dir: String): DataFrame =
    rename(VectorSearch.lshTopK(
      table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), QueryIds, K))

  /** DuckDB mirror of the full LSH pipeline: same md5-derived ±1 planes,
    * same `floor(v_d * 2^20)` quantization (every projection an exact sum of
    * integers → identical sign bits), same 4×4-bit banding, same rounded
    * cosine re-rank.
    */
  val qSimLshTopKSql: String = {
    val cfg = VectorSearch.LshConfig()
    val q = (1L << cfg.quantBits).toString
    s"""WITH planes AS (
       |  SELECT j, d,
       |    CASE WHEN CAST(concat('0x', substring(md5(concat('plane:', j, ':', d)), 1, 1)) AS INT) & 1 = 1
       |         THEN 1 ELSE -1 END AS s
       |  FROM range(${cfg.numPlanes}) pj(j) CROSS JOIN range(${cfg.dim}) pd(d)
       |), xq AS (
       |  SELECT vec_id, d,
       |    CAST(floor(CAST(embedding[CAST(d + 1 AS INT)] AS DOUBLE) * $q) AS BIGINT) AS x
       |  FROM embeddings CROSS JOIN range(${cfg.dim}) rd(d)
       |), sig AS (
       |  SELECT vec_id,
       |    sum(CASE WHEN p >= 0 THEN CAST(1 AS BIGINT) << CAST(j AS INT) ELSE CAST(0 AS BIGINT) END) AS sig
       |  FROM (SELECT x.vec_id, p.j, sum(p.s * x.x) AS p
       |        FROM xq x JOIN planes p USING (d) GROUP BY 1, 2)
       |  GROUP BY 1
       |), banded AS (
       |  SELECT vec_id, b, (sig >> CAST(b * ${cfg.bitsPerBand} AS INT)) & ${(1L << cfg.bitsPerBand) - 1} AS bv
       |  FROM sig CROSS JOIN range(${cfg.bands}) rb(b)
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS q_vec_id, c.vec_id
       |  FROM banded q JOIN banded c ON q.b = c.b AND q.bv = c.bv AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id IN (${QueryIds.mkString(", ")})
       |), n AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings
       |), p AS (
       |  SELECT cand.q_vec_id, cand.vec_id,
       |    round(list_sum(list_transform(list_zip(q.embedding, v.embedding),
       |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) / (q.nrm * v.nrm), 6) AS cos_sim
       |  FROM cand JOIN n q ON q.vec_id = cand.q_vec_id JOIN n v ON v.vec_id = cand.vec_id
       |), r AS (
       |  SELECT p.*, row_number() OVER (PARTITION BY q_vec_id ORDER BY cos_sim DESC, vec_id) AS rnk
       |  FROM p
       |)
       |SELECT q_vec_id, rnk, vec_id, cos_sim FROM r WHERE rnk <= $K
       |ORDER BY q_vec_id, rnk""".stripMargin
  }

  /** IVF (k-means coarse quantization, nprobe=4) top-k — the second scale
    * path; rows-only (centroids are code-side metadata), recall asserted in
    * OpsSpec.
    */
  def qSimIvfTopK(spark: SparkSession, dir: String): DataFrame =
    rename(VectorSearch.ivfTopK(
      table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), QueryIds, K))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_topk" -> (qSimTopK _),
    "q_sim_lsh_topk" -> (qSimLshTopK _),
    "q_sim_ivf_topk" -> (qSimIvfTopK _), // rows-only (no oracle)
  )

  def oracle: Map[String, String] = Map(
    "q_sim_topk" -> qSimTopKSql,
    "q_sim_lsh_topk" -> qSimLshTopKSql,
  )
}
