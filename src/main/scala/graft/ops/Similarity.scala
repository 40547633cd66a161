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
    * integers → identical sign bits), same 8×4-bit banding (LshConfig:
    * 32 planes in 8 bands of 4), same rounded
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
    * path. Oracle-exact: the k-means runs in exact integer arithmetic (see
    * [[VectorSearch.ivfTopK]]), so DuckDB replays the identical Lloyd
    * iterations, bucket assignment, probe set, and re-ranked top-k.
    */
  def qSimIvfTopK(spark: SparkSession, dir: String): DataFrame =
    rename(VectorSearch.ivfTopK(
      table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), QueryIds, K))

  /** DuckDB replay of the integer k-means IVF pipeline: `cent<i>` holds
    * (sum-vector, count) centroids, each Lloyd iteration is one
    * dist→assign→recompute CTE block, and the scaled-integer distance
    * `sum((N·x − S)²) / N²` matches Spark's expanded `N²Σx² − 2NΣSx + ΣS²`
    * exactly because both are exact integer sums before the one division.
    */
  val qSimIvfTopKSql: String = {
    val cfg = VectorSearch.IvfConfig()
    val q = (1L << cfg.quantBits).toString
    def iteration(i: Int): String =
      s"""dist$i AS (
         |  SELECT xq.vec_id, c.j,
         |    CAST(sum((c.n * xq.x - c.s) * (c.n * xq.x - c.s)) AS DOUBLE)
         |      / CAST(max(c.n) * max(c.n) AS DOUBLE) AS dist
         |  FROM xq JOIN cent$i c USING (d) GROUP BY 1, 2
         |), assign$i AS (
         |  SELECT vec_id, j AS c FROM (
         |    SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
         |    FROM dist$i)
         |  WHERE rn = 1
         |), cent${i + 1} AS (
         |  SELECT m.j, m.d, m.s, m.n FROM (
         |    SELECT a.c AS j, xq.d, sum(xq.x) AS s, count(*) AS n
         |    FROM xq JOIN assign$i a USING (vec_id) GROUP BY 1, 2) m
         |  UNION ALL
         |  SELECT c.j, c.d, c.s, c.n FROM cent$i c
         |  WHERE c.j NOT IN (SELECT DISTINCT c FROM assign$i)
         |)""".stripMargin
    val f = cfg.iters // final centroid generation index
    s"""WITH xq AS (
       |  SELECT vec_id, d,
       |    CAST(floor(CAST(embedding[CAST(d + 1 AS INT)] AS DOUBLE) * $q) AS BIGINT) AS x
       |  FROM embeddings CROSS JOIN range(${cfg.dim}) rd(d)
       |), cent0 AS (
       |  SELECT j, d, x AS s, CAST(1 AS BIGINT) AS n FROM (
       |    SELECT vec_id, d, x, dense_rank() OVER (ORDER BY vec_id) - 1 AS j
       |    FROM xq
       |    WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT ${cfg.numCentroids}))
       |), ${(0 until cfg.iters).map(iteration).mkString(", ")},
       |distF AS (
       |  SELECT xq.vec_id, c.j,
       |    CAST(sum((c.n * xq.x - c.s) * (c.n * xq.x - c.s)) AS DOUBLE)
       |      / CAST(max(c.n) * max(c.n) AS DOUBLE) AS dist
       |  FROM xq JOIN cent$f c USING (d) GROUP BY 1, 2
       |), assignF AS (
       |  SELECT vec_id, j AS c FROM (
       |    SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
       |    FROM distF)
       |  WHERE rn = 1
       |), probe AS (
       |  SELECT vec_id AS q_vec_id, j AS bucket FROM (
       |    SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
       |    FROM distF WHERE vec_id IN (${QueryIds.mkString(", ")}))
       |  WHERE rn <= ${cfg.nprobe}
       |), cand AS (
       |  SELECT DISTINCT p.q_vec_id, a.vec_id
       |  FROM probe p JOIN assignF a ON a.c = p.bucket AND a.vec_id <> p.q_vec_id
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_topk" -> (qSimTopK _),
    "q_sim_lsh_topk" -> (qSimLshTopK _),
    "q_sim_ivf_topk" -> (qSimIvfTopK _),
  )

  def oracle: Map[String, String] = Map(
    "q_sim_topk" -> qSimTopKSql,
    "q_sim_lsh_topk" -> qSimLshTopKSql,
    "q_sim_ivf_topk" -> qSimIvfTopKSql,
  )
}
