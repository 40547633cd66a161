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

  /** Random-hyperplane LSH top-k — the scale path; no SQL oracle (plane
    * constants live in code), recall vs brute force asserted in OpsSpec.
    */
  def qSimLshTopK(spark: SparkSession, dir: String): DataFrame =
    rename(VectorSearch.lshTopK(
      table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), QueryIds, K))

  /** IVF (k-means coarse quantization, nprobe=4) top-k — the second scale
    * path; rows-only (centroids are code-side metadata), recall asserted in
    * OpsSpec.
    */
  def qSimIvfTopK(spark: SparkSession, dir: String): DataFrame =
    rename(VectorSearch.ivfTopK(
      table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), QueryIds, K))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_topk" -> (qSimTopK _),
    "q_sim_lsh_topk" -> (qSimLshTopK _), // rows-only (no oracle)
    "q_sim_ivf_topk" -> (qSimIvfTopK _), // rows-only (no oracle)
  )

  def oracle: Map[String, String] = Map(
    "q_sim_topk" -> qSimTopKSql,
  )
}
