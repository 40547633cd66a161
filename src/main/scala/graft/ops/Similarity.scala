package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._
import TextOps._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, 64-dim).
  *
  * Two paths:
  *  - [[qSimTopK]]: brute-force cosine top-k for a fixed query set —
  *    the exactness baseline, linear in corpus size per query (broadcast
  *    the queries, never the corpus).
  *  - [[qSimLshTopK]]: random-hyperplane (SimHash-for-vectors) LSH — the
  *    100 TB path: 16-bit signatures, multi-probe via 4-bit bands, exact
  *    re-rank within buckets only.
  */
object Similarity {

  val QueryIds: Seq[Long] = Seq(0L, 100L, 200L, 300L, 400L)
  val K = 10

  private def normalized(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))

  /** Brute-force cosine top-k: queries broadcast against a single corpus
    * scan; ranking deterministic on (rounded cosine desc, vec_id).
    */
  def qSimTopK(spark: SparkSession, dir: String): DataFrame = {
    val corpus = normalized(spark, dir)
    val queries = corpus
      .filter(col("vec_id").isin(QueryIds: _*))
      .toDF("q_vec_id", "q_embedding", "q_nrm")
    val scored = broadcast(queries)
      .join(corpus, col("vec_id") =!= col("q_vec_id"))
      .select(
        col("q_vec_id"), col("vec_id"),
        round(dot(col("q_embedding"), col("embedding")) / (col("q_nrm") * col("nrm")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy(col("q_vec_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select(col("q_vec_id"), col("rnk"), col("vec_id"), col("cos_sim"))
      .orderBy(col("q_vec_id"), col("rnk"))
  }

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

  // Random-hyperplane LSH: 16 planes → 16-bit signature; candidates share
  // at least one of four 4-bit bands; exact cosine re-rank inside buckets.
  val NumPlanes = 16
  val PlaneBands = 4
  val PlaneBits: Int = NumPlanes / PlaneBands
  val Dim = 64

  /** Deterministic ±1 hyperplanes (seeded) as a literal column matrix. */
  private lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(77070707L)
    Array.fill(NumPlanes, Dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** LSH-bucketed approximate top-k — same output schema as [[qSimTopK]]
    * plus it only ranks candidates that share a signature band with the
    * query. No SQL oracle (hyperplane constants live here); its recall vs
    * the brute-force baseline is asserted in SimilaritySpec.
    *
    * Scale: signatures are one narrow projection; the bucket join is
    * equi-key (band, value); per-bucket exact re-rank touches a tiny
    * candidate set. This is the shape that survives 100 TB / billions of
    * vectors (same as FAISS-style IVF but expressed relationally).
    */
  def qSimLshTopK(spark: SparkSession, dir: String): DataFrame = {
    val corpus = normalized(spark, dir)
    // signature bit j = sign(dot(plane_j, v))
    val planeCols = planes.zipWithIndex.map { case (p, j) =>
      val planeArr = array(p.map(lit): _*)
      when(dot(planeArr, col("embedding")) >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    val signed = corpus.withColumn("sig", planeCols.reduce((a, b) => a.bitwiseOR(b)))
    val bands = (0 until PlaneBands).map { k =>
      struct(lit(k).as("band"),
        shiftrightunsigned(col("sig"), k * PlaneBits).bitwiseAND(lit((1L << PlaneBits) - 1)).as("bv"))
    }
    val banded = signed
      .select(col("vec_id"), col("embedding"), col("nrm"), explode(array(bands: _*)).as("e"))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("e.band").as("band"), col("e.bv").as("bv"))

    val queries = banded
      .filter(col("vec_id").isin(QueryIds: _*))
      .toDF("q_vec_id", "q_embedding", "q_nrm", "band", "bv")
    val candidates = broadcast(queries)
      .join(banded, Seq("band", "bv"))
      .filter(col("vec_id") =!= col("q_vec_id"))
      .select(col("q_vec_id"), col("q_embedding"), col("q_nrm"),
        col("vec_id"), col("embedding"), col("nrm"))
      .distinct()

    val w = Window.partitionBy(col("q_vec_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    candidates
      .select(col("q_vec_id"), col("vec_id"),
        round(dot(col("q_embedding"), col("embedding")) / (col("q_nrm") * col("nrm")), 6).as("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select(col("q_vec_id"), col("rnk"), col("vec_id"), col("cos_sim"))
      .orderBy(col("q_vec_id"), col("rnk"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_topk" -> (qSimTopK _),
    "q_sim_lsh_topk" -> (qSimLshTopK _), // rows-only (no oracle)
  )

  def oracle: Map[String, String] = Map(
    "q_sim_topk" -> qSimTopKSql,
  )
}
