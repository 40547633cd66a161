package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps.{dot, norm}

/** Reusable vector-similarity operators over any DataFrame with an id +
  * `array<float|double>` embedding column ([[Similarity]] / [[Dedup]]
  * queries are thin bindings over the `embeddings` table).
  */
object VectorSearch {

  /** id/embedding/nrm normalized view. */
  private def withNorm(df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(id.as("id"), vec.as("v"), norm(vec).as("nrm"))

  /** All pairs with cosine ≥ threshold (brute force, broadcast-one-side).
    * O(n²) — exact baseline / verification shape; use [[lshTopK]]-style
    * bucketing at scale.
    */
  def cosinePairs(df: DataFrame, id: Column, vec: Column, threshold: Double): DataFrame = {
    val n = withNorm(df, id, vec)
    n.toDF("id_a", "va", "na")
      .join(n.toDF("id_b", "vb", "nb"), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Exact cosine top-k for a query subset: queries broadcast against one
    * corpus scan; deterministic on (rounded cosine desc, id).
    */
  def cosineTopK(df: DataFrame, id: Column, vec: Column, queryIds: Seq[Long], k: Int): DataFrame = {
    val corpus = withNorm(df, id, vec)
    val queries = corpus.filter(col("id").isin(queryIds: _*)).toDF("qid", "qv", "qn")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("id"))
    broadcast(queries)
      .join(corpus, col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("id"), col("cos_sim"))
      .orderBy(col("qid"), col("rnk"))
  }

  final case class IvfConfig(numCentroids: Int = 16, iters: Int = 3, nprobe: Int = 4)

  /** IVF-style ANN: coarse-quantize the corpus with k-means (Lloyd
    * iterations expressed as DataFrame jobs, deterministic init from the
    * smallest ids), then search only the `nprobe` nearest centroid buckets
    * per query with exact re-rank.
    *
    * Centroids are control-plane metadata (numCentroids × dim doubles) —
    * they live on the driver exactly like LSH planes; per-vector work stays
    * fully distributed. This is the FAISS-IVF shape expressed relationally;
    * at 100 TB the assignment column becomes the partition/bucket key of
    * the stored table.
    */
  def ivfTopK(df: DataFrame, id: Column, vec: Column, queryIds: Seq[Long], k: Int,
      cfg: IvfConfig = IvfConfig()): DataFrame = {
    val corpus = withNorm(df, id, vec).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def sqDistTo(c: Array[Double]): Column =
      TextOps.dot(col("v"), col("v")) - lit(2.0) * TextOps.dot(array(c.map(lit).toIndexedSeq: _*), col("v")) +
        lit(c.map(x => x * x).sum)
    // argmin via array functions — a when()-chain reduce would duplicate
    // the accumulator subtree per step (exponential expression size)
    def assignment(cents: Array[Array[Double]]): Column = {
      val dists = array(cents.map(sqDistTo).toIndexedSeq: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }

    // deterministic init: the numCentroids smallest-id vectors
    var centroids: Array[Array[Double]] = corpus.orderBy(col("id")).limit(cfg.numCentroids)
      .select(col("v")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    for (_ <- 1 to cfg.iters) {
      val means = corpus
        .select(assignment(centroids).as("c"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("c"), col("pos")).agg(avg(col("x")).as("m"))
        .collect()
      val byCluster = means.groupBy(_.getAs[Int]("c"))
      centroids = centroids.indices.map { j =>
        byCluster.get(j) match {
          case Some(rows) => rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("m")).toArray
          case None       => centroids(j) // empty cluster keeps its centroid
        }
      }.toArray
    }

    val assigned = corpus.withColumn("bucket", assignment(centroids))
    // nprobe nearest buckets per query vector
    def probeBuckets(cents: Array[Array[Double]]): Column = {
      val ds = cents.zipWithIndex.map { case (c, j) => struct(sqDistTo(c).as("d"), lit(j).as("j")) }
      slice(transform(array_sort(array(ds.toIndexedSeq: _*)), s => s("j")), 1, cfg.nprobe)
    }
    val queries = assigned
      .filter(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        explode(probeBuckets(centroids)).as("bucket"))

    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("id"))
    val result = broadcast(queries)
      .join(assigned, Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("id"), col("cos_sim"))
      .orderBy(col("qid"), col("rnk"))
      .localCheckpoint() // eager: run before releasing the corpus cache
    corpus.unpersist()
    result
  }

  /** ±1 hyperplane sign for (plane j, dim d): low bit of the first hex
    * nibble of `md5("plane:j:d")`. Derived from a hash rather than a seeded
    * PRNG so that ANY engine with an md5 function reproduces the planes —
    * the DuckDB oracle recomputes them from the same formula.
    */
  def planeSign(j: Int, d: Int): Int = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$j:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((digest(0) >> 4) & 1) == 1) 1 else -1
  }

  final case class LshConfig(numPlanes: Int = 32, bands: Int = 8, dim: Int = 64, quantBits: Int = 20) {
    require(numPlanes % bands == 0)
    val bitsPerBand: Int = numPlanes / bands
    val quantScale: Double = (1L << quantBits).toDouble
    lazy val planes: Array[Array[Double]] =
      Array.tabulate(numPlanes, dim)((j, d) => planeSign(j, d).toDouble)
  }

  /** Random-hyperplane LSH top-k: signature projection → band bucket join
    * → exact re-rank within buckets. The billions-of-vectors shape.
    *
    * Sign bits are taken over QUANTIZED components `floor(v_d * 2^quantBits)`
    * rather than the raw floats: every projection is then a sum of 64 exact
    * integers (|term| < 2^quantBits, sum < 2^(quantBits+6), well inside
    * double/long exactness), so the signature — and therefore the candidate
    * set — is bit-identical in any engine, which is what lets the DuckDB
    * oracle hash-match this query instead of a rows-only check.
    */
  def lshTopK(df: DataFrame, id: Column, vec: Column, queryIds: Seq[Long], k: Int,
      cfg: LshConfig = LshConfig()): DataFrame = {
    val corpus = withNorm(df, id, vec)
    val quantized = transform(col("v"),
      x => floor(x.cast("double") * lit(cfg.quantScale)).cast("double"))
    val planeCols = cfg.planes.zipWithIndex.map { case (p, j) =>
      when(dot(array(p.map(lit).toIndexedSeq: _*), col("xq")) >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    val signed = corpus.withColumn("xq", quantized)
      .withColumn("sig", planeCols.reduce((a, b) => a.bitwiseOR(b)))
      .drop("xq")
    val bands = (0 until cfg.bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("sig"), b * cfg.bitsPerBand)
          .bitwiseAND(lit((1L << cfg.bitsPerBand) - 1)).as("bv"))
    }
    val banded = signed
      .select(col("id"), col("v"), col("nrm"), explode(array(bands: _*)).as("e"))
      .select(col("id"), col("v"), col("nrm"), col("e.band").as("band"), col("e.bv").as("bv"))

    val queries = banded.filter(col("id").isin(queryIds: _*)).toDF("qid", "qv", "qn", "band", "bv")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("id"))
    broadcast(queries)
      .join(banded, Seq("band", "bv"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("qv"), col("qn"), col("id"), col("v"), col("nrm"))
      .distinct()
      .select(col("qid"), col("id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("id"), col("cos_sim"))
      .orderBy(col("qid"), col("rnk"))
  }
}
