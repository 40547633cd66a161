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

  final case class IvfConfig(numCentroids: Int = 16, iters: Int = 3, nprobe: Int = 4,
      quantBits: Int = 14, dim: Int = 64)

  /** A k-means centroid held EXACTLY as the integer component-sums of its
    * members plus the member count — the mean `S/N` is never materialized,
    * so no engine-specific floating-point rounding enters the iteration.
    */
  private final case class Centroid(s: Array[Long], n: Long)

  /** IVF-style ANN: coarse-quantize the corpus with k-means (Lloyd
    * iterations expressed as DataFrame jobs, deterministic init from the
    * smallest ids), then search only the `nprobe` nearest centroid buckets
    * per query with exact re-rank.
    *
    * Centroids are control-plane metadata (numCentroids × dim longs) — they
    * live on the driver exactly like LSH planes; per-vector work stays
    * fully distributed. This is the FAISS-IVF shape expressed relationally;
    * at 100 TB the assignment column becomes the partition/bucket key of
    * the stored table.
    *
    * The whole training loop is EXACT INTEGER arithmetic, making the
    * clustering bit-reproducible by any engine (the DuckDB oracle replays
    * it as chained CTEs): components quantize to `x_d = floor(v_d·2^quantBits)`,
    * a centroid is `(S, N)` (member component-sums + count), and the
    * squared distance to the mean `S/N`, scaled by `N²`, is the integer
    *   `D = N²·Σx² − 2N·Σ(S·x) + ΣS²  ( = N²·Σ(x − S/N)² )`.
    * Assignment compares `D/N²` after ONE double division each — every
    * input to the division is an exactly-computed integer, so the compared
    * doubles (and argmin tie-breaks on centroid index) are deterministic.
    * Magnitude envelope: |x| < 2^quantBits, so
    * `D ≤ N²·dim·(2·2^quantBits)² = N²·2^(2·quantBits+2)·dim` — with
    * quantBits=14, dim=64 that is `N²·2^36`, ANSI-safe in a long for
    * clusters up to N ≈ 2^13 (~8k) members; lower quantBits to trade
    * quantization resolution for cluster-size headroom (quantBits=10 →
    * N ≈ 2^17).
    */
  def ivfTopK(df: DataFrame, id: Column, vec: Column, queryIds: Seq[Long], k: Int,
      cfg: IvfConfig = IvfConfig()): DataFrame = {
    val scale = (1L << cfg.quantBits).toDouble
    // xq: integral-valued array<double> — VecDot accumulates integer
    // products whose partial sums stay < 2^53, so the double math is exact.
    val corpus = withNorm(df, id, vec)
      .withColumn("xq", transform(col("v"), x => floor(x.cast("double") * lit(scale)).cast("double")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // D/N² per centroid, every integer exact (see scaladoc envelope)
    def distTo(c: Centroid): Column = {
      val a2 = TextOps.dot(col("xq"), col("xq")).cast("long")         // Σx²
      val b = TextOps.dot(array(c.s.map(v => lit(v.toDouble)).toIndexedSeq: _*), col("xq"))
        .cast("long")                                                  // Σ(S·x)
      val c2 = c.s.map(v => v * v).sum                                 // ΣS²
      (lit(c.n * c.n) * a2 - lit(2 * c.n) * b + lit(c2)).cast("double") /
        lit((c.n * c.n).toDouble)
    }
    // argmin via array functions — a when()-chain reduce would duplicate
    // the accumulator subtree per step (exponential expression size);
    // array_position takes the FIRST minimum → ties break to the lowest j,
    // mirrored by ORDER BY dist, j in the oracle.
    def assignment(cents: Array[Centroid]): Column = {
      val dists = array(cents.map(distTo).toIndexedSeq: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }

    // deterministic init: the numCentroids smallest-id vectors as singletons
    var centroids: Array[Centroid] = corpus.orderBy(col("id")).limit(cfg.numCentroids)
      .select(col("xq")).collect()
      .map(r => Centroid(r.getSeq[Double](0).map(_.toLong).toArray, 1L))
    for (_ <- 1 to cfg.iters) {
      val sums = corpus
        .select(assignment(centroids).as("c"), posexplode(col("xq")).as(Seq("pos", "x")))
        .groupBy(col("c"), col("pos"))
        .agg(sum(col("x").cast("long")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getAs[Int]("c"))
      centroids = centroids.indices.map { j =>
        byCluster.get(j) match {
          case Some(rows) =>
            Centroid(rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("s")).toArray,
              rows.head.getAs[Long]("n"))
          case None => centroids(j) // empty cluster keeps its centroid
        }
      }.toArray
    }

    val assigned = corpus.withColumn("bucket", assignment(centroids))
    // nprobe nearest buckets per query vector (struct sort: dist, then j)
    def probeBuckets(cents: Array[Centroid]): Column = {
      val ds = cents.zipWithIndex.map { case (c, j) => struct(distTo(c).as("d"), lit(j).as("j")) }
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
