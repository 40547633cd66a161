package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._
import TextOps._

/** Deduplication operators over the `documents` / `embeddings` tables —
  * the LLM-pipeline surface mandated by BASELINE.json: exact dedup, exact
  * n-gram Jaccard pairs, MinHash+LSH near-dup, SimHash, embedding-cosine
  * near-dup.
  *
  * 100 TB design notes per operator are on each method; the general shape:
  * everything is expressed as explode → hash-partitioned joins/aggregations
  * (no driver-side state, no collects), and the quadratic candidate
  * generation is bounded by LSH banding, never by an all-pairs join.
  */
object Dedup {

  val ShingleK = 3
  val JaccardThreshold = 0.8

  private def docShingles(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= ShingleK)
      .select(col("doc_id"), explode(shingleSet(col("t"), ShingleK)).as("s"))
      // referenced 3-4× per query (sizes + both join sides); persist so the
      // tokenize+shingle scan runs once. At 100 TB this materializes to a
      // shuffle-stage output / checkpoint table instead of executor memory.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Exact dedup: deterministic survivor = min doc_id per identical text.
    * Scale: a single hash aggregation on a fingerprint; at 100 TB group by
    * `md5(text)` instead of raw text to keep shuffle rows small — here we
    * group by text and emit the fingerprint, which the oracle mirrors.
    */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), md5(col("text")).as("fp"), col("n_copies"))
      .orderBy(col("doc_id"))

  val qDedupExactSql: String =
    """SELECT min(doc_id) AS doc_id, md5(text) AS fp, count(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin

  /** Exact n-gram (3-word-shingle) Jaccard near-dup pairs via an inverted
    * shingle index: explode distinct shingles, self-join on shingle,
    * count commons, J = |∩| / (|A|+|B|-|∩|).
    *
    * Scale: the self-join key is the shingle — frequency-skewed shingles
    * blow up candidate pairs, so at 100 TB this exact variant is only for
    * within-bucket verification; [[qDedupMinhashLsh]] is the scale path.
    */
  def qDedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.toDF("da", "s")
    val b = sh.toDF("db", "s")
    val commons = a.join(b, Seq("s")).filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("common"))
    pairJaccard(commons, sizes)
  }

  /** candidate (da, db, common) + per-doc sizes → thresholded Jaccard rows */
  private def pairJaccard(commons: DataFrame, sizes: DataFrame): DataFrame =
    commons
      .join(sizes.toDF("da", "na"), Seq("da"))
      .join(sizes.toDF("db", "nb"), Seq("db"))
      .select(
        col("da"), col("db"),
        // single IEEE division of exact ints — bit-identical across engines,
        // no rounding needed (rounding would ADD half-tie divergence)
        (col("common").cast(DoubleType) /
          (col("na") + col("nb") - col("common")).cast(DoubleType)).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy(col("da"), col("db"))

  val qDedupNgramSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(len(t) - ${ShingleK - 1}),
       |    i -> array_to_string(t[i+1:i+$ShingleK], ' ')))) AS s
       |  FROM tok WHERE len(t) >= $ShingleK
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
       |), commons AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT da, db,
       |  CAST(common AS DOUBLE) / CAST(x.n + y.n - common AS DOUBLE) AS jaccard
       |FROM commons JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
       |WHERE CAST(common AS DOUBLE) / CAST(x.n + y.n - common AS DOUBLE) >= $JaccardThreshold
       |ORDER BY da, db""".stripMargin

  // MinHash configuration: 64 hashes = 16 bands × 4 rows.
  // P(candidate | J) = 1-(1-J^4)^16 → 0.9998 at J=0.8, ~1-1e-15 at J=0.97.
  val NumHashes = 64
  val NumBands = 16
  val RowsPerBand: Int = NumHashes / NumBands

  /** Modulus for the affine min-hash family: prime ~2^30 so `a*x + b`
    * stays well under 2^63 (Spark 4 ANSI mode errors on long overflow, so
    * wraparound hashing is out).
    */
  val HashPrime = 1000000007L

  /** Deterministic affine coefficients over the base shingle hash mod p. */
  private val hashCoefs: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(20260812L)
    Array.fill(NumHashes)(
      (1L + math.floorMod(rnd.nextLong(), HashPrime - 1), math.floorMod(rnd.nextLong(), HashPrime)))
  }

  /** MinHash signature + LSH banding near-dup detection, with exact-Jaccard
    * verification of candidates — final semantics identical to
    * [[qDedupNgramJaccard]] (same oracle), but candidate generation is
    * O(docs × bands) instead of an inverted-index self-join.
    *
    * Scale: this is THE 100 TB text-dedup shape — signatures are one
    * aggregation over exploded shingles (64 mins, map-side combined),
    * banding multiplies rows by 16, the bucket self-join only pairs docs
    * sharing a band value, and exact verification touches candidates only.
    */
  def qDedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir)
    val hashed = sh.select(col("doc_id"),
      pmod(xxhash64(col("s")), lit(HashPrime)).as("base"))
    // whole 64-hash signature in ONE typed-imperative aggregate buffer —
    // 64 separate min() columns blow Spark's codegen field limit and
    // de-codegen the entire stage (see graft.functions.MinHashAgg)
    val sig = hashed.groupBy(col("doc_id"))
      .agg(graft.functions.MinHashAgg(
        col("base"), hashCoefs.map(_._1), hashCoefs.map(_._2), HashPrime).as("sig"))

    val bandStructs = (0 until NumBands).map { bd =>
      struct(
        lit(bd).as("band"),
        xxhash64((0 until RowsPerBand).map(r =>
          element_at(col("sig"), bd * RowsPerBand + r + 1)): _*).as("bv"))
    }
    val banded = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bv").as("bv"))

    val candidates = banded.toDF("da", "band", "bv")
      .join(banded.toDF("db", "band", "bv"), Seq("band", "bv"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"))
      .distinct()

    // exact verification restricted to candidates
    val a = sh.toDF("da", "s")
    val b = sh.toDF("db", "s")
    val commons = candidates
      .join(a, Seq("da"))
      .join(b, Seq("db", "s"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("common"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    pairJaccard(commons, sizes)
  }

  // SimHash configuration: 64-bit, 4 blocks of 16 bits; Hamming ≤ 6 pairs
  // must agree on at least one block only if distance ≤ 3 blocks differ —
  // with ≤ 6 differing bits spread across 4 blocks, a colliding block is
  // guaranteed only for ≤ 3; we verify with bit_count and keep ≤ 6.
  val SimhashHammingMax = 6

  /** SimHash near-dup pairs: 64-bit sign-of-weighted-token-hash signature,
    * candidates from 16-bit block collisions, verified by exact Hamming
    * distance. Hash-dependent → no SQL oracle (driver records rows-only);
    * determinism is guaranteed by fixed hashing + total ORDER BY.
    *
    * Scale: signature = one aggregation over (doc, token, count); candidate
    * join fans out ×4 on block values — never all-pairs.
    */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("base", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(
        (shiftrightunsigned(col("base"), j).bitwiseAND(lit(1L)) * 2 - 1) * col("cnt")
      ).as(s"b$j")
    }
    val agg = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    val sigs = agg.select(col("doc_id"), simhash.as("sim"))

    val blocks = (0 until 4).map { k =>
      struct(lit(k).as("blk"), shiftrightunsigned(col("sim"), k * 16).bitwiseAND(lit(0xffffL)).as("bv"))
    }
    val banded = sigs
      .select(col("doc_id"), col("sim"), explode(array(blocks: _*)).as("e"))
      .select(col("doc_id"), col("sim"), col("e.blk").as("blk"), col("e.bv").as("bv"))

    banded.toDF("da", "sim_a", "blk", "bv")
      .join(banded.toDF("db", "sim_b", "blk", "bv"), Seq("blk", "bv"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= SimhashHammingMax)
      .orderBy(col("da"), col("db"))
  }

  val CosineThreshold = 0.45

  /** Embedding-cosine near-dup pairs (brute force all-pairs with a
    * broadcast side). Scale path: replace the all-pairs join with the
    * random-hyperplane LSH bucketing in [[Similarity.qSimLshTopK]] —
    * all-pairs is O(n²) and only correct as a verification/oracle shape.
    */
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val a = emb.toDF("va", "ea", "na")
    val b = emb.toDF("vb", "eb", "nb")
    a.join(b, col("va") < col("vb"))
      .select(
        col("va"), col("vb"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= CosineThreshold)
      .orderBy(col("va"), col("vb"))
  }

  val qDedupEmbeddingSql: String =
    s"""WITH n AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings
       |)
       |SELECT a.vec_id AS va, b.vec_id AS vb,
       |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
       |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (a.nrm * b.nrm), 6) AS cos_sim
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
       |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (a.nrm * b.nrm), 6) >= $CosineThreshold
       |ORDER BY va, vb""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_ngram_jaccard" -> (qDedupNgramJaccard _),
    "q_dedup_minhash_lsh" -> (qDedupMinhashLsh _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_dedup_embedding" -> (qDedupEmbedding _),
  )

  def oracle: Map[String, String] = Map(
    "q_dedup_exact" -> qDedupExactSql,
    "q_dedup_ngram_jaccard" -> qDedupNgramSql,
    // MinHash+LSH has the same final semantics as the exact pair query —
    // LSH recall at J≥0.8 is 1-2e-4 (and ~1 for the J≥0.97 pairs present).
    "q_dedup_minhash_lsh" -> qDedupNgramSql,
    // q_dedup_simhash: hash-function-dependent → rows-only check.
    "q_dedup_embedding" -> qDedupEmbeddingSql,
  )
}
