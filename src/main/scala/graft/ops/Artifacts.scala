package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import Tables.table

/** CANONICAL builder per serving-artifact key (ADVICE r11): every
  * [[graft.ServingIndexes]] key is defined by exactly ONE build function
  * here, and every query that serves the artifact calls the matching
  * `ensure*` — so two call sites can never silently pass diverging build
  * closures under the same key and serve a differently-built artifact
  * depending on execution order. The memoization itself (train-once per
  * (key, dataDir) per session, md5-named scratch path, serialized first
  * builds) stays in [[graft.ServingIndexes]]; this object only owns WHAT
  * each key's bytes are.
  *
  * Corpus conventions (shared by the batch queries, their oracles, and
  * the streaming gates): the plain `*-index` artifacts train over the
  * FULL table; the `*-refresh-index` artifacts train over the standing
  * split (id % 5 != 0) and append the ingest split (id % 5 == 0) via the
  * frozen-state O(batch) refresh writers; `dedup-lsh-index` and
  * `semdedup-ivf-index` train over the standing split only, because they
  * serve incremental gates that probe arrivals against a fixed corpus.
  */
object Artifacts {

  /** MinHash-LSH dedup index over the standing documents (doc_id % 5 != 0). */
  def ensureDedupLsh(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("dedup-lsh-index", dir) { d =>
      TextDedup.writeLshIndex(
        table(spark, dir, "documents").filter(pmod(col("doc_id"), lit(5)) =!= 0),
        col("doc_id"), col("text"), d,
        TextDedup.MinHashConfig(shingleK = Dedup.ShingleK))
    }

  /** IVF index over the standing embeddings (vec_id % 5 != 0), serving
    * the semantic-dedup incremental gate.
    */
  def ensureSemdedupIvf(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("semdedup-ivf-index", dir) { d =>
      VectorSearch.writeIvfIndex(
        table(spark, dir, "embeddings").filter(pmod(col("vec_id"), lit(5)) =!= 0),
        col("vec_id"), col("embedding"), d)
    }

  /** IVF ANN index over the full embeddings table. */
  def ensureIvf(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("ivf-index", dir) { d =>
      VectorSearch.writeIvfIndex(
        table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), d)
    }

  /** LSH ANN index over the full embeddings table. */
  def ensureLsh(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("lsh-index", dir) { d =>
      VectorSearch.writeLshIndex(
        table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), d)
    }

  /** PQ ANN index over the full embeddings table. */
  def ensurePq(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("pq-index", dir) { d =>
      VectorSearch.writePqIndex(
        table(spark, dir, "embeddings"), col("vec_id"), col("embedding"), d)
    }

  /** IVF index: standing-corpus train + frozen-centroid O(batch) append. */
  def ensureIvfRefresh(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("ivf-refresh-index", dir) { d =>
      val emb = table(spark, dir, "embeddings")
      VectorSearch.writeIvfIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) =!= 0), col("vec_id"), col("embedding"), d)
      VectorSearch.refreshIvfIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) === 0), col("vec_id"), col("embedding"), d)
    }

  /** LSH index: standing-corpus build + signature append. */
  def ensureLshRefresh(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("lsh-refresh-index", dir) { d =>
      val emb = table(spark, dir, "embeddings")
      VectorSearch.writeLshIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) =!= 0), col("vec_id"), col("embedding"), d)
      VectorSearch.refreshLshIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) === 0), col("vec_id"), col("embedding"), d)
    }

  /** PQ index: standing-corpus codebook train + frozen-codebook encode-append. */
  def ensurePqRefresh(spark: SparkSession, dir: String): String =
    graft.ServingIndexes.ensure("pq-refresh-index", dir) { d =>
      val emb = table(spark, dir, "embeddings")
      VectorSearch.writePqIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) =!= 0), col("vec_id"), col("embedding"), d)
      VectorSearch.refreshPqIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) === 0), col("vec_id"), col("embedding"), d)
    }
}
