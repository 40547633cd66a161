package graft

import org.apache.spark.sql.functions._

import graft.ops.{Similarity, VectorSearch}

/** ScratchDirs lifecycle across driver rounds: one JVM may serve several
  * rounds (and the bench's sf1 probe serves a DIFFERENT corpus through the
  * same per-key directory), so the per-key handle must be stable and the
  * index writers' `mode("overwrite")` must fully replace the previous
  * round's artifact — a stale index from an earlier corpus would serve
  * silently wrong results.
  */
class ScratchDirsSpec extends SparkFunSuite {

  test("per-key handle is stable within a JVM") {
    val a = ScratchDirs("spec-stable-key")
    val b = ScratchDirs("spec-stable-key")
    assert(a == b)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(a)))
    assert(ScratchDirs("spec-other-key") != a)
  }

  test("index rebuild through the same key serves the NEW corpus, not the stale one") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpusA = emb.filter(col("vec_id") < 300)
    val corpusB = emb.filter(col("vec_id") >= 100) // different size AND content
    val qids = Seq(200L, 250L)
    val dir = ScratchDirs("spec-overwrite-ivf")

    VectorSearch.writeIvfIndex(corpusA, col("vec_id"), col("embedding"), dir)
    val servedA = VectorSearch.ivfTopKFromIndex(
      corpusA, col("vec_id"), col("embedding"), dir, qids, Similarity.K).collect().toSeq

    // second round through the SAME key: the overwrite must fully replace
    // centroids + buckets, and serving must match a fresh-directory build
    VectorSearch.writeIvfIndex(corpusB, col("vec_id"), col("embedding"), dir)
    val servedB = VectorSearch.ivfTopKFromIndex(
      corpusB, col("vec_id"), col("embedding"), dir, qids, Similarity.K).collect().toSeq
    val fresh = tmpDir("spec-fresh-ivf")
    VectorSearch.writeIvfIndex(corpusB, col("vec_id"), col("embedding"), fresh)
    val servedFresh = VectorSearch.ivfTopKFromIndex(
      corpusB, col("vec_id"), col("embedding"), fresh, qids, Similarity.K).collect().toSeq

    assert(servedB == servedFresh, "rebuild through the shared key diverged from a fresh build")
    assert(servedA != servedB, "fixture corpora too similar to detect staleness")
  }
}
