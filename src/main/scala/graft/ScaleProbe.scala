package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize the ~10× scale-probe corpus from an sf0.1-shaped directory —
  * the in-engine port of the builder-side probe recipe (BASELINE.md round
  * 9), so the per-round [[Bench]] can measure sf1/sf0.1 ratios WITHOUT any
  * driver-side tooling and a super-linear regression fails loudly in the
  * emitted JSON instead of relying on a manual probe:
  *
  *  - lineitem ×10: per-replica orderkey offsets and partkey namespaces,
  *    with ~2% of parts kept in a SHARED hub namespace so the co-order
  *    graph stays one giant connected component instead of 10 disjoint
  *    copies;
  *  - documents ×10: per-replica token suffixes → disjoint shingle spaces
  *    (dup-rate and max-df invariant while the corpus grows 10×);
  *  - embeddings ×10: per-replica component rotation (within-replica
  *    geometry preserved, cross-replica decorrelated);
  *  - all other tables copied unchanged (dimensions don't scale with SF).
  *
  * Replica 0 is the identity, so every pinned query id (`QueryIds`,
  * Bm25QueryTerms anchors, …) still resolves at the probe scale.
  */
object ScaleProbe {

  val Replicas = 10

  private def reps(spark: SparkSession) =
    broadcast(spark.range(Replicas.toLong).toDF("k"))

  def synthesize(spark: SparkSession, srcDir: String, dstDir: String): Unit = {
    new java.io.File(dstDir).mkdirs()

    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    val maxOk = li.agg(max(col("l_orderkey"))).collect()(0).getLong(0) + 1
    val maxPk = li.agg(max(col("l_partkey"))).collect()(0).getLong(0) + 1
    li.crossJoin(reps(spark))
      .withColumn("l_orderkey", col("l_orderkey") + col("k") * maxOk)
      .withColumn("l_partkey",
        when(pmod(col("l_partkey"), lit(50)) === 0, col("l_partkey"))
          .otherwise(col("l_partkey") + col("k") * maxPk))
      .drop("k")
      .write.mode("overwrite").parquet(s"$dstDir/lineitem.parquet")

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val maxDoc = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
    docs.crossJoin(reps(spark))
      .withColumn("doc_id", col("doc_id") + col("k") * maxDoc)
      .withColumn("text",
        when(col("k") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_r"), col("k").cast("string")))))
      .drop("k")
      .write.mode("overwrite").parquet(s"$dstDir/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).limit(1).collect()(0).getInt(0)
    val maxVec = emb.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1
    emb.crossJoin(reps(spark))
      .withColumn("vec_id", col("vec_id") + col("k") * maxVec)
      .withColumn("embedding",
        when(col("k") === 0, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"), col("k") + 1, lit(dim) - col("k")),
            slice(col("embedding"), lit(1), col("k")))))
      .drop("k")
      .write.mode("overwrite").parquet(s"$dstDir/embeddings.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders", "events")
      .foreach { name =>
        val src = java.nio.file.Paths.get(s"$srcDir/$name.parquet")
        if (java.nio.file.Files.isRegularFile(src))
          java.nio.file.Files.copy(src,
            java.nio.file.Paths.get(s"$dstDir/$name.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        else // directory-shaped source: rewrite through the engine
          spark.read.parquet(src.toString)
            .write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
      }
  }
}
