package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Pins centroid-statistics semantics on planted clusters (the oracle gate
  * sees only the synthetic table): orthogonal/overlapping centroid cosines
  * and the within-cluster outlier ranking.
  */
class EmbedStatsSpec extends SparkFunSuite {

  private def write(dir: String, rows: Seq[(Long, Seq[Float], Int)]): Unit = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("centroid cosine: orthogonal clusters score 0, half-shared cluster scores 1/sqrt(2)") {
    val e1 = Seq(1f, 0f, 0f, 0f)
    val e2 = Seq(0f, 1f, 0f, 0f)
    val dir = tmpDir("embed-centroids")
    write(dir, Seq(
      (1L, e1, 0), (2L, e1, 0),
      (3L, e2, 1), (4L, e2, 1),
      (5L, e1, 2), (6L, e2, 2)))
    val out = EmbedStats.qEmbedCentroids(spark, dir).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(out((0, 1)) === 0.0)
    assert(out((0, 2)) === 0.707107)
    assert(out((1, 2)) === 0.707107)
  }

  test("outliers: the planted far point ranks first in its cluster") {
    val near = Seq(0f, 0f, 0f, 0f)
    val far = Seq(1f, 1f, 1f, 1f)
    val dir = tmpDir("embed-outliers")
    write(dir, (1L to 9L).map(i => (i, near, 0)) :+ (10L, far, 0))
    val out = EmbedStats.qEmbedOutliers(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.head._3 === 10L, "far vector must rank 1")
    // exact integer statistic: far point dev = (10*16384 - 16384)^2 per dim
    val expectFar = 4L * 147456L * 147456L
    assert(out.head._4 === expectFar)
    // near points tie; ties break to the smaller vec_id
    assert(out.map(_._2) === Seq(1L, 2L, 3L))
    assert(out(1)._3 === 1L && out(2)._3 === 2L)
  }

  test("pc1: power iteration finds the planted dominant axis and ranks its poles") {
    // Variance lives on axis 0 (+-1); axis 1 carries only +-0.1 noise.
    val dir = tmpDir("embed-pc1")
    val rows = (0L until 10L).map { i =>
      val sign = if (i % 2 == 0) 1f else -1f
      (i, Seq(sign, 0.1f * (if (i % 3 == 0) 1 else -1), 0f, 0f), 0)
    } ++ Seq((10L, Seq(0f, 0.2f, 0f, 0f), 1), (11L, Seq(0f, -0.2f, 0f, 0f), 1))
    write(dir, rows)
    val out = EmbedStats.qEmbedPc1(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // the positive-pole axis-0 vectors outscore everything else and rank
    // by vec_id among equals; axis-1-only vectors sit near zero
    val scores = out.toMap
    val posPole = (0L until 10L).filter(_ % 2 == 0)
    assert(posPole.forall(i => scores.contains(i)))
    val posScores = posPole.map(scores)
    assert(posScores.distinct.size <= 2, "pole scores nearly identical (noise dim only)")
    assert(out.take(5).map(_._1).forall(_ % 2 == 0), "top 5 are the + pole")
    assert(out.head._2 > 0L)
    // axis-1 noise vectors never outrank an axis-0 pole vector
    assert(!out.take(5).map(_._1).exists(Seq(10L, 11L).contains))
  }

  test("envelope guard: raises past the ceiling instead of silently wrapping, passes within it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((5L, 3L), (9000L, 4L)).toDF("n", "x")
    val guarded = EmbedStats.envelopeGuard(col("n"), EmbedStats.OutlierMaxMembers,
      "embed outliers: cluster size", "drop quantBits")(col("x") * col("x"))
    val ok = df.filter(col("n") === 5L).select(guarded.as("v")).collect()
    assert(ok.map(_.getLong(0)).toSeq === Seq(9L))
    val e = intercept[Exception] {
      df.select(guarded.as("v")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("exceeds the exact-integer envelope")), e.toString)
  }

  test("centroid norms are envelope-guarded against oversized labels (round-11 audit)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the suite's closest envelope: Σ_d s² wraps past ~2^14.5 members —
    // the guard must trip on the label size, not wrap silently
    val df = Seq((EmbedStats.CentroidMaxMembers + 1, 7L)).toDF("n", "s")
    val guarded = EmbedStats.envelopeGuard(col("n"), EmbedStats.CentroidMaxMembers,
      "embed centroids: label size", "lift s to DECIMAL(38,0)")(col("s") * col("s"))
    val e = intercept[Exception] { df.select(guarded.as("v")).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("embed centroids: label size")), e.toString)
    // the real corpus sits inside the envelope: the query still runs
    assert(EmbedStats.qEmbedCentroids(spark, "/root/testdata/sf0.001").count() > 0)
  }
}
