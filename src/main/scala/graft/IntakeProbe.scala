package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Pipeline, TextDedup}
import graft.ops.Tables.table
import graft.ops.TextOps.tokens

/** Corpus-independence probe for the intake cascade (VERDICT r11 item 5):
  * [[graft.ops.Pipeline.intakeBatch]] claims per-arrival cost independent
  * of the standing corpus, but the per-round sf1 probe scales corpus AND
  * arrivals together (10.28× at 10× was "linear in its 10× feed" — it
  * never isolated the corpus term). This main FIXES the arrival batch
  * (the sf0.1 arrival split) and scales only the corpus (sf0.1 → the
  * synthesized sf1), with every standing artifact — LSH index, IVF
  * index, fingerprint store, benchmark gram set — built OUTSIDE the
  * timed region (they are train-once artifacts; the claim is about the
  * serving path). A flat pair of timings validates the claim; a ~10×
  * pair means a probe stage reads corpus-sized data per batch.
  *
  * Prints one JSON line
  * `{"metric":"intake_probe","fixed_arrival_secs":{"sf0.1":a,"sf1":b},
  *   "corpus_ratio":r}`. Run: `SPARK_GRAFT_CPUS=32 sbt "runMain
  * graft.IntakeProbe"` (expects /tmp/graft-sf1 from a prior bench run).
  */
object IntakeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf1")
    if (!ScaleProbe.isSynthesized(sf01, sf1, ScaleProbe.AllTables))
      ScaleProbe.synthesize(spark, sf01, sf1)

    // FIXED arrival batch: the sf0.1 arrival split, shared by both runs
    val arrivals = table(spark, sf01, "documents")
      .filter(pmod(col("doc_id"), lit(5)) === 0).localCheckpoint()

    def timeAt(dir: String): Double = {
      val docs = table(spark, dir, "documents")
      val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val emb = table(spark, dir, "embeddings")
      val corpusEmb = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val lshDir = graft.ops.Artifacts.ensureDedupLsh(spark, dir)
      val ivfDir = graft.ops.Artifacts.ensureSemdedupIvf(spark, dir)
      // standing relations a production intake serves from stores: built
      // + materialized OUTSIDE the timed region
      val corpusFps = corpus
        .select(md5(concat_ws(" ", tokens(col("text")))).as("fp"))
        .localCheckpoint()
      val benchSh = TextDedup.shingles(
        corpus.filter(pmod(col("doc_id"), lit(7)) === 0),
        col("doc_id"), col("text"), Dedup.ShingleK)
      val benchGrams = benchSh.select(col("s")).distinct().localCheckpoint()
      benchSh.unpersist()
      // no Caches.releaseAll here — it would drop the localCheckpoint
      // blocks of the standing relations this probe just staged
      System.gc()
      val t0 = System.nanoTime()
      Pipeline.intakeBatch(arrivals, corpusFps, lshDir, emb, corpusEmb, ivfDir, benchGrams)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val a = timeAt(sf01)
    val b = timeAt(sf1)
    println(s"""{"metric":"intake_probe","fixed_arrival_secs":{"sf0.1":${sec(a)},"sf1":${sec(b)}},"corpus_ratio":${sec(b / math.max(a, 1e-3))}}""")
    spark.stop()
  }
}
