package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming quality-classifier gate — the arrival-time face of the
  * stored NB model ([[graft.ops.Artifacts.ensureQualityNb]]): every
  * arriving document is scored against the FROZEN weight table and leaves
  * with its integer mean-token-lift score and pos/neg verdict. The score
  * is a pure function of (arrival, stored model) — arrivals never pair
  * with each other and nothing retrains — so the streamed verdict table
  * equals the one-shot batch scoring of the whole feed under any trigger
  * split (spec-pinned), the same stream==batch argument as the intake
  * gate.
  *
  * Scale: per batch, one broadcast of the vocab-sized weight table into
  * the batch token stream + one per-doc aggregate; no state beyond the
  * stored artifact, so a restart resumes from the checkpoint with
  * nothing to rebuild.
  */
object QualityServeStream {

  /** Per-document scores (doc_id, n_toks, score_micro, verdict) of one
    * batch against the stored model at `modelDir`.
    */
  def scoreBatch(spark: SparkSession, batch: DataFrame, modelDir: String): DataFrame = {
    val weights = spark.read.parquet(s"$modelDir/weights.parquet")
    val totals = spark.read.parquet(s"$modelDir/totals.parquet")
    batch
      .select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .join(broadcast(weights), Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        coalesce(col("w_micro"),
          expr("((tot_neg + v) * 1000000) DIV (tot_pos + v)")).as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("sum_w"))
      .select(col("doc_id"), col("n_toks"),
        expr("sum_w DIV n_toks").as("score_micro"))
      .withColumn("verdict",
        when(col("score_micro") >= 1000000L, "pos").otherwise("neg"))
  }

  /** Run the gate over `docDir` (documents-shaped arrival files) and
    * return the accumulated per-document verdict rows.
    */
  def run(spark: SparkSession, docDir: String, checkpoint: String,
      modelDir: String): DataFrame = {
    @volatile var results: Option[DataFrame] = None
    val q = spark.readStream
      .schema(IngestDedup.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(docDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val scored = scoreBatch(spark, batch, modelDir).localCheckpoint()
        results = Some(results.fold(scored)(_.unionByName(scored).localCheckpoint()))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    results.getOrElse(scoreBatch(spark,
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        IngestDedup.docSchema), modelDir))
  }
}
