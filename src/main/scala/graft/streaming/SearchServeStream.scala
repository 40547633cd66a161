package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming BM25 search serving over a PERSISTED inverted index — the
  * text-search sibling of [[VectorServeStream]]: search REQUESTS
  * `(qid, term)` stream in (one row per query term), and each micro-batch
  * serves its queries' top-k from the stored postings/df/dl/tot relations
  * via the exact batch path
  * ([[graft.ops.TextAnalysis.bm25TopKFromIndex]]).
  *
  * Each query's result is a deterministic function of its term set and
  * the static index, so serving batch-by-batch equals the one-shot batch
  * serve of every query — the property the spec pins — and a qid repeated
  * in a later batch is answered once (first batch wins, the
  * [[VectorServeStream.servePqRequests]] dedup discipline). The per-batch
  * `collect()` moves only that batch's (qid, term) rows — control-plane
  * sized.
  *
  * Scale: the index is built once (one corpus scan on the big cluster);
  * each served query reads ONLY its terms' postings (In-filter pushed to
  * the term-clustered parquet) plus metadata relations — per-query cost
  * independent of corpus text size.
  */
object SearchServeStream {

  /** Parquet schema of a search-request stream: one row per query term. */
  val requestSchema: StructType = StructType(Seq(
    StructField("qid", LongType),
    StructField("term", StringType)))

  /** Serve every request file under `requestDir` (AvailableNow catch-up;
    * one file per micro-batch) and return the accumulated
    * `(qid, rnk, doc_id, score_bp, n_terms)` results.
    */
  def serveBm25Requests(
      spark: SparkSession,
      requestDir: String,
      checkpoint: String,
      indexDir: String,
      k: Int): DataFrame = {
    import graft.ops.TextAnalysis
    @volatile var results: Option[DataFrame] = None
    val served = scala.collection.mutable.Set.empty[Long]
    val stream = spark.readStream
      .schema(requestSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(requestDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val reqs = batch.select(col("qid"), col("term")).distinct()
          .collect().map(r => (r.getLong(0), r.getString(1)))
          .groupBy(_._1).map { case (qid, rows) => qid -> rows.map(_._2).toSeq.sorted }
          .filterNot { case (qid, _) => served(qid) }
        served ++= reqs.keys
        reqs.toSeq.sortBy(_._1).foreach { case (qid, terms) =>
          val answered = TextAnalysis.bm25TopKFromIndex(spark, indexDir, terms, k)
            .select(lit(qid).as("qid"), col("rnk"), col("doc_id"),
              col("score_bp"), col("n_terms"))
            .localCheckpoint()
          results = Some(results.fold(answered)(_.union(answered).localCheckpoint()))
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    results.getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("qid", LongType), StructField("rnk", LongType),
          StructField("doc_id", LongType), StructField("score_bp", LongType),
          StructField("n_terms", LongType)))))
  }
}
