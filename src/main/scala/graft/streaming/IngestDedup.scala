package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingest dedup: documents arriving as a file stream are flagged
  * against a STATIC corpus fingerprint table with a stateless
  * stream-static broadcast join — the arrival-time gate of the ingest
  * pipeline (its batch near-dup counterpart is
  * [[graft.ops.TextDedup.minhashLshIncremental]]; exact-match is the only
  * decision cheap enough to make per micro-batch with zero state).
  *
  * Scale: the join is stateless (no state store, no watermark) — each
  * micro-batch projects md5 fingerprints and probes the broadcast corpus
  * index; at corpus sizes past broadcast limits the same plan downgrades
  * to a shuffled stream-static join, still stateless. New-and-unique docs
  * flow to the sink; duplicates carry their corpus survivor id for
  * provenance.
  */
object IngestDedup {

  /** Parquet schema of a documents-shaped ingest stream. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
  ))

  /** File-source stream of incoming documents. */
  def docStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(path)

  /** The static corpus index: one (fp, canonical_id) row per distinct
    * corpus text — at scale a maintained table, recomputed only for
    * corpus compactions.
    */
  def corpusFingerprints(corpus: DataFrame): DataFrame =
    corpus.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("dup_of"))

  /** Incoming docs annotated with `dup_of` (null ⇒ new content): a
    * stateless stream-static broadcast LEFT join on the fingerprint.
    */
  def flagExactDups(incoming: DataFrame, corpusFps: DataFrame): DataFrame =
    incoming
      .withColumn("fp", md5(col("text")))
      .join(broadcast(corpusFps), Seq("fp"), "left")
      .select(col("doc_id"), col("fp"), col("dup_of"))
}
