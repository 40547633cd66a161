package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared guards for the foreachBatch streams whose accumulators live in
  * the DRIVER (SnapshotDiffStream's ledger, QualityServeStream's verdict
  * union): a file-source checkpoint skips already-committed batches on
  * resume, but driver-side state restarts from scratch — resuming would
  * silently under-count. These streams must fail fast on a used
  * checkpoint instead.
  */
object StreamGuards {

  /** Require that `checkpoint` holds no committed batches yet. Probes
    * through the path's own Hadoop FileSystem (NOT java.io.File — a
    * `hdfs://`/`s3a://`/`file:` checkpoint would silently bypass a local
    * stat and re-expose the under-count).
    */
  def requireFreshCheckpoint(spark: SparkSession, checkpoint: String): Unit = {
    val commits = new org.apache.hadoop.fs.Path(checkpoint, "commits")
    val fs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val used = fs.exists(commits) && fs.getFileStatus(commits).isDirectory &&
      fs.listStatus(commits).exists(s => !s.getPath.getName.startsWith("."))
    require(!used,
      s"checkpoint $checkpoint already holds committed batches; this " +
        "stream's state is in-memory and cannot resume — pass a fresh checkpoint")
  }
}
