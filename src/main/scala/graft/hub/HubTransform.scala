package graft.hub

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, input_file_name, lit, regexp_replace, sum, when}
import org.apache.spark.sql.types.StructType

import PathParser.UserWarning

/** Spark-native counterpart of the reference's `ModelOutputHandler`
  * (model_output.py:23) — one instance per model-output file:
  *
  *   parse path → derive schema from hub config → read CSV/parquet with
  *   null-normalization + cast → append/overwrite `round_id`/`model_id`
  *   constants → write `<file_name>.parquet` to the user-facing location
  *   (or delete its counterpart).
  *
  * Construction mirrors the reference `__init__` (model_output.py:65-128):
  * missing `tasks.json` is fatal, unsupported/missing file extension raises
  * [[PathParser.UserWarning]] (callers skip the file), un-parseable file
  * names raise `IllegalArgumentException`.
  *
  * @param schemaOverride test seam mirroring the reference's mocked
  *        `_get_schema` (conftest.py:119-201): bypasses tasks.json.
  */
final class ModelOutputHandler(
    spark: SparkSession,
    hubPath: String,
    moPath: String,
    outputPathRaw: String,
    schemaOverride: Option[StructType] = None) {

  private def joinPaths(base: String, rel: String): String =
    if (rel.startsWith("/") || rel.contains("://")) rel
    else base.stripSuffix("/") + "/" + rel

  val inputFile: String = PathParser.sanitizePath(joinPaths(hubPath, moPath))
  val outputPath: String = PathParser.sanitizePath(outputPathRaw)

  val config: Option[HubConfig] =
    if (schemaOverride.isDefined) None
    else {
      val c = HubConfig.load(hubPath, spark.sessionState.newHadoopConf())
      if (c.isEmpty)
        throw new java.io.FileNotFoundException(s"could not read tasks.json for hub_path=$hubPath")
      c
    }

  val fileName: String = PathParser.stem(inputFile)
  val fileType: String = PathParser.suffix(inputFile)

  if (PathParser.suffix(joinPaths(hubPath, moPath)).isEmpty)
    throw new UserWarning("Input file has no extension")
  if (!PathParser.SupportedFileTypes(fileType))
    throw new UserWarning(s"Input file type $fileType is not supported")

  private val parts = PathParser.parseFile(fileName)
  val roundId: String = parts.roundId
  val modelId: String = parts.modelId

  def schema: StructType =
    schemaOverride.getOrElse(HubSchema.deriveSchema(config.get))

  /** op-1/2/3: schema-directed read with sentinel null-normalization (CSV)
    * or cast-on-read (parquet).
    */
  def readFile(): DataFrame =
    ModelOutputReader.read(spark, inputFile, fileType, schema)

  /** op-8/9: constant `round_id`/`model_id` columns from the file name.
    * `withColumn` replaces in place (keeping column position) when the
    * column already exists, else appends — exactly the reference's dict-merge
    * semantics (model_output.py:298-308), with `lit()` instead of
    * materialized arrays so Catalyst constant-folds it.
    */
  def addColumns(df: DataFrame): DataFrame =
    df.withColumn("round_id", lit(roundId))
      .withColumn("model_id", lit(modelId))

  /** op-4: write exactly `<output_path>/<file_name>.parquet`. */
  def writeParquet(df: DataFrame): String =
    ModelOutputWriter.writeSingleParquet(df, outputPath, fileName)

  /** Operational metrics of the last [[addModelOutput]] run, collected with
    * `Dataset.observe` — aggregated ON the executors during the write pass
    * itself (no second job, no extra scan): rows written and rows whose
    * `output_type_id` is null after normalization. At scale these land in
    * a metrics pipeline; an extra `count()` per file would double the read
    * work.
    */
  @volatile var lastWriteMetrics: Option[Map[String, Any]] = None

  /** read → transform → write; returns the output path (add_model_output). */
  def addModelOutput(): String = {
    val obs = new org.apache.spark.sql.Observation()
    val df = addColumns(readFile())
    val observed =
      if (df.columns.contains("output_type_id"))
        df.observe(obs, count(lit(1)).as("rows_written"),
          coalesce(sum(when(col("output_type_id").isNull, 1L).otherwise(0L)), lit(0L))
            .as("null_output_type_ids"))
      else
        df.observe(obs, count(lit(1)).as("rows_written"),
          coalesce(sum(lit(0L)), lit(0L)).as("null_output_type_ids"))
    val out = writeParquet(observed)
    lastWriteMetrics = Some(obs.get)
    out
  }

  /** op-5: delete the transformed counterpart (delete_model_output). */
  def deleteModelOutput(): Unit =
    ModelOutputWriter.deleteSingleParquet(spark, outputPath, fileName)
}

object ModelOutputHandler {

  /** Factory mirroring `ModelOutputHandler.from_s3` (model_output.py:137-189).
    * Paths keep the reference's quirks (only the first `originPrefix`
    * segment dropped; destination `"."` for files directly under the prefix).
    */
  def fromS3(
      spark: SparkSession,
      bucketName: String,
      s3Key: String,
      originPrefix: String = "raw",
      scheme: String = "s3a"): ModelOutputHandler = {
    val p = PathParser.fromS3(bucketName, s3Key, originPrefix)
    new ModelOutputHandler(
      spark,
      p.hubPath.replace("s3://", s"$scheme://"),
      p.moPath,
      p.outputPath.replace("s3://", s"$scheme://"))
  }
}

/** Event-driven entry points mirroring the reference Lambda dispatch
  * (faas/lambda_function.py:22-62): one storage event = one file = one batch
  * run; `UserWarning`s and other per-file failures are logged and skipped so
  * a bad file never takes down the pipeline.
  */
object HubTransform {

  final case class EventResult(key: String, action: String, outputPath: Option[String], error: Option[String])

  def handleEvent(
      spark: SparkSession,
      eventName: String,
      bucketName: String,
      s3Key: String,
      originPrefix: String = "raw",
      scheme: String = "s3a"): EventResult = {
    val key = PathParser.unquote(s3Key) // S3 keys arrive URL-encoded (lambda_function.py:31)
    try {
      val p = PathParser.fromS3(bucketName, key, originPrefix)
      dispatch(
        spark, eventName,
        p.hubPath.replace("s3://", s"$scheme://"),
        p.moPath,
        p.outputPath.replace("s3://", s"$scheme://"))
    } catch {
      case w: UserWarning => EventResult(key, "skip", None, Some(w.getMessage))
      case scala.util.control.NonFatal(e) =>
        EventResult(key, "error", None, Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
  }

  /** Verb dispatch with explicit paths (the reference's lambda_handler body):
    * `objectcreated` → add, `objectremoved` → delete, anything else → skip;
    * `UserWarning` → skip the file; other failures → logged error, no rethrow.
    */
  def dispatch(
      spark: SparkSession,
      eventName: String,
      hubPath: String,
      moPath: String,
      outputPath: String,
      schemaOverride: Option[StructType] = None): EventResult = {
    val verb = eventName.toLowerCase
    try {
      if (verb.contains("objectcreated")) {
        val out = new ModelOutputHandler(spark, hubPath, moPath, outputPath, schemaOverride).addModelOutput()
        EventResult(moPath, "add", Some(out), None)
      } else if (verb.contains("objectremoved")) {
        new ModelOutputHandler(spark, hubPath, moPath, outputPath, schemaOverride).deleteModelOutput()
        EventResult(moPath, "delete", None, None)
      } else {
        EventResult(moPath, "skip", None, Some(s"unsupported event $eventName"))
      }
    } catch {
      case w: UserWarning => EventResult(moPath, "skip", None, Some(w.getMessage))
      case scala.util.control.NonFatal(e) =>
        EventResult(moPath, "error", None, Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
  }

  /** Local/library entry (reference README.md:19-36): transform one file. */
  def add(
      spark: SparkSession,
      hubPath: String,
      moPath: String,
      outputPath: String,
      schemaOverride: Option[StructType] = None): String =
    new ModelOutputHandler(spark, hubPath, moPath, outputPath, schemaOverride).addModelOutput()

  /** Batch backfill: transform every supported file under a directory —
    * the engine equivalent of the reference's re-trigger ops script
    * (faas/lambda_retrigger_model_output_add.py:13-62).
    *
    * Files are independent single-stage jobs, so they are submitted from a
    * driver-side thread pool (`parallelism` concurrent Spark jobs) — the
    * scheduler interleaves their tasks across executors. This is how the
    * per-file one-file-out contract scales to thousands of files: across
    * files, not within one (see SCALE.md).
    */
  def addDirectory(
      spark: SparkSession,
      hubPath: String,
      rawDir: String,
      outputPath: String,
      parallelism: Int = 8,
      schemaOverride: Option[StructType] = None): Seq[EventResult] = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(PathParser.sanitizePath(joinAbs(hubPath, rawDir)))
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Nil
    val it = fs.listFiles(dir, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    // local Hadoop paths stringify as "file:/..." — strip so path joining
    // and stem parsing see a plain absolute path; remote schemes
    // ("s3a://...") keep their authority form
    while (it.hasNext) files += it.next().getPath.toString.stripPrefix("file:")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futures = files.sorted.map { rel =>
        scala.concurrent.Future {
          try {
            val out = new ModelOutputHandler(spark, hubPath, rel, outputPath, schemaOverride).addModelOutput()
            EventResult(rel, "add", Some(out), None)
          } catch {
            case w: UserWarning => EventResult(rel, "skip", None, Some(w.getMessage))
            case scala.util.control.NonFatal(e) =>
              EventResult(rel, "error", None, Some(e.getMessage))
          }
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures.toSeq),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
  }

  /** The whole hub as ONE queryable DataFrame: every supported
    * model-output file under `hubPath/<rawDir>`, read with reference
    * semantics (schema-directed read, null normalization, path-derived
    * `round_id`/`model_id` constants) and unioned by name — files may
    * carry different un-schema'd columns; missing ones are null.
    *
    * `roundIds`/`modelIds` predicates prune FILES on the driver before
    * anything is read (the partition-pruning shape for path-encoded
    * metadata — the file list is the partition index). Unparseable or
    * unsupported files are skipped, mirroring the event loop.
    *
    * Scale: files are scanned in BULK — one FileSourceScan per group of
    * like-shaped files (CSV grouped by identical header bytes, parquet by
    * footer schema), not a per-file union chain, so a thousand-file hub
    * plans a handful of scans whose splits schedule across executors.
    * `round_id`/`model_id` come from `input_file_name()` joined to a
    * BROADCAST driver-built (path → ids) map — [[PathParser]] stays the
    * single parsing implementation and per-row work is one broadcast hash
    * probe. CSV type inference for un-schema'd columns runs once per
    * group (over the group's union, matching what the former per-file
    * union would widen to). For standing workloads, transform once and
    * query the parquet store partitioned by (round_id, model_id) instead
    * of re-scanning raw CSV.
    */
  def readHub(
      spark: SparkSession,
      hubPath: String,
      rawDir: String = "raw",
      roundIds: Seq[String] = Nil,
      modelIds: Seq[String] = Nil,
      schemaOverride: Option[StructType] = None): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(PathParser.sanitizePath(joinAbs(hubPath, rawDir)))
    val fs = dir.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    if (fs.exists(dir)) {
      val it = fs.listFiles(dir, true)
      while (it.hasNext) files += it.next().getPath.toString.stripPrefix("file:")
    }
    val selected = files.sorted.toSeq.flatMap { f =>
      val suffix = PathParser.suffix(f)
      if (!PathParser.SupportedFileTypes(suffix)) None
      else scala.util.Try(PathParser.parseFile(PathParser.stem(f))).toOption
        .filter(p =>
          (roundIds.isEmpty || roundIds.contains(p.roundId)) &&
            (modelIds.isEmpty || modelIds.contains(p.modelId)))
        .map(p => (f, suffix, p))
    }
    val schema = schemaOverride.getOrElse {
      val c = HubConfig.load(hubPath, conf).getOrElse(throw new java.io.FileNotFoundException(
        s"could not read tasks.json for hub_path=$hubPath"))
      HubSchema.deriveSchema(c)
    }
    // path → (round_id, model_id), broadcast-joined on input_file_name();
    // normalize both sides to a bare absolute path
    def normalize(p: String): String = p.replaceFirst("^file:/+", "/")
    val metaDf = {
      import org.apache.spark.sql.Row
      val rows = selected.map { case (f, _, p) =>
        Row(normalize(f), p.roundId, p.modelId)
      }
      val st = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__path", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("round_id", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("model_id", org.apache.spark.sql.types.StringType)))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), st)
    }
    def withPathMeta(df: DataFrame): DataFrame =
      df.withColumn("__path", regexp_replace(input_file_name(), "^file:/+", "/"))
        .join(broadcast(metaDf), Seq("__path"))
        .drop("__path")

    def headerOf(path: String): String = {
      val in = fs.open(new org.apache.hadoop.fs.Path(path))
      try {
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
        Option(br.readLine()).getOrElse("")
      } finally in.close()
    }

    // grouping key = the file's parquet schema, read DIRECTLY from the
    // footer (ParquetFileReader) — `spark.read.parquet(f).schema` would
    // open a full datasource per file, a driver-side O(files) planning
    // cost at thousand-file hubs. The raw MessageType string is enough to
    // group by; no Spark schema conversion is needed here.
    def footerSchemaKey(path: String): String = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getFileMetaData.getSchema.toString finally r.close()
    }

    // header/footer sniffs are independent metadata reads — run them in a
    // bounded pool instead of sequentially on the listing thread
    val (csvGroups, parquetGroups) = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val csvKeyed = Future.traverse(selected.filter(_._2 == ".csv"))(t =>
        Future(headerOf(t._1) -> t))
      val pqKeyed = Future.traverse(
        selected.filter(s => s._2 == ".parquet" || s._2 == ".pqt"))(t =>
        Future(footerSchemaKey(t._1) -> t))
      def grouped(keyed: Seq[(String, (String, String, PathParser.FileParts))]) =
        keyed.groupBy(_._1).values.map(_.map(_._2)).toSeq.sortBy(_.head._1)
      (grouped(Await.result(csvKeyed, Duration.Inf)),
        grouped(Await.result(pqKeyed, Duration.Inf)))
    }

    val parts =
      csvGroups.map(g =>
        withPathMeta(ModelOutputReader.readCsv(spark, g.map(_._1), schema))) ++
      parquetGroups.map(g =>
        withPathMeta(ModelOutputReader.readParquet(spark, g.map(_._1), schema)))
    parts
      .reduceOption((a, b) => a.unionByName(b, allowMissingColumns = true))
      .getOrElse {
        val empty = schema
          .add("round_id", org.apache.spark.sql.types.StringType)
          .add("model_id", org.apache.spark.sql.types.StringType)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], empty)
      }
  }

  /** Force re-trigger of the add pipeline over every file under
    * `<hubPath>/<rawDir>` — the engine equivalent of the reference's
    * metadata-touch ops script (faas/lambda_retrigger_model_output_add.py:
    * 35-53: rewrite each object's metadata with a `manual-update`
    * timestamp via copy-with-REPLACE so S3 emits a fresh
    * `ObjectCreated:Copy` event and the Lambda re-runs).
    *
    * The filesystem translation does both halves of that trick
    * faithfully: each file's modification time is touched (the metadata
    * update — content untouched, exactly like the script), and the add
    * event is re-fired through the SAME event entrypoint the bus would
    * hit, as `ObjectCreated:Copy` — the event name S3 produces for a
    * copy-with-replace. Unsupported/unparseable files flow through
    * dispatch's skip path, mirroring the Lambda re-processing everything
    * the script touched.
    *
    * @return per-file results; touched-file count == results count
    */
  def retriggerModelOutputAdd(
      spark: SparkSession,
      hubPath: String,
      rawDir: String = "raw",
      outputPath: String,
      schemaOverride: Option[StructType] = None): Seq[EventResult] = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(PathParser.sanitizePath(joinAbs(hubPath, rawDir)))
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Nil
    val it = fs.listFiles(dir, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) files += it.next().getPath.toString.stripPrefix("file:")
    val now = System.currentTimeMillis()
    files.sorted.toSeq.map { f =>
      fs.setTimes(new org.apache.hadoop.fs.Path(f), now, -1) // metadata touch
      dispatch(spark, "ObjectCreated:Copy", hubPath, f, outputPath, schemaOverride)
    }
  }

  private def joinAbs(base: String, rel: String): String =
    if (rel.startsWith("/") || rel.contains("://")) rel
    else base.stripSuffix("/") + "/" + rel
}
