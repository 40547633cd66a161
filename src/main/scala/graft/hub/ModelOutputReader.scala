package graft.hub

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-directed model-output file reading (SURVEY.md §2 ops 1-3, 10).
  *
  * CSV (reference model_output.py:267-274): parse with the hub schema's types
  * for columns the schema names; columns NOT in the schema get their type
  * inferred from the data; every sentinel in [[CsvNullSentinels]] becomes
  * null in ALL columns (`strings_can_be_null=True` semantics) and values are
  * otherwise NOT trimmed (`" "` is a sentinel, `" x"` survives).
  *
  * Parquet (reference model_output.py:275-277 = `pq.read_table(f, schema)`):
  * output follows SCHEMA order; physical columns are cast to the target
  * types (int64→string drops leading zeros, double→string uses Arrow float
  * formatting — see [[ArrowFormat]]); file columns absent from the schema are
  * dropped; schema columns absent from the file materialize as nulls
  * (pyarrow semantics pinned empirically in round 1).
  *
  * Scale: both paths are a single narrow projection over a parallel file
  * scan — no shuffle, fully whole-stage codegen (the Arrow float→string
  * cast is the native [[ArrowFormatString]] expression).
  */
object ModelOutputReader {

  /** model_output.py:270-273 */
  val CsvNullSentinels: Seq[String] =
    Seq("na", "NA", "", " ", "null", "Null", "NaN", "nan")

  /** Cast with Arrow-compatible float→string formatting — a native
    * codegen'd expression ([[ArrowFormatString]]), so the cast-on-read
    * projection stays in whole-stage codegen.
    */
  def arrowCast(c: Column, from: DataType, to: DataType): Column = (from, to) match {
    case (DoubleType, StringType) | (FloatType, StringType) =>
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        ArrowFormatString(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))
    case _ => c.cast(to)
  }

  def read(spark: SparkSession, path: String, fileType: String, schema: StructType): DataFrame =
    fileType match {
      case ".csv"             => readCsv(spark, path, schema)
      case ".parquet" | ".pqt" => readParquet(spark, path, schema)
      case other =>
        throw new PathParser.UserWarning(s"Input file type $other is not supported")
    }

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    readCsv(spark, Seq(path), schema)

  /** Multi-file variant: `paths` must share identical header bytes (the
    * [[HubTransform.readHub]] grouping guarantees it) so one scan parses
    * them all consistently.
    */
  def readCsv(spark: SparkSession, paths: Seq[String], schema: StructType): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(paths: _*)

    val byName = schema.fields.map(f => f.name -> f.dataType).toMap

    // sentinel → null on the raw string value of every column
    def normalized(name: String): Column = {
      val c = col(name)
      when(c.isNull || c.isin(CsvNullSentinels: _*), lit(null).cast(StringType))
        .otherwise(c)
    }

    val inferredTypes = inferColumnTypes(
      raw.select(raw.columns.filterNot(byName.contains).map(n => normalized(n).as(n)).toIndexedSeq: _*))

    raw.select(raw.columns.toIndexedSeq.map { name =>
      byName.get(name) match {
        case Some(t) => normalized(name).cast(t).as(name)
        case None    => normalized(name).cast(inferredTypes(name)).as(name)
      }
    }: _*)
  }

  /** Arrow-CSV-style inference for columns the hub schema doesn't name
    * (reference lets pyarrow infer them): all-long → LongType, all-numeric →
    * DoubleType, all-ISO-date → DateType, else StringType. One aggregation
    * job over only the un-schema'd columns (usually none at scale).
    */
  private def inferColumnTypes(df: DataFrame): Map[String, DataType] = {
    if (df.columns.isEmpty) return Map.empty
    val aggs = df.columns.toIndexedSeq.flatMap { n =>
      val c = col(n)
      Seq(
        count(c).as(s"${n}__n"),
        count(c.try_cast(LongType)).as(s"${n}__long"),
        count(c.try_cast(DoubleType)).as(s"${n}__double"),
        count(c.try_cast(DateType)).as(s"${n}__date"),
      )
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    df.columns.map { n =>
      val total = row.getAs[Long](s"${n}__n")
      val t =
        if (total == 0) StringType
        else if (row.getAs[Long](s"${n}__long") == total) LongType
        else if (row.getAs[Long](s"${n}__double") == total) DoubleType
        else if (row.getAs[Long](s"${n}__date") == total) DateType
        else StringType
      n -> t
    }.toMap
  }

  def readParquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    readParquet(spark, Seq(path), schema)

  /** Multi-file variant: `paths` must share one footer schema (the
    * [[HubTransform.readHub]] grouping guarantees it).
    */
  def readParquet(spark: SparkSession, paths: Seq[String], schema: StructType): DataFrame = {
    val raw = spark.read.parquet(paths: _*)
    // pyarrow `read_table(f, schema=empty)` keeps the file schema unchanged
    // (pinned empirically in round 1); mirror that.
    if (schema.isEmpty) return raw
    val fileTypes = raw.schema.fields.map(f => f.name -> f.dataType).toMap
    raw.select(schema.fields.toIndexedSeq.map { f =>
      fileTypes.get(f.name) match {
        case Some(from) => arrowCast(col(f.name), from, f.dataType).as(f.name)
        case None       => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }
}
