package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.hub.{ModelOutputHandler, ModelOutputReader}

/** The hub transform itself (SURVEY.md §2 ops 1-10) as oracle-checked
  * queries: read a committed reference CSV fixture with the canonical
  * schema, null-normalize, cast, append filename-derived constants — and
  * mirror the whole thing in DuckDB `read_csv` SQL. This puts the CORE
  * reference pipeline (not just the extension surface) under the driver's
  * hash gate.
  */
object HubQueries {

  private val FixtureDir = "/root/repo/src/test/resources/integration/data"

  /** conftest `schema_origin_date` (round_id: date32 — overwritten later). */
  private val schemaOriginDate = StructType(Seq(
    StructField("origin_date", DateType),
    StructField("target", StringType),
    StructField("horizon", LongType),
    StructField("location", StringType),
    StructField("output_type", StringType),
    StructField("output_type_id", StringType),
    StructField("value", DoubleType),
    StructField("round_id", DateType),
    StructField("model_id", StringType),
  ))

  /** conftest `schema_reference_date` (full 10-column canonical schema). */
  private val schemaReferenceDate = StructType(Seq(
    StructField("reference_date", DateType),
    StructField("target", StringType),
    StructField("horizon", LongType),
    StructField("target_end_date", DateType),
    StructField("location", StringType),
    StructField("output_type", StringType),
    StructField("output_type_id", StringType),
    StructField("value", DoubleType),
    StructField("round_id", StringType),
    StructField("model_id", StringType),
  ))

  private val sentinels =
    ModelOutputReader.CsvNullSentinels.map(s => s"'$s'").mkString(", ")

  /** Full transform of the numeric-output_type_id fixture (sentinel
    * null-normalization in string + typed columns, cast, constants).
    */
  def qHubTransformNumeric(spark: SparkSession, dir: String): DataFrame = {
    val h = new ModelOutputHandler(
      spark, "/nonexistent-hub",
      s"$FixtureDir/2024-07-07-teamabc-output_type_ids_numeric.csv",
      "/tmp/unused-output", Some(schemaOriginDate))
    h.addColumns(h.readFile())
      .orderBy(col("value").asc_nulls_first, col("output_type_id").asc_nulls_first)
  }

  val qHubTransformNumericSql: String = {
    def norm(c: String) = s"(CASE WHEN $c IN ($sentinels) THEN NULL ELSE $c END)"
    s"""SELECT
       |  CAST(${norm("origin_date")} AS DATE) AS origin_date,
       |  ${norm("target")} AS target,
       |  CAST(${norm("horizon")} AS BIGINT) AS horizon,
       |  ${norm("location")} AS location,
       |  ${norm("output_type")} AS output_type,
       |  ${norm("output_type_id")} AS output_type_id,
       |  CAST(${norm("value")} AS DOUBLE) AS value,
       |  '2024-07-07' AS round_id,
       |  'teamabc-output_type_ids_numeric' AS model_id
       |FROM read_csv('$FixtureDir/2024-07-07-teamabc-output_type_ids_numeric.csv',
       |              header=true, all_varchar=true)
       |ORDER BY value ASC NULLS FIRST, output_type_id ASC NULLS FIRST""".stripMargin
  }

  /** Full transform of the 23-row locations fixture — exercises the
    * overwrite-in-place of existing round_id/model_id columns (op-9) and
    * the full canonical output schema.
    */
  def qHubTransformLocations(spark: SparkSession, dir: String): DataFrame = {
    val h = new ModelOutputHandler(
      spark, "/nonexistent-hub",
      s"$FixtureDir/2024-05-04-teamabc-locations_numeric.csv",
      "/tmp/unused-output", Some(schemaReferenceDate))
    h.addColumns(h.readFile())
      .orderBy(col("output_type_id"))
  }

  val qHubTransformLocationsSql: String = {
    def norm(c: String) = s"(CASE WHEN $c IN ($sentinels) THEN NULL ELSE $c END)"
    s"""SELECT
       |  CAST(${norm("reference_date")} AS DATE) AS reference_date,
       |  ${norm("target")} AS target,
       |  CAST(${norm("horizon")} AS BIGINT) AS horizon,
       |  CAST(${norm("target_end_date")} AS DATE) AS target_end_date,
       |  ${norm("location")} AS location,
       |  ${norm("output_type")} AS output_type,
       |  ${norm("output_type_id")} AS output_type_id,
       |  CAST(${norm("value")} AS DOUBLE) AS value,
       |  '2024-05-04' AS round_id,
       |  'teamabc-locations_numeric' AS model_id
       |FROM read_csv('$FixtureDir/2024-05-04-teamabc-locations_numeric.csv',
       |              header=true, all_varchar=true)
       |ORDER BY output_type_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hub_transform_numeric" -> (qHubTransformNumeric _),
    "q_hub_transform_locations" -> (qHubTransformLocations _),
  )

  def oracle: Map[String, String] = Map(
    "q_hub_transform_numeric" -> qHubTransformNumericSql,
    "q_hub_transform_locations" -> qHubTransformLocationsSql,
  )
}
