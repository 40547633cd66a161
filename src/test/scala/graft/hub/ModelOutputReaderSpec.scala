package graft.hub

import graft.SparkFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mirrors the reference's read/transform unit tests
  * (test_model_output.py:159-213, :277-364) with the same mocked schemas
  * (conftest.py:119-201) and golden values.
  */
class ModelOutputReaderSpec extends SparkFunSuite {

  /** conftest `schema_origin_date` */
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

  /** conftest `schema_origin_date_no_model_round_ids` */
  private val schemaNoModelRound = StructType(schemaOriginDate.fields.dropRight(2))

  private def unitCsv(name: String) = resource(s"unit/data/$name")

  test("csv: schema-directed types + sentinel nulls (test_model_output.py:277-311 case 1)") {
    val df = ModelOutputReader.readCsv(
      spark, unitCsv("2024-07-07-teamabc-output_type_ids_numeric.csv"), schemaOriginDate)
    assert(df.columns.toSeq == Seq(
      "origin_date", "target", "horizon", "location", "output_type", "output_type_id", "value"))
    val rows = df.collect()
    assert(rows.length == 6)
    assert(df.schema("location").dataType == StringType)
    assert(df.schema("output_type_id").dataType == StringType)
    assert(df.schema("horizon").dataType == LongType)
    assert(df.schema("origin_date").dataType == DateType)
    assert(rows.map(r => Option(r.getAs[String]("location")).orNull).toSeq ==
      Seq(null, "02", "02", null, "string location", "27"))
    assert(rows.map(r => Option(r.getAs[String]("output_type_id")).orNull).toSeq ==
      Seq("0.99", null, null, "0.0", null, "111"))
  }

  test("csv: no-location variant (test_model_output.py case 2)") {
    val df = ModelOutputReader.readCsv(
      spark, unitCsv("2024-07-07-teamabc-output_type_ids_numeric_no_location.csv"), schemaOriginDate)
    assert(df.columns.toSeq == Seq(
      "origin_date", "target", "horizon", "output_type", "output_type_id", "value"))
    assert(df.collect().map(r => Option(r.getAs[String]("output_type_id")).orNull).toSeq ==
      Seq("0.99", null, null, "0.0", null, "111"))
  }

  test("parquet: cast-on-read double→string, schema order (test_model_output.py:314-364)") {
    // re-create the reference parquet fixture with its exact physical types
    // (origin_date:string, horizon:int64, location:string, output_type_id:double)
    val dir = tmpDir("pq-fixture")
    val data = Seq(
      Row("2022-10-08", "wk inc flu hosp", 1L, null, "quantile", 0.99, 203.0),
      Row("2022-10-08", "wk inc flu hosp", 1L, "02", "mean", null, 173.0),
      Row("2022-10-08", "wk inc flu hosp", 1L, "02", "mean", null, 174.0),
      Row("2022-10-08", "wk inc flu hosp", 1L, null, "mean", 0.0, 175.0),
      Row("2022-10-08", "wk inc flu hosp", 1L, "string location", "mean", null, 176.0),
      Row("2023-10-21", "wk flu hosp rate change", -1L, "27", "pmf", 111.0, 0.0018554857403307),
    )
    val physical = StructType(Seq(
      StructField("origin_date", StringType),
      StructField("target", StringType),
      StructField("horizon", LongType),
      StructField("location", StringType),
      StructField("output_type", StringType),
      StructField("output_type_id", DoubleType),
      StructField("value", DoubleType),
    ))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), physical)
      .write.mode("overwrite").parquet(s"$dir/f.parquet")

    val df = ModelOutputReader.readParquet(spark, s"$dir/f.parquet", schemaNoModelRound)
    assert(df.columns.toSeq == Seq(
      "origin_date", "target", "horizon", "location", "output_type", "output_type_id", "value"))
    assert(df.schema("output_type_id").dataType == StringType)
    assert(df.schema("origin_date").dataType == DateType)
    val got = df.collect().map(r => Option(r.getAs[String]("output_type_id")).orNull).toSeq
    // double→string via Arrow formatting: 0.0 → "0" (NOT Spark's "0.0")
    assert(got == Seq("0.99", null, null, "0", null, "111"))
    assert(df.collect().map(r => Option(r.getAs[String]("location")).orNull).toSeq ==
      Seq(null, "02", "02", null, "string location", "27"))
    // the Arrow cast is a native expression: no UDF node, projection codegen'd
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF") && !plan.contains("BatchEval"), plan)
    // "*(1)" marks the codegen stage: the cast projection is inside it
    assert(plan.contains("*(1) Project") && plan.contains("arrowformatstring"), plan)
  }

  test("csv inference for un-schema'd columns (conftest 4-row fixture, test_model_output.py:188-199)") {
    val dir = tmpDir("csv-fixture")
    val csv =
      """reference_date,location,horizon,target,output_type,output_type_id,value
        |2420-01-01,US,1 light year,hospitalizations,quantile,0.5,62
        |2420-01-01,US,1 light year,hospitalizations,quantile,0.75,50.1
        |2420-01-01,03,3,hospitalizations,mean,,33
        |1999-12-31,US,last month,hospitalizations,pmf,large_increase,2.597827508665773e-9
        |""".stripMargin
    val path = s"$dir/2420-01-01-janeswayaddition-voyager1.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), csv)

    val df = ModelOutputReader.readCsv(spark, path, new StructType()) // schema_empty
    val rows = df.collect()
    assert(rows.length == 4)
    assert(df.schema("output_type_id").dataType == StringType) // mixed → string
    assert(df.schema("horizon").dataType == StringType) //        "1 light year"
    assert(df.schema("value").dataType == DoubleType)
    assert(df.schema("reference_date").dataType == DateType) //   all ISO dates
    val otid = rows.map(r => Option(r.getAs[String]("output_type_id")).orNull).toSeq
    assert(otid == Seq("0.5", "0.75", null, "large_increase")) // csv: "" → null
  }

  test("parquet keeps empty strings (test_model_output.py:202-213)") {
    val dir = tmpDir("pq-empty")
    import spark.implicits._
    Seq(("0.5", 62.0), ("0.75", 50.1), ("", 33.0), ("large_increase", 2.597827508665773e-9))
      .toDF("output_type_id", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/f.parquet")
    val df = ModelOutputReader.readParquet(spark, s"$dir/f.parquet", new StructType())
    val otid = df.collect().map(_.getAs[String]("output_type_id")).toSeq
    assert(otid == Seq("0.5", "0.75", "", "large_increase")) // "" survives
  }

  test("parquet: schema column missing from file materializes as nulls (pyarrow pin)") {
    val dir = tmpDir("pq-missing")
    import spark.implicits._
    Seq((1L, "x")).toDF("a", "b").write.mode("overwrite").parquet(s"$dir/f.parquet")
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType), StructField("d", StringType)))
    val df = ModelOutputReader.readParquet(spark, s"$dir/f.parquet", schema)
    assert(df.columns.toSeq == Seq("a", "b", "d"))
    val r = df.head()
    assert(r.getAs[String]("a") == "1" && r.getAs[String]("d") == null)
  }
}
