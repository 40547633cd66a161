package graft.hub

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types._

/** Derive the model-output read schema (`StructType`) from a hub's
  * `tasks.json` — the Spark equivalent of `hubdata.create_hub_schema`
  * (called by the reference at model_output.py:266, :282-288).
  *
  * The exact algorithm lives in the un-vendored `hubdata` package; this
  * reconstruction follows the observable contract documented in SURVEY.md
  * §1.3 (each rule pinned by reference fixtures):
  *
  *  - task-id column type from the union of its required+optional values:
  *    all ISO dates → DateType, all integers → LongType, all numeric →
  *    DoubleType, else StringType
  *  - `output_type` → StringType
  *  - `output_type_id` from `output_type_id_datatype`: explicit
  *    character/double/integer/logical/Date, or `auto` = DoubleType when
  *    every configured id is numeric, else StringType
  *  - `value` from `output_type.<t>.value.type` (double wins over integer)
  *  - appended `round_id` (typed like its source variable when
  *    `round_id_from_variable`, else string) and `model_id: string`
  *
  * Column order: task ids in config order, then output_type, output_type_id,
  * value, round_id, model_id.
  */
object HubSchema {

  private val IsoDate = "^\\d{4}-\\d{2}-\\d{2}$".r

  private def isDateText(n: JsonNode): Boolean =
    n.isTextual && IsoDate.matches(n.asText)

  /** Value-union typing rule for task-id columns. */
  private[hub] def typeOfValues(values: Seq[JsonNode]): DataType = {
    val nonNull = values.filterNot(_.isNull)
    if (nonNull.isEmpty) StringType
    else if (nonNull.forall(isDateText)) DateType
    else if (nonNull.forall(v => v.isIntegralNumber)) LongType
    else if (nonNull.forall(_.isNumber)) DoubleType
    else StringType
  }

  private def outputTypeIdType(config: HubConfig): DataType =
    config.outputTypeIdDatatype match {
      case "character" => StringType
      case "double"    => DoubleType
      case "integer"   => LongType
      case "logical"   => BooleanType
      case "Date"      => DateType
      case _ => // "auto": stable string unless every configured id is numeric
        val ids = config.outputTypeIdValues.filterNot(_.isNull)
        if (ids.nonEmpty && ids.forall(_.isNumber)) DoubleType else StringType
    }

  private def valueType(config: HubConfig): DataType = {
    val ts = config.valueTypes
    if (ts.isEmpty || ts.contains("double")) DoubleType
    else if (ts.forall(_ == "integer")) LongType
    else DoubleType
  }

  def deriveSchema(config: HubConfig): StructType = {
    val taskIds = config.taskIdValues
    val taskFields = taskIds.map { case (name, values) =>
      StructField(name, typeOfValues(values), nullable = true)
    }
    val roundIdType = config.roundIdVariable
      .flatMap(v => taskIds.collectFirst { case (n, vs) if n == v => typeOfValues(vs) })
      .getOrElse(StringType)
    StructType(
      taskFields ++ Seq(
        StructField("output_type", StringType),
        StructField("output_type_id", outputTypeIdType(config)),
        StructField("value", valueType(config)),
        StructField("round_id", roundIdType),
        StructField("model_id", StringType),
      ))
  }
}
