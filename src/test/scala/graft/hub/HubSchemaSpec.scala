package graft.hub

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** HubSchema derivation rules from SURVEY.md §1.3, exercised over the
  * committed flu-metrocast hub config (reference
  * test/integration/data/flu-metrocast/hub-config/tasks.json) plus synthetic
  * configs for the policy branches.
  */
class HubSchemaSpec extends AnyFunSuite {

  private def fluMetrocast: HubConfig = {
    val json = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "src/test/resources/integration/data/flu-metrocast/hub-config/tasks.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    HubConfig.fromJson(json)
  }

  test("loaded config keys golden (test_model_output_integration.py:155-160)") {
    assert(fluMetrocast.keys ==
      Seq("schema_version", "rounds", "output_type_id_datatype", "derived_task_ids"))
  }

  test("flu-metrocast schema derivation") {
    val s = HubSchema.deriveSchema(fluMetrocast)
    val byName = s.fields.map(f => f.name -> f.dataType).toMap
    assert(s.fieldNames.toSeq == Seq(
      "reference_date", "target", "horizon", "location", "target_end_date",
      "output_type", "output_type_id", "value", "round_id", "model_id"))
    assert(byName("reference_date") == DateType) //  all values ISO dates
    assert(byName("target") == StringType)
    assert(byName("horizon") == LongType) //          values -1..4
    assert(byName("location") == StringType) //       "NYC", "Austin", ...
    assert(byName("target_end_date") == DateType)
    assert(byName("output_type") == StringType)
    // output_type_id_datatype=auto and every configured id is numeric
    // (quantile levels) → double. Documented policy from SURVEY §1.3.
    assert(byName("output_type_id") == DoubleType)
    assert(byName("value") == DoubleType) //          value.type = double
    // round_id_from_variable: true, round_id: reference_date → date
    assert(byName("round_id") == DateType)
    assert(byName("model_id") == StringType)
  }

  test("auto output_type_id resolves to string when any id is non-numeric") {
    val json =
      """{"rounds":[{"round_id":"origin_date","round_id_from_variable":true,
        |"model_tasks":[{"task_ids":{"origin_date":{"required":null,"optional":["2024-01-01"]},
        |"horizon":{"required":[1,2],"optional":null}},
        |"output_type":{
        |  "pmf":{"output_type_id":{"required":["large_increase","increase"]},"value":{"type":"double"}},
        |  "quantile":{"output_type_id":{"required":[0.5,0.75]},"value":{"type":"double"}}}}]}],
        |"output_type_id_datatype":"auto"}""".stripMargin
    val s = HubSchema.deriveSchema(HubConfig.fromJson(json))
    val byName = s.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("output_type_id") == StringType)
    assert(byName("horizon") == LongType)
    assert(byName("origin_date") == DateType)
    assert(byName("round_id") == DateType)
  }

  test("explicit output_type_id_datatype overrides auto") {
    def cfg(dt: String) = HubConfig.fromJson(
      s"""{"rounds":[{"model_tasks":[{"task_ids":{"h":{"required":[1],"optional":null}},
         |"output_type":{"q":{"output_type_id":{"required":[0.5]},"value":{"type":"integer"}}}}]}],
         |"output_type_id_datatype":"$dt"}""".stripMargin)
    def otid(dt: String) =
      HubSchema.deriveSchema(cfg(dt)).fields.find(_.name == "output_type_id").get.dataType
    assert(otid("character") == StringType)
    assert(otid("double") == DoubleType)
    assert(otid("integer") == LongType)
    assert(otid("logical") == BooleanType)
    assert(otid("Date") == DateType)
    // value.type integer (no double anywhere) → LongType
    val s = HubSchema.deriveSchema(cfg("auto"))
    assert(s.fields.find(_.name == "value").get.dataType == LongType)
    // no round_id_from_variable → string round_id
    assert(s.fields.find(_.name == "round_id").get.dataType == StringType)
  }

  test("mixed numeric task-id values → double; mixed types → string") {
    val json =
      """{"rounds":[{"model_tasks":[{"task_ids":{
        |"a":{"required":[0.5,1],"optional":null},
        |"b":{"required":[1,"x"],"optional":null}},
        |"output_type":{"q":{"output_type_id":{"required":[0.5]},"value":{"type":"double"}}}}]}]}""".stripMargin
    val s = HubSchema.deriveSchema(HubConfig.fromJson(json))
    val byName = s.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("a") == DoubleType)
    assert(byName("b") == StringType)
  }
}
