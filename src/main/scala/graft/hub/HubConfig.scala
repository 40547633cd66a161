package graft.hub

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import scala.jdk.CollectionConverters._

/** Parsed `hub-config/tasks.json` (driver-side configuration, never a table —
  * reference parses it with `json.load` at model_output.py:206).
  *
  * The shape (keys `schema_version`, `rounds[].model_tasks[].task_ids`,
  * `rounds[].model_tasks[].output_type`, `output_type_id_datatype`,
  * `derived_task_ids`, `round_id_from_variable`/`round_id`) is taken from the
  * reference's committed config
  * `test/integration/data/flu-metrocast/hub-config/tasks.json` and the
  * loaded-keys golden at test_model_output_integration.py:155-160.
  */
final class HubConfig(val root: JsonNode) {

  def keys: Seq[String] = root.fieldNames.asScala.toSeq

  def rounds: Seq[JsonNode] =
    Option(root.get("rounds")).map(_.elements.asScala.toSeq).getOrElse(Nil)

  def modelTasks: Seq[JsonNode] =
    rounds.flatMap(r =>
      Option(r.get("model_tasks")).map(_.elements.asScala.toSeq).getOrElse(Nil))

  /** Hub-level `output_type_id_datatype` (`"auto"` when absent). */
  def outputTypeIdDatatype: String =
    Option(root.get("output_type_id_datatype")).map(_.asText).getOrElse("auto")

  /** Task-id column names in first-appearance order across all rounds/tasks,
    * each with the union of its `required` + `optional` value nodes.
    */
  def taskIdValues: Seq[(String, Seq[JsonNode])] = {
    val order = scala.collection.mutable.LinkedHashMap.empty[String, Vector[JsonNode]]
    for {
      mt <- modelTasks
      taskIds <- Option(mt.get("task_ids")).toSeq
      name <- taskIds.fieldNames.asScala
    } {
      val spec = taskIds.get(name)
      val vals = Seq("required", "optional").flatMap { k =>
        Option(spec.get(k)).filterNot(_.isNull)
          .map(_.elements.asScala.toSeq).getOrElse(Nil)
      }
      order.updateWith(name) {
        case Some(prev) => Some(prev ++ vals)
        case None       => Some(vals.toVector)
      }
    }
    order.toSeq
  }

  /** Union of `output_type.<t>.output_type_id.{required,optional}` values
    * across every model task (used by the `auto` datatype rule).
    */
  def outputTypeIdValues: Seq[JsonNode] =
    for {
      mt <- modelTasks
      ot <- Option(mt.get("output_type")).toSeq
      typeName <- ot.fieldNames.asScala.toSeq
      spec <- Option(ot.get(typeName).get("output_type_id")).toSeq
      k <- Seq("required", "optional")
      arr <- Option(spec.get(k)).filterNot(_.isNull).toSeq
      v <- arr.elements.asScala
    } yield v

  /** `output_type.<t>.value.type` strings across every model task. */
  def valueTypes: Seq[String] =
    for {
      mt <- modelTasks
      ot <- Option(mt.get("output_type")).toSeq
      typeName <- ot.fieldNames.asScala.toSeq
      value <- Option(ot.get(typeName).get("value")).toSeq
      t <- Option(value.get("type")).map(_.asText).toSeq
    } yield t

  /** The task-id variable that carries the round id, when
    * `round_id_from_variable: true` (tasks.json:5-6).
    */
  def roundIdVariable: Option[String] =
    rounds.collectFirst {
      case r if Option(r.get("round_id_from_variable")).exists(_.asBoolean(false)) =>
        r.get("round_id").asText
    }
}

object HubConfig {
  private val mapper = new ObjectMapper()

  def fromJson(json: String): HubConfig = new HubConfig(mapper.readTree(json))

  /** Load `<hubPath>/hub-config/tasks.json` through the Hadoop filesystem of
    * the hub URI (local or s3a). Returns None on any failure (reference
    * `_read_tasks`, model_output.py:192-209); callers decide fatality.
    */
  def load(hubPath: String, conf: Configuration = new Configuration()): Option[HubConfig] =
    try {
      val p = new Path(PathParser.sanitizePath(hubPath), "hub-config/tasks.json")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(fromJson(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)))
        finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
