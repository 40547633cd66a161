package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semi-structured ingestion via Spark 4's VARIANT type — the modern
  * lakehouse answer to JSON-string columns. At 100 TB the difference is
  * structural: a string `props` column is re-tokenized by every
  * `get_json_object` call, while `parse_json` decodes ONCE into variant's
  * binary encoding, after which each `variant_get` is an O(fields) binary
  * probe, variant columns persist to parquet (shreddable), and typed
  * extraction casts happen engine-side. These queries exercise the full
  * lifecycle: construct → parse → typed multi-path extraction → aggregate
  * ([[qVariantExtract]]), the parquet roundtrip serving from a STORED
  * variant column ([[qVariantStored]]), and schema-drift monitoring over
  * heterogeneous objects ([[qVariantSchema]]).
  *
  * Oracle strategy: the enriched JSON document is CONSTRUCTED in-plan from
  * typed columns (plus the raw `props` payload), so DuckDB replays the
  * final values straight from the typed columns — the hash match then
  * proves Spark's construct→parse→extract pipeline is lossless end to end,
  * a stronger check than re-parsing the same JSON in both engines.
  */
object SemiStructured {

  /** The enriched semi-structured document: typed columns folded into a
    * JSON object with the raw `props` nested under `meta`, and a `flag`
    * field PRESENT ONLY on every 5th event (heterogeneous-schema ingest,
    * the normal state of real event streams). Money is exact-decimal cents
    * (the [[Tables.dec]] discipline) so the JSON integer text is
    * engine-deterministic.
    */
  /** The enriched JSON events feed — shared with the stored-variant
    * artifact builder ([[Artifacts.ensureVariantStore]]).
    */
  private[ops] def enrichedEvents(spark: SparkSession, dir: String): DataFrame =
    enriched(spark, dir)

  private def enriched(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("user_id"),
        (Tables.dec(col("value")) * 100).cast(LongType).as("cents"), col("props"))
      .withColumn("doc", concat(
        lit("{\"type\":\""), col("event_type"),
        lit("\",\"user\":"), col("user_id"),
        lit(",\"amount_cents\":"), col("cents"),
        when(col("event_id") % 5 === 0, lit(",\"flag\":true")).otherwise(lit("")),
        lit(",\"meta\":"), col("props"), lit("}")))

  /** Parse-once, extract-many: one `parse_json` per row, then four typed
    * `variant_get` probes (two scalars, one nested path, one
    * present-on-some-rows path whose absence is NULL, not an error),
    * aggregated per event type. One scan, no shuffle before the partial
    * aggregate; the variant decode and every probe sit in a single
    * codegen'd projection.
    */
  def qVariantExtract(spark: SparkSession, dir: String): DataFrame =
    enriched(spark, dir)
      .withColumn("v", parse_json(col("doc")))
      .select(
        expr("variant_get(v, '$.type', 'string')").as("etype"),
        expr("variant_get(v, '$.user', 'long')").as("user"),
        expr("variant_get(v, '$.amount_cents', 'long')").as("cents"),
        expr("variant_get(v, '$.meta.k', 'long')").as("k"),
        expr("variant_get(v, '$.flag', 'boolean')").as("flag"))
      .groupBy(col("etype"))
      .agg(count(lit(1)).as("n"),
        sum(col("user")).as("sum_user"),
        sum(col("cents")).as("sum_cents"),
        sum(col("k")).as("sum_k"),
        sum(when(col("flag"), 1L).otherwise(0L)).as("n_flagged"))
      .orderBy(col("etype"))

  /** DuckDB replay straight from the typed source columns — extraction
    * must invert construction exactly for the hash to match.
    */
  val qVariantExtractSql: String =
    """SELECT event_type AS etype,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(user_id) AS BIGINT) AS sum_user,
      |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(sum(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
      |FROM events GROUP BY event_type ORDER BY etype""".stripMargin

  /** The STORED-variant lifecycle: persist `(event_id, v)` with `v` a
    * VARIANT column to parquet (Spark 4 writes variant natively — the
    * parse cost is paid once at ingest), then serve the same typed
    * extraction from the stored binary column. The output is identical to
    * [[qVariantExtract]] (and hash-gated against the same
    * from-typed-columns oracle), proving the parquet roundtrip lossless;
    * the serving scan never touches the original JSON strings.
    */
  def qVariantStored(spark: SparkSession, dir: String): DataFrame = {
    // parse-once-at-ingest: the stored variant column is built once per
    // (corpus, session) — round 16, Artifacts.ensureVariantStore
    val stored = Artifacts.ensureVariantStore(spark, dir)
    spark.read.parquet(s"$stored/events.parquet")
      .select(
        expr("variant_get(v, '$.type', 'string')").as("etype"),
        expr("variant_get(v, '$.user', 'long')").as("user"),
        expr("variant_get(v, '$.amount_cents', 'long')").as("cents"),
        expr("variant_get(v, '$.meta.k', 'long')").as("k"),
        expr("variant_get(v, '$.flag', 'boolean')").as("flag"))
      .groupBy(col("etype"))
      .agg(count(lit(1)).as("n"),
        sum(col("user")).as("sum_user"),
        sum(col("cents")).as("sum_cents"),
        sum(col("k")).as("sum_k"),
        sum(when(col("flag"), 1L).otherwise(0L)).as("n_flagged"))
      .orderBy(col("etype"))
  }

  /** SCHEMA-DRIFT monitor over heterogeneous semi-structured ingest: rows
    * per (event type, `schema_of_variant`) — the dashboard that catches a
    * producer silently adding/retyping fields. The enriched stream carries
    * exactly two object shapes (with/without `flag`), so the report pins
    * both the schema-string derivation and the per-shape row accounting.
    * Oracle: the shape is a pure function of `event_id % 5`; the schema
    * strings are Spark's canonical rendering, replayed as literals.
    */
  def qVariantSchema(spark: SparkSession, dir: String): DataFrame =
    enriched(spark, dir)
      .withColumn("v", parse_json(col("doc")))
      .select(col("event_type"), expr("schema_of_variant(v)").as("vschema"))
      .groupBy(col("event_type"), col("vschema"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("vschema"))

  val qVariantSchemaSql: String =
    """SELECT event_type,
      |  CASE WHEN event_id % 5 = 0
      |    THEN 'OBJECT<amount_cents: BIGINT, flag: BOOLEAN, meta: OBJECT<k: BIGINT>, type: STRING, user: BIGINT>'
      |    ELSE 'OBJECT<amount_cents: BIGINT, meta: OBJECT<k: BIGINT>, type: STRING, user: BIGINT>'
      |  END AS vschema,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY 1, 2 ORDER BY event_type, vschema""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_variant_extract" -> (qVariantExtract _),
    "q_variant_stored" -> (qVariantStored _),
    "q_variant_schema" -> (qVariantSchema _))

  def oracle: Map[String, String] = Map(
    "q_variant_extract" -> qVariantExtractSql,
    "q_variant_stored" -> qVariantExtractSql,
    "q_variant_schema" -> qVariantSchemaSql)
}
