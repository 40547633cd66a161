package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Markup-strip / main-content extraction — the pre-processing stage every
  * LLM data pipeline runs before dedup/quality/tokenization (the
  * CommonCrawl WET / trafilatura class), round 15's addition following the
  * media-walker pattern ([[Multimodal.imageTable]]): HTML pages are
  * synthesized IN-PLAN from doc_id arithmetic + the real document text
  * (entity-escaped), the codegen [[graft.functions.HtmlText]] walker
  * strips them back to clean text, and the DuckDB oracle constructs the
  * expected text INDEPENDENTLY from the same arithmetic — no byte
  * inspection — so a hash match proves the tag walk, the script/style/
  * comment drops, the pinned entity decode and the block-line structure
  * of every row.
  *
  * Scale: the extraction is a pure row expression inside whole-stage
  * codegen (no explode, no shuffle, payload never leaves the executor);
  * the boilerplate report is one explode + one map-side-combinable
  * line aggregate — the shape a 100 TB crawl-cleaning pass needs.
  */
object HtmlExtract {

  /** Boilerplate-line bar: report lines present in ≥ 5% of documents. */
  val BoilerplateMinShareBp = 500L

  /** The synthesized page per document: real markup stress — DOCTYPE,
    * dropped style/script (with `<`, `&&` and braces inside), a comment,
    * nav/heading/footer boilerplate, the document text entity-escaped
    * inside the main div, a pinned-entity sampler line (incl. `&nbsp;`
    * and the unknown `&mdash;` that must pass through literally).
    */
  def pageTable(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id").cast("string")
    val esc = expr(
      """replace(replace(replace(replace(text, '&', '&amp;'),
        | '<', '&lt;'), '>', '&gt;'), '"', '&quot;')""".stripMargin.replace("\n", ""))
    val page = concat(
      lit("<!DOCTYPE html><html><head><title>Doc "), d, lit("</title>"),
      lit("<style>body { color: #222; } /* v"),
      expr("doc_id % 13").cast("string"), lit(" */</style>"),
      lit("<script>var x = "), d, lit("; if (x < 2 && x > 0) { x = 1; }</script>"),
      lit("</head><body><!-- build "), expr("doc_id % 13").cast("string"), lit(" -->"),
      lit("<nav>Home &gt; Section "), expr("doc_id % 7").cast("string"), lit("</nav>"),
      lit("<h1>Title "), d, lit("</h1>"),
      lit("<div class=\"main\"><p>"), esc, lit("</p></div>"),
      lit("<p>Tokens &amp; entities: A&lt;B &quot;q"),
      expr("doc_id % 5").cast("string"), lit("&quot; &nbsp;end</p>"),
      lit("<footer>(c) Example Corp &amp; Co &mdash; All rights reserved</footer>"),
      lit("</body></html>"))
    table(spark, dir, "documents").select(col("doc_id"), page.as("page"))
  }

  /** The extracted-text relation (shared by both queries): one codegen
    * walk per row, no shuffle before the presentation sort.
    */
  private def extracted(spark: SparkSession, dir: String): DataFrame =
    pageTable(spark, dir)
      .select(col("doc_id"), graft.functions.HtmlText(col("page")).as("extracted"))

  def qHtmlExtract(spark: SparkSession, dir: String): DataFrame =
    extracted(spark, dir)
      .select(col("doc_id"), col("extracted"),
        size(split(col("extracted"), "\n")).cast("long").as("n_lines"),
        length(col("extracted")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))

  /** Boilerplate-line report over the EXTRACTED text: lines shared by
    * ≥ [[BoilerplateMinShareBp]] of documents (the nav variants and the
    * footer on this corpus) with exact basis-point shares — the report a
    * crawl-cleaning pass reads to build its boilerplate drop-list.
    */
  def qHtmlBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val lines = extracted(spark, dir)
      .select(col("doc_id"), explode(split(col("extracted"), "\n")).as("line"))
    val nDocs = table(spark, dir, "documents").agg(count(lit(1)).as("n_docs"))
    lines
      .groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * 10000 >= col("n_docs") * BoilerplateMinShareBp)
      .select(col("line"), col("df"),
        expr(s"df * 10000 DIV n_docs").as("share_bp"))
      .orderBy(col("df").desc, col("line"))
  }

  /** The oracle's independent construction of the extracted text: the
    * known boilerplate lines from doc_id arithmetic, the document text
    * split/trimmed/joined by the same pinned line rules — NO HTML
    * parsing anywhere on the oracle side.
    */
  private val expectedSql: String =
    """src AS (
      |  SELECT doc_id,
      |    array_to_string(
      |      list_filter(
      |        list_transform(string_split(text, chr(10)),
      |          s -> trim(s, ' ' || chr(9) || chr(13))),
      |        s -> s <> ''),
      |      chr(10)) AS body
      |  FROM documents
      |), e AS (
      |  SELECT doc_id,
      |    'Doc ' || doc_id || chr(10) ||
      |    'Home > Section ' || (doc_id % 7) || chr(10) ||
      |    'Title ' || doc_id || chr(10) ||
      |    CASE WHEN body = '' THEN '' ELSE body || chr(10) END ||
      |    'Tokens & entities: A<B "q' || (doc_id % 5) || '"  end' || chr(10) ||
      |    '(c) Example Corp & Co &mdash; All rights reserved' AS extracted
      |  FROM src
      |)""".stripMargin

  val qHtmlExtractSql: String =
    s"""WITH $expectedSql
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, extracted,
       |  CAST(len(string_split(extracted, chr(10))) AS BIGINT) AS n_lines,
       |  CAST(length(extracted) AS BIGINT) AS n_chars
       |FROM e ORDER BY doc_id""".stripMargin

  val qHtmlBoilerplateSql: String =
    s"""WITH $expectedSql, lines AS (
       |  SELECT doc_id, unnest(string_split(extracted, chr(10))) AS line FROM e
       |), n AS (SELECT count(*) AS n_docs FROM documents),
       |df AS (SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY 1)
       |SELECT line, CAST(df AS BIGINT) AS df,
       |  CAST(df * 10000 // n_docs AS BIGINT) AS share_bp
       |FROM df, n WHERE df * 10000 >= n_docs * $BoilerplateMinShareBp
       |ORDER BY df DESC, line""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_html_extract" -> (qHtmlExtract _),
    "q_html_boilerplate" -> (qHtmlBoilerplate _))

  def oracle: Map[String, String] = Map(
    "q_html_extract" -> qHtmlExtractSql,
    "q_html_boilerplate" -> qHtmlBoilerplateSql)
}
