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
      // the script and comment each carry a link that must NOT be
      // extracted (dead regions are skipped whole by both walkers)
      lit("<script>var x = "), d, lit("; if (x < 2 && x > 0) { x = 1; } " +
        "var u = '<a href=\"https://dropped.example.com/s\"></a>';</script>"),
      lit("</head><body><!-- build "), expr("doc_id % 13").cast("string"),
      lit(" <a href=\"https://dropped.example.com/c\"></a> -->"),
      lit("<nav>Home &gt; Section "), expr("doc_id % 7").cast("string"), lit("</nav>"),
      // empty-anchor links: zero extracted text (inline tags, no
      // content), so q_html_extract's oracle is untouched; hrefs feed
      // q_html_links/q_domain_mix — a 20-site spread, one hot hub
      // domain with an entity-encoded query string, one relative link
      lit("<div class=\"links\"><a href=\"https://site"),
      expr("doc_id % 20").cast("string"),
      lit(".example.com/page/"), expr("doc_id % 100").cast("string"),
      lit("\"></a><a href=\"https://hub.example.com/item?id="),
      expr("doc_id % 50").cast("string"),
      lit("&amp;ref=nav\"></a><a href=\"/about\"></a></div>"),
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

  /** The per-document link relation (doc_id, pos, url) — one codegen
    * [[graft.functions.HtmlLinks]] walk per row, positions 1-based in
    * document order. Dead-region links (script/comment) never appear.
    */
  def qHtmlLinks(spark: SparkSession, dir: String): DataFrame =
    pageTable(spark, dir)
      .select(col("doc_id"),
        posexplode(graft.functions.HtmlLinks(col("page"))).as(Seq("pos0", "url")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("url"))
      .orderBy(col("doc_id"), col("pos"))

  val qHtmlLinksSql: String =
    """WITH l AS (
      |  SELECT doc_id, 1 AS pos,
      |    'https://site' || (doc_id % 20) || '.example.com/page/' || (doc_id % 100) AS url
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 2,
      |    'https://hub.example.com/item?id=' || (doc_id % 50) || '&ref=nav'
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 3, '/about' FROM documents
      |)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(pos AS BIGINT) AS pos, url
      |FROM l ORDER BY doc_id, pos""".stripMargin

  /** PER-DOMAIN SOURCE MIX over the URL-level-deduplicated link set —
    * the crawl-frontier dual of the corpus source-mixing reports
    * ([[TextAnalysis]] source drift / [[Corpus]] temperature sampling):
    * distinct URLs and linking documents per domain, the domain's share
    * of the deduplicated frontier in exact basis points, and the
    * admission rate a UNIFORM-mixing frontier scheduler would apply
    * (`admit_bp = min(10^4, ceil(total/n_domains)·10^4 / n_urls)` — hot
    * domains are throttled toward the per-domain budget, the standard
    * politeness/diversity shape).
    *
    * Scale: the link walk is a row expression; URL-level dedup and both
    * distinct counts are domain/URL-keyed hash aggregates (map-side
    * partial, no all-pairs anything). The corpus is scanned ONCE: a URL
    * determines its domain, so per-domain distinct-URL sets partition
    * the frontier and the totals row derives from the domain-sized
    * aggregate (localCheckpointed — it feeds both the output and the
    * broadcast totals) instead of a second corpus walk.
    */
  def qDomainMix(spark: SparkSession, dir: String): DataFrame = {
    val du = pageTable(spark, dir)
      .select(col("doc_id"), explode(graft.functions.HtmlLinks(col("page"))).as("url"))
      .select(col("doc_id"), col("url"),
        when(locate("://", col("url")) > 0,
          substring_index(substring_index(col("url"), "://", -1), "/", 1))
          .otherwise(lit("(relative)")).as("domain"))
    val per = du.groupBy(col("domain"))
      .agg(countDistinct(col("url")).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"))
      .localCheckpoint()
    val totals = per.agg(sum(col("n_urls")).as("total_urls"),
      count(lit(1)).as("n_domains"))
    per.crossJoin(broadcast(totals))
      .select(col("domain"), col("n_urls"), col("n_docs"),
        expr("n_urls * 10000 DIV total_urls").as("share_bp"),
        expr("least(10000, ((total_urls + n_domains - 1) DIV n_domains) * 10000 DIV n_urls)")
          .as("admit_bp"))
      .orderBy(col("n_urls").desc, col("domain"))
  }

  val qDomainMixSql: String =
    """WITH l AS (
      |  SELECT doc_id,
      |    'https://site' || (doc_id % 20) || '.example.com/page/' || (doc_id % 100) AS url
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 'https://hub.example.com/item?id=' || (doc_id % 50) || '&ref=nav'
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, '/about' FROM documents
      |), d AS (
      |  SELECT doc_id, url,
      |    CASE WHEN strpos(url, '://') > 0
      |         THEN string_split(string_split(url, '://')[2], '/')[1]
      |         ELSE '(relative)' END AS domain
      |  FROM l
      |), per AS (
      |  SELECT domain, count(DISTINCT url) AS n_urls,
      |    count(DISTINCT doc_id) AS n_docs
      |  FROM d GROUP BY 1
      |), t AS (
      |  SELECT sum(n_urls) AS total_urls, count(*) AS n_domains FROM per
      |)
      |SELECT domain, CAST(n_urls AS BIGINT) AS n_urls,
      |  CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_urls * 10000 // total_urls AS BIGINT) AS share_bp,
      |  CAST(least(10000, ((total_urls + n_domains - 1) // n_domains) * 10000 // n_urls) AS BIGINT) AS admit_bp
      |FROM per, t ORDER BY n_urls DESC, domain""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_html_extract" -> (qHtmlExtract _),
    "q_html_boilerplate" -> (qHtmlBoilerplate _),
    "q_html_links" -> (qHtmlLinks _),
    "q_domain_mix" -> (qDomainMix _))

  def oracle: Map[String, String] = Map(
    "q_html_extract" -> qHtmlExtractSql,
    "q_html_boilerplate" -> qHtmlBoilerplateSql,
    "q_html_links" -> qHtmlLinksSql,
    "q_domain_mix" -> qDomainMixSql)
}
