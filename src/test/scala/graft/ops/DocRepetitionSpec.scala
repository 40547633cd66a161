package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextOps.tokens

/** Pins [[graft.functions.RepetitionProfile]] (the zero-shuffle per-row
  * profile) against an INDEPENDENT relational rebuild — the original
  * explode → groupBy(doc, kind, unit) formulation, kept here as the
  * reference implementation — over randomized newline/whitespace soup.
  * The two compute the same exact-integer basis points through entirely
  * different execution paths (JVM hash maps in a codegen projection vs
  * Catalyst hash aggregates), so agreement pins tokenization, split
  * semantics (limit −1 empties), code-point lengths, and every DIV
  * boundary at once. The DuckDB oracle is the third, cross-engine leg.
  */
class DocRepetitionSpec extends SparkFunSuite {

  /** The original relational formulation (reference implementation). */
  private def relationalProfile(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    def gramUnits(n: Int): Column =
      when(size(col("t")) >= n,
        transform(sequence(lit(0), size(col("t")) - n),
          i => struct(lit("g" + n).as("kind"),
            concat_ws(" ", slice(col("t"), i + 1, lit(n))).as("u"))))
        .otherwise(array().cast("array<struct<kind:string,u:string>>"))
    def splitUnits(kind: String, sep: String): Column =
      transform(split(col("text"), sep),
        l => struct(lit(kind).as("kind"), l.as("u")))
    val exploded = docs
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        tokens(col("text")).as("t"), col("text"))
      .select(col("doc_id"), col("n_chars"),
        explode(concat(
          splitUnits("line", "\n"), splitUnits("para", "\n\n"),
          gramUnits(2), gramUnits(3), gramUnits(4))).as("e"))
      .select(col("doc_id"), col("n_chars"),
        col("e.kind").as("kind"), col("e.u").as("u"))
    val perKind = exploded
      .groupBy(col("doc_id"), col("n_chars"), col("kind"), col("u"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n_chars"), col("kind"))
      .agg(sum(col("c")).as("n_units"), count(lit(1)).as("n_distinct"),
        sum(when(col("c") >= 2, col("c") * length(col("u"))).otherwise(0L))
          .as("dup_chars"),
        sum(col("c") * length(col("u"))).as("tot_chars"),
        max(col("c") * length(col("u"))).as("top_mass"))
    def pick(kind: String, e: String): Column =
      coalesce(max(when(col("kind") === kind, expr(e))), lit(0L))
    perKind.groupBy(col("doc_id"))
      .agg(
        pick("line", "(n_units - n_distinct) * 10000 DIV n_units").as("dup_line_bp"),
        pick("line", "CASE WHEN tot_chars > 0 THEN dup_chars * 10000 DIV tot_chars END")
          .as("dup_line_char_bp"),
        pick("para", "(n_units - n_distinct) * 10000 DIV n_units").as("dup_para_bp"),
        pick("para", "CASE WHEN tot_chars > 0 THEN dup_chars * 10000 DIV tot_chars END")
          .as("dup_para_char_bp"),
        pick("g2", "CASE WHEN n_chars > 0 THEN top_mass * 10000 DIV n_chars END")
          .as("top2_bp"),
        pick("g3", "CASE WHEN n_chars > 0 THEN top_mass * 10000 DIV n_chars END")
          .as("top3_bp"),
        pick("g4", "CASE WHEN n_chars > 0 THEN top_mass * 10000 DIV n_chars END")
          .as("top4_bp"))
  }

  test("expression profile equals the relational rebuild on newline/whitespace soup") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L) // deterministic
    val words = Seq("aa", "bb", "cc", "dd", "ee", "the", "x", "longword")
    val seps = Seq(" ", " ", "\n", "\n\n", "  ", " \n ", "\n\n\n")
    val docs = (0 until 80).map { i =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(50)).foreach { _ =>
        sb.append(words(rnd.nextInt(words.length)))
        sb.append(seps(rnd.nextInt(seps.length)))
      }
      (i.toLong, sb.toString, "en", "s", sb.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("doc-rep-soup")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.qDocRepetition(spark, dir)
      .collect().map(_.toSeq).toSeq
    val want = relationalProfile(spark.read.parquet(s"$dir/documents.parquet"))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(got === want)
    // the soup actually exercised the line/para duplicate paths
    assert(got.exists(r => r(1).asInstanceOf[Long] > 0L), "no dup lines in soup")
    assert(got.exists(r => r(3).asInstanceOf[Long] > 0L), "no dup paras in soup")
  }

  test("expression profile on the SF corpus equals the relational rebuild") {
    val dir = "/root/testdata/sf0.001"
    val got = TextAnalysis.qDocRepetition(spark, dir)
      .collect().map(_.toSeq).toSeq
    val want = relationalProfile(spark.read.parquet(s"$dir/documents.parquet"))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(got === want)
  }
}
