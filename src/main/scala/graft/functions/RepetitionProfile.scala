package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd INTRA-document repetition profile (Rae et al. 2021,
  * Gopher §A1.1) — the per-document basis-point vector
  * `[dup_line_bp, dup_line_char_bp, dup_para_bp, dup_para_char_bp,
  * top2_bp, top3_bp, top4_bp]` computed in ONE pass over the text.
  *
  * The profile is a pure function of the single document, so computing
  * it relationally (explode every line/paragraph/n-gram, then
  * groupBy(doc, kind, unit)) shuffles ~4× the token stream for a
  * per-row answer — measured 15.5× on the first decade (BENCH r14: the
  * unit-level hash aggregate spills at 10×). This expression is the
  * zero-shuffle shape: a narrow projection, embarrassingly parallel,
  * per-row state bounded by the document's own unit counts.
  *
  * Semantics are pinned to the relational/oracle formulation exactly:
  * lines/paragraphs split the RAW text on `\n` / `\n\n` with Java regex
  * limit −1 (Spark `split` keeps leading AND trailing empty segments);
  * tokens are `lower(text)` split on `\s+` via [[UTF8String.toLowerCase]]
  * (Spark's `lower`, locale-independent); unit lengths and `n_chars`
  * count CODE POINTS (Spark `length`); every ratio is exact integer
  * basis points `x·10⁴ DIV y`; the top-n-gram statistic is the
  * deterministic mass leader `max(count · len)` (the tie-total order the
  * relational form used). DocRepetitionSpec cross-checks this expression
  * against an independent relational rebuild on newline-soup fixtures.
  */
case class RepetitionProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_profile expects a string argument, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    RepetitionProfile.profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.RepetitionProfile.profile($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionProfile {

  /** `repetition_profile(s)` as a Column (array<long> of 7 bp values). */
  def apply(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      RepetitionProfile(org.apache.spark.sql.graftbridge.ColumnBridge.expression(s)))

  private def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong

  /** (dupUnits_bp, dupChars_bp) over a split-unit kind: basis points of
    * repeated occurrences by unit count and by character mass (ALL
    * occurrences of a repeated unit count toward the mass).
    */
  private def dupStats(units: Array[String]): (Long, Long) = {
    val counts = new java.util.HashMap[String, Int](units.length * 2)
    units.foreach(u => counts.merge(u, 1, (a, b) => a + b))
    val nUnits = units.length.toLong
    val nDistinct = counts.size.toLong
    var dupChars = 0L
    var totChars = 0L
    counts.forEach { (u, c) =>
      val mass = c.toLong * cpLen(u)
      totChars += mass
      if (c >= 2) dupChars += mass
    }
    ((nUnits - nDistinct) * 10000L / nUnits,
      if (totChars > 0) dupChars * 10000L / totChars else 0L)
  }

  /** `max(count · len)` over the doc's n-grams, 0 when fewer than n
    * tokens (the deterministic top-gram mass — "most frequent" is
    * tie-ambiguous across engines; this is a total integer order).
    */
  private def topGramMass(toks: Array[String], n: Int): Long = {
    if (toks.length < n) return 0L
    val counts = new java.util.HashMap[String, Int](toks.length * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      counts.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    var top = 0L
    counts.forEach { (u, c) =>
      val mass = c.toLong * cpLen(u)
      if (mass > top) top = mass
    }
    top
  }

  /** The 7-element bp vector (see the class scaladoc for the layout). */
  def profile(text: UTF8String): ArrayData = {
    val raw = text.toString
    val nChars = text.numChars().toLong
    val (dupLine, dupLineChar) = dupStats(raw.split("\n", -1))
    val (dupPara, dupParaChar) = dupStats(raw.split("\n\n", -1))
    // Spark's lower() — UTF8String.toLowerCase, locale-independent
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    def topBp(n: Int): Long =
      if (nChars > 0) topGramMass(toks, n) * 10000L / nChars else 0L
    new GenericArrayData(Array[Long](
      dupLine, dupLineChar, dupPara, dupParaChar, topBp(2), topBp(3), topBp(4)))
  }
}
