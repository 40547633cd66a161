package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd MAIN-CONTENT extraction over an HTML string column —
  * the markup-strip stage every LLM data pipeline runs before anything
  * else (the CommonCrawl WET / trafilatura class, reduced to a pinned,
  * engine-replayable core). One bytewise pass, TOTAL on arbitrary input
  * (fuzz-pinned: garbage in, string out, never a throw):
  *
  *   - `<!-- ... -->` comments dropped (unterminated → to end of input);
  *   - `<script ...>...</script>` and `<style ...>...</style>` dropped
  *     WHOLE, case-insensitive, including any `<`/`&` inside;
  *   - other tags stripped; a BLOCK-level tag (open or close: p, div, br,
  *     hr, li, ul, ol, h1–h6, nav, footer, header, title, table, tr, td,
  *     th, section, article, head, body, html, blockquote, pre, form)
  *     emits a line break; inline tags emit nothing;
  *   - `<` not followed by a letter, `/`, `!` or `?` is literal text;
  *   - the PINNED entity set decodes: `&amp; &lt; &gt; &quot; &apos;`
  *     and `&nbsp;` (→ space); any other `&...` passes through literally;
  *   - post-pass: lines trim ASCII space/tab/CR, empty lines drop, the
  *     survivors join with a single `\n`.
  *
  * The semantics are deliberately a CLOSED FORM so the DuckDB oracle can
  * construct the expected clean text from the same arithmetic that
  * synthesized the page — a hash match proves the byte walk, the entity
  * decode and the block-tag line structure of every row. UTF-8 safe
  * bytewise: every byte the machine acts on is ASCII, and continuation
  * bytes (≥ 0x80) pass through untouched.
  *
  * Scale: a pure row expression inside whole-stage codegen — the
  * [[RepetitionProfile]] discipline (no explode, no shuffle; the
  * unit-level relational formulation of this stage measured 15.5×/decade
  * in round 14's profile rewrite).
  */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_text expects a string arg, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromBytes(HtmlText.extract(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes(" +
        s"graft.functions.HtmlText.extract($c.getBytes()));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlText {

  /** `html_text(page)` as a Column. */
  def apply(c: Column): Column =
    ColumnBridge.column(HtmlText(ColumnBridge.expression(c)))

  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "br", "hr", "li", "ul", "ol", "h1", "h2", "h3", "h4",
      "h5", "h6", "nav", "footer", "header", "title", "table", "tr", "td",
      "th", "section", "article", "head", "body", "html", "blockquote",
      "pre", "form").foreach(s.add)
    s
  }

  /** (entity-with-semicolon, replacement byte) — the pinned decode set. */
  private[functions] val Entities: Array[(String, Byte)] = Array(
    ("amp;", '&'.toByte), ("lt;", '<'.toByte), ("gt;", '>'.toByte),
    ("quot;", '"'.toByte), ("apos;", '\''.toByte), ("nbsp;", ' '.toByte))

  private[functions] def lower(c: Int): Int = if (c >= 'A' && c <= 'Z') c + 32 else c

  private[functions] def isLetter(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** True when `b[pos..]` starts with ASCII `s` case-insensitively. */
  private[functions] def startsWithIc(b: Array[Byte], pos: Int, s: String): Boolean = {
    if (pos + s.length > b.length) return false
    var k = 0
    while (k < s.length) {
      if (lower(b(pos + k) & 0xff) != s.charAt(k)) return false
      k += 1
    }
    true
  }

  private[functions] def indexOfIc(b: Array[Byte], from: Int, s: String): Int = {
    var p = math.max(from, 0)
    while (p <= b.length - s.length) {
      if (startsWithIc(b, p, s)) return p
      p += 1
    }
    -1
  }

  /** Position just past the next '>' at/after `from` (end of input if none). */
  private[functions] def pastGt(b: Array[Byte], from: Int): Int = {
    var p = from
    while (p < b.length && b(p) != '>') p += 1
    math.min(p + 1, b.length)
  }

  /** The full extraction pass — total on arbitrary bytes. */
  def extract(b: Array[Byte]): Array[Byte] = {
    val n = b.length
    val raw = new java.io.ByteArrayOutputStream(math.max(16, n / 2))
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      if (c == '<') {
        if (startsWithIc(b, i, "<!--")) {
          val e = indexOfIc(b, i + 4, "-->")
          i = if (e < 0) n else e + 3
        } else if (startsWithIc(b, i, "<script") &&
            (i + 7 >= n || !isLetter(b(i + 7) & 0xff))) {
          val e = indexOfIc(b, i + 7, "</script")
          i = if (e < 0) n else pastGt(b, e)
        } else if (startsWithIc(b, i, "<style") &&
            (i + 6 >= n || !isLetter(b(i + 6) & 0xff))) {
          val e = indexOfIc(b, i + 6, "</style")
          i = if (e < 0) n else pastGt(b, e)
        } else {
          var p = i + 1
          if (p < n && b(p) == '/') p += 1
          val next = if (p < n) b(p) & 0xff else -1
          if (isLetter(next)) {
            // tag: name = leading letters+digits, lowercased
            val sb = new java.lang.StringBuilder(8)
            var q = p
            while (q < n && sb.length < 12 && {
              val ch = b(q) & 0xff
              isLetter(ch) || (ch >= '0' && ch <= '9')
            }) { sb.append(lower(b(q) & 0xff).toChar); q += 1 }
            if (BlockTags.contains(sb.toString)) raw.write('\n')
            i = pastGt(b, q)
          } else if (next == '!' || next == '?') {
            i = pastGt(b, p) // markup declaration / processing instruction
          } else {
            raw.write('<'); i += 1 // literal '<' (not a tag start)
          }
        }
      } else if (c == '&') {
        var hit = -1
        var k = 0
        while (hit < 0 && k < Entities.length) {
          if (startsWithIc(b, i + 1, Entities(k)._1)) hit = k
          k += 1
        }
        if (hit >= 0) { raw.write(Entities(hit)._2); i += 1 + Entities(hit)._1.length }
        else { raw.write('&'); i += 1 }
      } else {
        raw.write(c); i += 1
      }
    }
    // post-pass: trim each line (space/tab/CR), drop empties, join with \n
    val body = raw.toByteArray
    val out = new java.io.ByteArrayOutputStream(body.length)
    var s = 0
    var wroteAny = false
    while (s <= body.length) {
      var e = s
      while (e < body.length && body(e) != '\n') e += 1
      var a = s
      var z = e
      while (a < z && (body(a) == ' ' || body(a) == '\t' || body(a) == '\r')) a += 1
      while (z > a && (body(z - 1) == ' ' || body(z - 1) == '\t' || body(z - 1) == '\r')) z -= 1
      if (z > a) {
        if (wroteAny) out.write('\n')
        out.write(body, a, z - a)
        wroteAny = true
      }
      s = e + 1
    }
    out.toByteArray
  }
}
