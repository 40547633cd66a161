package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd LINK EXTRACTION over an HTML string column — the
  * crawl-side dual of [[HtmlText]] (round 16, VERDICT r15 item 3): the
  * `<a href>` targets a crawler frontier / URL-dedup / per-domain mixing
  * stage consumes, emitted as an `array<string>` in document order. One
  * bytewise pass sharing [[HtmlText]]'s skip machinery, TOTAL on
  * arbitrary input (fuzz-pinned: garbage in, array out, never a throw):
  *
  *   - `<!-- ... -->`, `<script>...</script>`, `<style>...</style>`
  *     regions are skipped WHOLE — links inside them are dead text, not
  *     frontier candidates (same region rules as [[HtmlText]]);
  *   - an OPENING `a` tag (exact name, case-insensitive) contributes its
  *     first `href` attribute value: `href` preceded by whitespace,
  *     optional spaces around `=`, value either quoted (`"`/`'`, to the
  *     matching quote, unterminated → to the tag's `>`) or bare (to the
  *     next whitespace or `>`);
  *   - the value decodes the same PINNED entity set as [[HtmlText]]
  *     (`&amp;` in query strings is the common case); empty values are
  *     not emitted; closing tags and non-`a` tags contribute nothing.
  *
  * The semantics are a CLOSED FORM so the DuckDB oracle reconstructs the
  * expected URL list from the same arithmetic that synthesized the page
  * ([[graft.ops.HtmlExtract.pageTable]]) — no HTML parsing oracle-side.
  *
  * Scale: a pure row expression inside whole-stage codegen — no explode,
  * no shuffle until the caller aggregates the (already tiny) URL rows;
  * the page bytes never leave the executor.
  */
case class HtmlLinks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_links expects a string arg, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    HtmlLinks.links(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlLinks.links($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlLinks {

  /** `html_links(page)` as a Column. */
  def apply(c: Column): Column =
    ColumnBridge.column(HtmlLinks(ColumnBridge.expression(c)))

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'

  /** Decode the pinned entity set over `b[from, to)` — the value-side
    * twin of [[HtmlText.extract]]'s text decode.
    */
  private def decode(b: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(to - from)
    var i = from
    while (i < to) {
      val c = b(i) & 0xff
      if (c == '&') {
        var hit = -1
        var k = 0
        val ents = HtmlText.Entities
        while (hit < 0 && k < ents.length) {
          if (HtmlText.startsWithIc(b, i + 1, ents(k)._1)) hit = k
          k += 1
        }
        if (hit >= 0) { out.write(HtmlText.Entities(hit)._2); i += 1 + HtmlText.Entities(hit)._1.length }
        else { out.write('&'); i += 1 }
      } else { out.write(c); i += 1 }
    }
    out.toByteArray
  }

  /** First `href` value in the attribute region `b[from, gt)`, decoded;
    * null when absent/empty. `href` must be preceded by whitespace (so
    * `data-href` never matches).
    */
  private def hrefIn(b: Array[Byte], from: Int, gt: Int): Array[Byte] = {
    var j = from
    while (j + 4 <= gt) {
      if (isWs(b(j - 1) & 0xff) && HtmlText.startsWithIc(b, j, "href")) {
        var k = j + 4
        while (k < gt && isWs(b(k) & 0xff)) k += 1
        if (k < gt && b(k) == '=') {
          k += 1
          while (k < gt && isWs(b(k) & 0xff)) k += 1
          if (k < gt && (b(k) == '"' || b(k) == '\'')) {
            val q = b(k)
            var e = k + 1
            while (e < gt && b(e) != q) e += 1
            return decode(b, k + 1, e)
          } else {
            var e = k
            while (e < gt && !isWs(b(e) & 0xff)) e += 1
            return decode(b, k, e)
          }
        }
      }
      j += 1
    }
    null
  }

  /** The full link pass — total on arbitrary bytes; returns the decoded
    * href values of opening `a` tags outside comment/script/style
    * regions, in document order.
    */
  def links(b: Array[Byte]): ArrayData = {
    val n = b.length
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      if (c == '<') {
        if (HtmlText.startsWithIc(b, i, "<!--")) {
          val e = HtmlText.indexOfIc(b, i + 4, "-->")
          i = if (e < 0) n else e + 3
        } else if (HtmlText.startsWithIc(b, i, "<script") &&
            (i + 7 >= n || !HtmlText.isLetter(b(i + 7) & 0xff))) {
          val e = HtmlText.indexOfIc(b, i + 7, "</script")
          i = if (e < 0) n else HtmlText.pastGt(b, e)
        } else if (HtmlText.startsWithIc(b, i, "<style") &&
            (i + 6 >= n || !HtmlText.isLetter(b(i + 6) & 0xff))) {
          val e = HtmlText.indexOfIc(b, i + 6, "</style")
          i = if (e < 0) n else HtmlText.pastGt(b, e)
        } else {
          var p = i + 1
          val closing = p < n && b(p) == '/'
          if (closing) p += 1
          val next = if (p < n) b(p) & 0xff else -1
          if (HtmlText.isLetter(next)) {
            val sb = new java.lang.StringBuilder(8)
            var q = p
            while (q < n && sb.length < 12 && {
              val ch = b(q) & 0xff
              HtmlText.isLetter(ch) || (ch >= '0' && ch <= '9')
            }) { sb.append(HtmlText.lower(b(q) & 0xff).toChar); q += 1 }
            val past = HtmlText.pastGt(b, q)
            if (!closing && sb.toString == "a") {
              // pastGt lands just after '>' — or at n for an unterminated
              // tag, where the whole tail is the attribute region
              val gt = if (past > 0 && b(past - 1) == '>') past - 1 else past
              val v = hrefIn(b, q, math.max(q, gt))
              if (v != null && v.length > 0) out.add(UTF8String.fromBytes(v))
            }
            i = past
          } else if (next == '!' || next == '?') {
            i = HtmlText.pastGt(b, p)
          } else {
            i += 1 // literal '<'
          }
        }
      } else i += 1
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())).asInstanceOf[Array[Any]])
  }
}
