package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Byte-level and end-to-end coverage for the [[HtmlText]] main-content
  * extraction: pinned unit semantics (tag strip, block newlines,
  * script/style/comment drops, entity decode, literal-`<` rule,
  * unterminated structures), no-throw fuzz (random bytes + exhaustive
  * point mutations of a valid page), and the registered q_html_extract
  * walk cross-checked against the doc_id arithmetic it must recover.
  */
class HtmlTextSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def x(s: String): String =
    new String(HtmlText.extract(s.getBytes(UTF_8)), UTF_8)

  test("tags strip; block tags break lines; inline tags do not") {
    assert(x("<p>a</p><p>b</p>") === "a\nb")
    assert(x("one <b>two</b> <em>three</em>") === "one two three")
    assert(x("<h2>T</h2><div>x<br>y</div>") === "T\nx\ny")
    assert(x("<ul><li>a</li><li>b</li></ul>") === "a\nb")
  }

  test("script, style and comments drop whole — including < and & inside") {
    assert(x("a<script>if (x < 2 && y > 1) { f('<p>'); }</script>b") === "ab")
    assert(x("a<style>p { color: #fff; } /* <div> */</style>b") === "ab")
    assert(x("a<!-- <p>no</p> &amp; -->b") === "ab")
    assert(x("a<SCRIPT foo=1>x</ScRiPt >b") === "ab")
    // a longer tag starting with 'script' is NOT the script element
    assert(x("a<scripts>b</scripts>c") === "abc")
  }

  test("unterminated structures swallow to end of input, never throw") {
    assert(x("a<script>forever") === "a")
    assert(x("a<style>forever") === "a")
    assert(x("a<!-- forever") === "a")
    assert(x("a<p unclosed") === "a")
    assert(x("a<") === "a<")
  }

  test("pinned entities decode; unknown entities pass through literally") {
    assert(x("A&lt;B &amp; C&gt;D &quot;q&quot; &apos;s&apos;") ===
      "A<B & C>D \"q\" 's'")
    assert(x("a&nbsp;b") === "a b")
    assert(x("a&mdash;b &unknown; &amp c") === "a&mdash;b &unknown; &amp c")
    assert(x("&AMP;x") === "&x") // entity match is case-insensitive
  }

  test("literal < stays when not a tag start; declarations drop silently") {
    assert(x("1 < 2 and 2 > 1") === "1 < 2 and 2 > 1")
    assert(x("<!DOCTYPE html><?xml version=\"1.0\"?>hi") === "hi")
  }

  test("lines trim space/tab/CR, empties drop, join is a single newline") {
    assert(x("<p>  a \t</p>\r\n<p> </p><p>b</p>") === "a\nb")
    assert(x("   ") === "")
    assert(x("") === "")
  }

  test("fuzz: random bytes and exhaustive point mutations never throw") {
    val page = ("<!DOCTYPE html><html><head><title>Doc 7</title><style>b{}</style>" +
      "<script>var x = 1 && 2;</script></head><body><!-- c --><nav>N &gt; 1</nav>" +
      "<p>hello &amp; bye</p><footer>f</footer></body></html>").getBytes(UTF_8)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val len = rnd.nextInt(200)
      val junk = Array.fill(len)(rnd.nextInt(256).toByte)
      HtmlText.extract(junk) // must not throw
    }
    for (pos <- page.indices; delta <- Seq(1, 77, 128, 255)) {
      val m = page.clone()
      m(pos) = ((m(pos) + delta) & 0xff).toByte
      HtmlText.extract(m) // must not throw
    }
    for (cut <- page.indices by 7) {
      HtmlText.extract(page.take(cut)) // truncations must not throw
    }
  }

  test("registered query recovers the doc_id arithmetic end-to-end") {
    val rows = graft.ops.HtmlExtract.qHtmlExtract(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val lines = r.getString(1).split("\n")
      assert(lines(0) === s"Doc $id")
      assert(lines(1) === s"Home > Section ${id % 7}")
      assert(lines(2) === s"Title $id")
      assert(lines(lines.length - 2) ===
        "Tokens & entities: A<B \"q" + (id % 5) + "\"  end")
      assert(lines.last === "(c) Example Corp & Co &mdash; All rights reserved")
      assert(r.getLong(2) === lines.length.toLong)
      assert(r.getLong(3) === r.getString(1).length.toLong)
    }
  }

  test("SQL surface: html_text registered for SQL text") {
    graft.GraftSession.registerFunctions(spark)
    val out = spark.sql(
      "SELECT html_text('<p>a&amp;b</p><p>c</p>') AS t").collect()(0).getString(0)
    assert(out === "a&b\nc")
  }

  test("boilerplate report flags the shared lines with exact shares") {
    val rows = graft.ops.HtmlExtract.qHtmlBoilerplate(spark, sf).collect()
    val byLine = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    val footer = "(c) Example Corp & Co &mdash; All rights reserved"
    assert(byLine(footer)._1 === n)
    assert(byLine(footer)._2 === 10000L)
    // every reported line clears the 5% bar; nav variants are present
    rows.foreach(r => assert(r.getLong(1) * 10000 >= n * 500))
    assert(byLine.keys.count(_.startsWith("Home > Section ")) === 7)
  }
}
