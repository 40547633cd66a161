package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkFunSuite

/** Byte-level and end-to-end coverage for the [[HtmlLinks]] link
  * extraction (round 16): pinned unit semantics (first-href rule, quote
  * forms, entity decode, dead-region skips, closing/non-`a` tags,
  * unterminated structures), no-throw fuzz in the [[HtmlTextSpec]]
  * discipline, and the registered queries cross-checked against the
  * doc_id arithmetic that synthesized the pages.
  */
class HtmlLinksSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def ls(s: String): Seq[String] = {
    val a = HtmlLinks.links(s.getBytes(UTF_8))
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  test("href forms: double/single quotes, bare, spaces around =") {
    assert(ls("""<a href="https://x/1">t</a>""") === Seq("https://x/1"))
    assert(ls("<a href='https://x/2'>t</a>") === Seq("https://x/2"))
    assert(ls("<a href=https://x/3>t</a>") === Seq("https://x/3"))
    assert(ls("""<a href = "https://x/4">t</a>""") === Seq("https://x/4"))
    assert(ls("""<A HREF="https://x/5"></A>""") === Seq("https://x/5"))
  }

  test("only opening a-tags with a real href count; data-href never matches") {
    assert(ls("""<a class="x">no href</a>""") === Seq.empty)
    assert(ls("""<a data-href="https://no/">t</a>""") === Seq.empty)
    assert(ls("""<area href="https://no/">""") === Seq.empty)
    assert(ls("""<a href="">empty</a>""") === Seq.empty)
    assert(ls("""</a href="https://no/">""") === Seq.empty)
    assert(ls("""<a rel="x" href="https://x/a" href="https://no/b"></a>""") ===
      Seq("https://x/a"))
  }

  test("pinned entities decode in the value; unknown pass through") {
    assert(ls("""<a href="https://x/q?a=1&amp;b=2"></a>""") ===
      Seq("https://x/q?a=1&b=2"))
    assert(ls("""<a href="https://x/&mdash;"></a>""") === Seq("https://x/&mdash;"))
  }

  test("dead regions never contribute links") {
    assert(ls("""<script>var u='<a href="https://no/s"></a>';</script>""") === Seq.empty)
    assert(ls("""<!-- <a href="https://no/c"></a> -->""") === Seq.empty)
    assert(ls("""<style>/* <a href="https://no/y"></a> */</style>""") === Seq.empty)
    assert(ls("""<script>x</script><a href="https://yes/1"></a>""") === Seq("https://yes/1"))
  }

  test("document order; unterminated structures never throw") {
    assert(ls("""<a href="/1"></a><p><a href="/2"></a></p><a href="/3">""") ===
      Seq("/1", "/2", "/3"))
    assert(ls("""<a href="/unterminated-quote""") === Seq("/unterminated-quote"))
    assert(ls("""<a href=/bare-eof""") === Seq("/bare-eof"))
    assert(ls("<a href=") === Seq.empty)
    assert(ls("") === Seq.empty)
  }

  test("fuzz: random bytes and exhaustive point mutations never throw") {
    val page = ("""<!DOCTYPE html><html><body><a href="https://s/1?a=1&amp;b=2">x""" +
      """</a><script>var u='<a href="https://no">';</script><a href='/r'></a>""" +
      "</body></html>").getBytes(UTF_8)
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 300) {
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      HtmlLinks.links(junk) // must not throw
    }
    for (pos <- page.indices; delta <- Seq(1, 77, 128, 255)) {
      val m = page.clone()
      m(pos) = ((m(pos) + delta) & 0xff).toByte
      HtmlLinks.links(m)
    }
    for (cut <- page.indices by 7) HtmlLinks.links(page.take(cut))
  }

  test("registered query recovers the doc_id link arithmetic end-to-end") {
    val rows = graft.ops.HtmlExtract.qHtmlLinks(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, rs) =>
      val urls = rs.sortBy(_.getLong(1)).map(_.getString(2)).toSeq
      assert(urls === Seq(
        s"https://site${id % 20}.example.com/page/${id % 100}",
        s"https://hub.example.com/item?id=${id % 50}&ref=nav",
        "/about"), s"doc $id")
    }
  }

  test("domain mix: hub is hottest and throttled; relative bucket present") {
    val rows = graft.ops.HtmlExtract.qDomainMix(spark, sf).collect()
    val byDom = rows.map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byDom.contains("(relative)") && byDom("(relative)")._1 === 1L)
    assert(byDom("hub.example.com")._1 === 50L)
    // the uniform-mixing budget throttles the hot hub below full admission
    assert(byDom("hub.example.com")._4 < 10000L)
    // 20 site domains, each fully admitted (inside the per-domain budget)
    val sites = byDom.keys.filter(_.startsWith("site")).toSeq
    assert(sites.size === 20)
    sites.foreach(d => assert(byDom(d)._4 === 10000L, d))
  }

  test("SQL surface: html_links registered for SQL text") {
    graft.GraftSession.registerFunctions(spark)
    val out = spark.sql(
      """SELECT html_links('<a href="https://x/1?a=1&amp;b=2"></a><a href=/r></a>') AS l""")
      .collect()(0).getSeq[String](0)
    assert(out === Seq("https://x/1?a=1&b=2", "/r"))
  }
}
