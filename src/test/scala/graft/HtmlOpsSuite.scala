package graft

import org.apache.spark.sql.functions._
import graft.operators.HtmlOps
import graft.queries.Registry

/** q340 HTML → text: the parser-only capabilities the regex oracle can't
  * express are pinned here (the q325 discipline) — quote-aware tag
  * scanning, rawtext fake-markup immunity, malformation tolerance — plus
  * a full first-principles visible-text replay of the registered query
  * and the lane accounting.
  */
class HtmlOpsSuite extends SparkTestBase {

  test("q340 parser: the regex-inexpressible cases — '>' in a quoted " +
    "attribute, fake markup in rawtext, unterminated input") {
    // '>' inside a quoted attribute value must NOT end the tag; a regex
    // stripper ('<[^>]*>') would cut at the '>' and leak '1">' as text
    val (l1, _, _, u1, t1, _) = HtmlOps.parseHtml("<p data-x=\"v>1\">ok</p>")
    assert(t1 == HtmlOps.fold("ok"), "quoted '>' must stay inside the tag")
    assert(u1 == 0L && l1 == 0L)
    // fake close tags inside script rawtext are NOT markup; content ends
    // at the literal close tag exactly as HTML5's rawtext rule says
    val (_, b2, _, u2, t2, _) = HtmlOps.parseHtml(
      "<script>var s = '<div>fake</div>';</script>real")
    assert(t2 == HtmlOps.fold("real"), "rawtext content is not markup")
    assert(b2 == 1L && u2 == 0L, "one block dropped, no tag accounting")
    // comment hiding fake markup
    val (_, b3, _, u3, t3, _) = HtmlOps.parseHtml("<!-- <b>x</b> -->y")
    assert(t3 == HtmlOps.fold("y") && b3 == 1L && u3 == 0L)
    // case-insensitive rawtext close (HTML5 script-data end-tag rule):
    // an uppercase close tag must end the block, not swallow the rest
    val (_, b2b, _, _, t2b, _) = HtmlOps.parseHtml(
      "<SCRIPT>var x = 1;</SCRIPT>after")
    assert(t2b == HtmlOps.fold("after") && b2b == 1L,
      "uppercase script close must end rawtext")
    // <scripty> is an ORDINARY tag, not a rawtext open (name delimiter)
    val (_, b2c, _, u2c, t2c, _) = HtmlOps.parseHtml("<scripty>ok</scripty>")
    assert(t2c == HtmlOps.fold("ok") && b2c == 0L && u2c == 0L,
      "<scripty> must not enter script rawtext mode")
    // malformation battery: unterminated script / comment / tag never
    // throw — extraction degrades to what was seen
    val (_, b4, _, _, t4, _) = HtmlOps.parseHtml("<p>a <script>never closed")
    assert(t4 == HtmlOps.fold("a") && b4 == 1L)
    val (_, b5, _, _, t5, _) = HtmlOps.parseHtml("<!-- no end")
    assert(t5 == HtmlOps.fold("") && b5 == 1L)
    val (_, _, _, _, t6, _) = HtmlOps.parseHtml("<p attr=\"unclosed")
    assert(t6 == HtmlOps.fold(""), "unterminated tag consumes to EOF")
    // entity decoding: the six kinds + an unknown entity left literal;
    // &nbsp; decodes to U+00A0 (codepoint 160), which survives the
    // whitespace collapse on both engine and oracle sides
    val (_, _, e7, _, t7, _) =
      HtmlOps.parseHtml("&amp;&lt;&gt;&quot;&#39;&nbsp;&bogus;")
    assert(e7 == 6L, "exactly the six known entities decoded")
    assert(t7 == HtmlOps.fold("&<>\"'\u00A0&bogus;"))
  }

  test("q340 registered query: first-principles visible-text replay and " +
    "lane accounting; single scan") {
    val out = Registry.byName("q340_html_text_extract").q(spark, sf)
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val P = 2147483647L
    // the expected EXTRACTION, written from the page spec alone (never
    // from the parser): title, h1, body text, link anchors, tail lane,
    // unclosed lane — entities decoded, whitespace collapsed
    def visOf(id: Long, text: String): String = {
      val base = s"Doc ${id % 100} & co Heading <${id % 9}> $text " +
        "more\u00A0info"
      val tail = if (id % 3 == 0) " tail \"q's\" alt" else ""
      val unclosed = if (id % 11 == 0) " unclosed" else ""
      base + tail + unclosed
    }
    def hrefsOf(id: Long): String = {
      val main = s"http://site${id % 7}.example/p/${id % 50}?x=${id % 9}"
      if (id % 3 == 0) main + s"|https://mirror${id % 5}.example/d/${id % 50}"
      else main
    }
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val r = rows(src)
      assert(r.getLong(1) == ds.length.toLong, s"$src n_docs")
      assert(r.getLong(2) ==
        ds.map(d => 1L + (if (d._2 % 3 == 0) 1L else 0L)).sum,
        s"$src n_links")
      assert(r.getLong(3) ==
        ds.map(d => 2L + (if (d._2 % 2 == 0) 1L else 0L)).sum,
        s"$src n_blocks (style + comment + conditional script)")
      assert(r.getLong(4) ==
        ds.map(d => 4L + (if (d._2 % 3 == 0) 3L else 0L)).sum,
        s"$src n_entities")
      assert(r.getLong(5) == ds.count(_._2 % 11 == 0).toLong,
        s"$src n_unbalanced — exactly the unclosed-<b> lane")
      val tdg = ds.map { d =>
        visOf(d._2, d._3).foldLeft(0L)((a, c) => (a * 131L + c) % P)
      }.sum % P
      assert(r.getLong(6) == tdg, s"$src visible-text digest replay")
      val hdg = ds.map { d =>
        hrefsOf(d._2).foldLeft(0L)((a, c) => (a * 131L + c) % P)
      }.sum % P
      assert(r.getLong(7) == hdg, s"$src href digest replay")
    }
    val plan = flattenPlan(out.queryExecution.executedPlan)
    assert(plan.count(
      _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]) == 1,
      "one scan: the parse is map-only until the source rollup")
  }
}
