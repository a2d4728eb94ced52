package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Web

/** URL curation: canonicalization must be idempotent and collapse the
  * crawl-noise variants of one logical page to one string; the
  * registered-domain rule must honor multi-part public suffixes; the
  * blocklist paths (literal and broadcast-table) must agree. */
class WebSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def canon(urls: String*): Seq[String] = {
    val df = urls.toDF("url").select(Web.canonicalUrl(col("url")).as("c"))
    df.as[String].collect().toSeq
  }

  test("canonicalization collapses tracking/case/port/fragment variants") {
    val variants = Seq(
      "https://Example.COM/news/today?utm_source=x&utm_campaign=y",
      "HTTPS://example.com:443/news/today/",
      "https://example.com/news/today#comments",
      "https://example.com/news/today?fbclid=abc123")
    val c = canon(variants: _*)
    assert(c.distinct == Seq("https://example.com/news/today"))
  }

  test("canonicalization keeps real query params in order, drops only tracking") {
    val Seq(c) = canon("https://a.com/s?utm_source=f&q=spark&gclid=1&page=2")
    assert(c == "https://a.com/s?q=spark&page=2")
  }

  test("non-default ports survive; default ports are scheme-aware") {
    assert(canon("https://a.com:8443/x") == Seq("https://a.com:8443/x"))
    assert(canon("http://a.com:80/x") == Seq("http://a.com/x"))
    // 443 is only default for https — on http it is load-bearing
    assert(canon("http://a.com:443/x") == Seq("http://a.com:443/x"))
  }

  test("empty path normalizes to /; root slash is not trimmed") {
    assert(canon("https://a.com", "https://a.com/") ==
      Seq("https://a.com/", "https://a.com/"))
  }

  test("canonicalization is idempotent") {
    val raw = Seq("HTTP://WWW.Example.CO.UK:80/A/b/?utm_medium=m&x=1#f",
      "https://sub.site.org:9090/p?gclid=g")
    val once = canon(raw: _*)
    assert(canon(once: _*) == once)
  }

  test("registered domain: 2-label default, 3-label for multi-part suffixes") {
    val got = Seq(
      "https://a.b.example.com/x",
      "https://WWW.Example.CO.UK/x",
      "https://news.site.gov.au/x",
      "https://example.com/x",
      "https://localhost/x")
      .toDF("url").select(Web.registeredDomain(col("url")).as("d"))
      .as[String].collect().toSeq
    assert(got == Seq("example.com", "example.co.uk", "site.gov.au",
      "example.com", "localhost"))
  }

  test("htmlText: script/style/comment content dropped, tags stripped, entities decoded") {
    val got = Seq(
      // script body with a naked `<` — tag-strip before script removal
      // would eat from `< 2` to the next `>` and corrupt the text
      "<p>a</p><script>if (1 < 2) { x(\"b\"); }</script><p>c</p>",
      "<style>p { color: red; }</style><DIV>shout</DIV>",
      "<!-- hidden -->visible",
      "x &lt;tag&gt; &amp;&nbsp;y &#39;q&#39; &quot;r&quot;",
      // double-escaped: decodes ONCE to the literal entity
      "&amp;lt;")
      .toDF("h").select(Web.htmlText(col("h")).as("t"))
      .as[String].collect().toSeq
    assert(got == Seq("a c", "shout", "visible",
      "x <tag> & y 'q' \"r\"", "&lt;"))
  }

  test("extractHtml: anchors counted (never <article>), link-density verdict") {
    val docs = Seq(
      (1L, "<body><a href=\"/x\">nav nav nav</a><p>hi</p></body>"),
      (2L, "<article>long body prose here</article><a>ok</a>"),
      (3L, "<p>no links at all</p>")).toDF("doc_id", "h")
    val r = Web.extractHtml(docs, col("h"), col("doc_id"), maxLinkPct = 50)
      .orderBy("doc_id").collect()
    // doc 1: link text 11 of 14 chars -> dropped at 50%
    assert(r(0).getLong(3) == 1L && !r(0).getBoolean(6))
    // doc 2: <article> is NOT an anchor; only <a>ok</a> counts
    assert(r(1).getLong(3) == 1L && r(1).getLong(4) == 2L && r(1).getBoolean(6))
    // doc 3: zero links, kept
    assert(r(2).getLong(3) == 0L && r(2).getLong(4) == 0L && r(2).getBoolean(6))
  }

  test("literal blocklist and broadcast-table blocklist keep the same docs") {
    val docs = (0L until 40L).map(i =>
      (i, s"https://host$i.${if (i % 3 == 0) "blocked.net" else "ok.org"}/p"))
      .toDF("doc_id", "url")
    val lit = Web.curateUrls(docs, col("url"), col("doc_id"), Seq("blocked.net"))
      .filter(col("kept")).select("doc_id")
    val tbl = Web.filterBlockedTable(docs, col("url"),
      Seq("blocked.net").toDF("domain")).select("doc_id")
    assert(lit.collect().map(_.getLong(0)).sorted.toSeq ==
      tbl.collect().map(_.getLong(0)).sorted.toSeq)
    assert(lit.count() == (0L until 40L).count(_ % 3 != 0))
  }
}
