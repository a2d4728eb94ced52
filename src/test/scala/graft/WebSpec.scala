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
