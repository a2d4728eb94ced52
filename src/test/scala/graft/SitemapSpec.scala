package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CharsetSniff => _, _}

/** d137: the sitemaps.org walk — two-level parse, every protocol rule,
  * and the three damage classes. */
class SitemapSpec extends AnyFunSuite {

  test("clean docs discover the full closed-form grid") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val (idx, children) = SitemapSim.payloadFor(docId)
      val entries = SitemapCodec.parseIndex(idx)
      assert(entries.size == SitemapSim.nChildren(docId))
      val own = SitemapCodec.hostOf(entries.head._1)
      children.zipWithIndex.foreach { case (gz, m) =>
        val ms = GzipCodec.decode(gz).get
        val xml = new String(ms.head, "UTF-8")
        val urls = SitemapCodec.parseUrlset(xml, own)
        assert(urls.size == SitemapSim.nUrls(docId))
        urls.zipWithIndex.foreach { case (u, j) =>
          assert(u.loc == SitemapSim.locFor(docId, m, j))
          assert(u.priority == ((docId + j) % 11) / 10.0)
          assert(u.changefreq == SitemapSim.FREQS(((docId + j) % 7).toInt))
        }
      }
    }
  }

  test("damage classes: gzip truncation, the cross-host loc, the out-of-range priority") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L)) {
      assertThrows[Throwable] {
        val (idx, children) = SitemapSim.payloadFor(docId)
        val own = SitemapCodec.hostOf(SitemapCodec.parseIndex(idx).head._1)
        children.foreach { gz =>
          val ms = GzipCodec.decode(gz).getOrElse(sys.error("gzip"))
          SitemapCodec.parseUrlset(new String(ms.head, "UTF-8"), own)
        }
      }
    }
  }

  test("protocol rules reject at parse: bad enum, bad date, missing loc, trailing garbage") {
    def urlset(body: String): String =
      s"""<?xml version="1.0"?><urlset>$body</urlset>"""
    def url(loc: String = "https://h.com/p", lastmod: String = "2026-01-02",
        freq: String = "daily", prio: String = "0.5"): String =
      s"<url><loc>$loc</loc><lastmod>$lastmod</lastmod>" +
        s"<changefreq>$freq</changefreq><priority>$prio</priority></url>"
    assert(SitemapCodec.parseUrlset(urlset(url()), "com,h").size == 1)
    assertThrows[Throwable](
      SitemapCodec.parseUrlset(urlset(url(freq = "sometimes")), "com,h"))
    assertThrows[Throwable](
      SitemapCodec.parseUrlset(urlset(url(lastmod = "Jan 2")), "com,h"))
    assertThrows[Throwable](
      SitemapCodec.parseUrlset(urlset(url(prio = "2.0")), "com,h"))
    assertThrows[Throwable](
      SitemapCodec.parseUrlset(urlset(url(prio = "x")), "com,h"))
    assertThrows[Throwable](SitemapCodec.parseUrlset(
      urlset("<url><lastmod>2026-01-02</lastmod><changefreq>daily" +
        "</changefreq><priority>0.5</priority></url>"), "com,h"))
    assertThrows[Throwable](
      SitemapCodec.parseUrlset(urlset(url()) + "junk", "com,h"))
    assertThrows[Throwable](
      SitemapCodec.parseUrlset(urlset(url(loc = "https://other.com/p")), "com,h"))
  }
}
