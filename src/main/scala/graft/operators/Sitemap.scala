package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** sitemap.xml (the sitemaps.org protocol, the crawl-DISCOVERY stage
  * pairing d131's robots politeness): a two-level walk — the sitemap
  * INDEX (`<sitemapindex>` of `<sitemap><loc/><lastmod/>`) pointing at
  * child sitemaps (`<urlset>` of `<url>` with loc / lastmod /
  * changefreq / priority), children shipped `.xml.gz` through OUR
  * d106 gzip codec — with the protocol's rules enforced:
  *
  *  - `<loc>` is mandatory and must be an absolute http(s) URL
  *    (validated through d136's SURT canonicalizer — a loc that can't
  *    canonicalize can't be crawled);
  *  - the SAME-HOST rule (sitemaps.org: a sitemap at host H may only
  *    list URLs on H — the protocol's anti-hijack provision; a
  *    cross-host loc QUARANTINES);
  *  - `priority` ∈ [0.0, 1.0]; `changefreq` one of the seven enum
  *    values; `lastmod` a W3C date (YYYY-MM-DD in scope);
  *  - ≤ 50,000 URLs per sitemap (the protocol limit);
  *  - strict XML subset: exact nesting, one-pass entity decode (via
  *    d129's table), unknown elements skipped with balanced depth,
  *    text after the root close quarantines.
  */
object SitemapCodec {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  final case class UrlEntry(loc: String, lastmod: String,
      changefreq: String, priority: Double)

  private val CHANGEFREQS = Set("always", "hourly", "daily", "weekly",
    "monthly", "yearly", "never")

  // ------------------------------------------------------ strict walker

  private final class P(s: String) {
    var i = 0
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def eof: Boolean = { skipWs(); i >= s.length }
    def expect(lit: String): Unit = {
      skipWs()
      if (!s.startsWith(lit, i)) throw Malformed
      i += lit.length
    }
    def tryProlog(): Unit = {
      skipWs()
      if (s.startsWith("<?xml", i)) {
        val close = s.indexOf("?>", i)
        if (close < 0) throw Malformed
        i = close + 2
      }
    }
    def peekName(): Option[String] = {
      skipWs()
      if (i >= s.length || s(i) != '<' || i + 1 >= s.length || s(i + 1) == '/')
        None
      else {
        var j = i + 1
        while (j < s.length && (s(j).isLetterOrDigit || s(j) == ':')) j += 1
        if (j == i + 1) throw Malformed
        Some(s.substring(i + 1, j))
      }
    }
    def open(name: String): Unit = {
      skipWs()
      expect("<" + name)
      val close = s.indexOf('>', i)
      if (close < 0) throw Malformed
      if (s(close - 1) == '/') throw Malformed // self-closing loc etc.: empty
      i = close + 1
    }
    def close(name: String): Unit = { skipWs(); expect(s"</$name>") }
    def text(): String = {
      val lt = s.indexOf('<', i)
      if (lt < 0) throw Malformed
      val t = s.substring(i, lt)
      i = lt
      XmlRowsCodec.xmlUnescape(t).trim
    }
    def skipElement(): Unit = {
      val name = peekName().getOrElse(throw Malformed)
      open(name)
      var depth = 1
      while (depth > 0) {
        val lt = s.indexOf('<', i)
        if (lt < 0) throw Malformed
        i = lt
        if (s.startsWith(s"</$name>", i)) { depth -= 1; i += name.length + 3 }
        else if (s.startsWith("<" + name, i)) {
          val close = s.indexOf('>', i)
          if (close < 0) throw Malformed
          if (s(close - 1) != '/') depth += 1
          i = close + 1
        } else i += 1
      }
    }
  }

  private def checkDate(d: String): Unit =
    if (!d.matches("""\d{4}-\d{2}-\d{2}""")) throw Malformed

  /** Host of an absolute URL, via the same grammar SURT enforces. */
  private[graft] def hostOf(url: String): String = {
    val key = Surt.canonicalize(url) // validates scheme/host/port
    key.substring(0, key.indexOf(')'))
  }

  /** Parse a sitemap INDEX → child locs (with lastmod). */
  def parseIndex(xml: String): Seq[(String, String)] = {
    val p = new P(xml)
    p.tryProlog()
    p.open("sitemapindex")
    val out = Seq.newBuilder[(String, String)]
    var more = true
    while (more) {
      p.peekName() match {
        case Some("sitemap") =>
          p.open("sitemap")
          var loc: String = null
          var lastmod: String = null
          var in = true
          while (in) {
            p.peekName() match {
              case Some("loc") =>
                p.open("loc"); loc = p.text(); p.close("loc")
              case Some("lastmod") =>
                p.open("lastmod"); lastmod = p.text(); p.close("lastmod")
              case Some(_) => p.skipElement()
              case None => in = false
            }
          }
          p.close("sitemap")
          if (loc == null || lastmod == null) throw Malformed
          checkDate(lastmod)
          out += ((loc, lastmod))
        case Some(_) => p.skipElement()
        case None => more = false
      }
    }
    p.close("sitemapindex")
    if (!p.eof) throw Malformed
    out.result()
  }

  /** Parse a child sitemap hosted at `ownHost` → url entries, with
    * the protocol rules (same host, priority range, changefreq enum,
    * the 50k limit) enforced. */
  def parseUrlset(xml: String, ownHost: String): Seq[UrlEntry] = {
    val p = new P(xml)
    p.tryProlog()
    p.open("urlset")
    val out = Seq.newBuilder[UrlEntry]
    var count = 0
    var more = true
    while (more) {
      p.peekName() match {
        case Some("url") =>
          p.open("url")
          var loc: String = null
          var lastmod: String = null
          var freq: String = null
          var prio = Double.NaN
          var in = true
          while (in) {
            p.peekName() match {
              case Some("loc") => p.open("loc"); loc = p.text(); p.close("loc")
              case Some("lastmod") =>
                p.open("lastmod"); lastmod = p.text(); p.close("lastmod")
              case Some("changefreq") =>
                p.open("changefreq"); freq = p.text(); p.close("changefreq")
              case Some("priority") =>
                p.open("priority")
                val t = p.text()
                if (!t.matches("""[01](\.\d+)?|0?\.\d+""")) throw Malformed
                prio = t.toDouble
                p.close("priority")
              case Some(_) => p.skipElement()
              case None => in = false
            }
          }
          p.close("url")
          if (loc == null || lastmod == null || freq == null || prio.isNaN)
            throw Malformed
          checkDate(lastmod)
          if (!CHANGEFREQS(freq)) throw Malformed
          if (prio < 0.0 || prio > 1.0) throw Malformed
          if (hostOf(loc) != ownHost) throw Malformed // the same-host rule
          count += 1
          if (count > 50000) throw Malformed // the protocol limit
          out += UrlEntry(loc, lastmod, freq, prio)
        case Some(_) => p.skipElement()
        case None => more = false
      }
    }
    p.close("urlset")
    if (!p.eof) throw Malformed
    out.result()
  }
}

/** In-plan synthesizer + gate for d137 — crawl discovery: each doc is
  * a host (`example{doc_id%10}.com`) publishing a sitemap INDEX of
  * M = 1 + doc_id%2 children, each child a `.xml.gz` urlset (our d106
  * gzip) of K = 2 + doc_id%4 URLs with closed-form lastmod /
  * changefreq / priority grids. Damage %7: 0 → a child's gzip stream
  * truncated; 3 → a CROSS-HOST loc planted in the first child (every
  * byte well-formed — only the protocol's same-host rule catches the
  * hijack); 5 → a priority of 1.1 (the range rule). Damaged docs
  * contribute nothing. */
object SitemapSim {

  private[graft] def nChildren(docId: Long): Int = (1 + docId % 2).toInt
  private[graft] def nUrls(docId: Long): Int = (2 + docId % 4).toInt
  private[graft] def host(docId: Long): String = s"example${docId % 10}.com"

  private[graft] def locFor(docId: Long, m: Int, j: Int): String =
    s"https://${host(docId)}/s$m/page$j"

  private[graft] val FREQS = Seq("always", "hourly", "daily", "weekly",
    "monthly", "yearly", "never")

  private[graft] def childXml(docId: Long, m: Int, crossHost: Boolean,
      badPrio: Boolean): String = {
    val k = nUrls(docId)
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    (0 until k).foreach { j =>
      val loc =
        if (crossHost && j == 0) s"https://evil.example.net/s$m/page$j"
        else locFor(docId, m, j)
      val prio =
        if (badPrio && j == 0) "1.1"
        else (((docId + j) % 11) / 10.0).toString
      sb.append("  <url>\n")
      sb.append(s"    <loc>${XmlRowsCodec.xmlEscape(loc)}</loc>\n")
      sb.append(f"    <lastmod>2026-01-${(j % 28) + 1}%02d</lastmod>\n")
      sb.append(s"    <changefreq>${FREQS(((docId + j) % 7).toInt)}</changefreq>\n")
      sb.append(s"    <priority>$prio</priority>\n")
      // a balanced unknown-element decoy: real sitemaps carry extension
      // namespaces the walker must skip structurally
      sb.append("    <xhtml:link>alternate</xhtml:link>\n")
      sb.append("  </url>\n")
    }
    sb.append("</urlset>\n")
    sb.toString
  }

  private[graft] def indexXml(docId: Long): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    (0 until nChildren(docId)).foreach { m =>
      sb.append("  <sitemap>\n")
      sb.append(s"    <loc>https://${host(docId)}/sitemap-$m.xml.gz</loc>\n")
      sb.append("    <lastmod>2026-01-01</lastmod>\n")
      sb.append("  </sitemap>\n")
    }
    sb.append("</sitemapindex>\n")
    sb.toString
  }

  /** (index xml, children gzip payloads), damage applied. */
  private[graft] def payloadFor(docId: Long): (String, Seq[Array[Byte]]) = {
    val mode = docId % 7
    val children = (0 until nChildren(docId)).map { m =>
      val xml = childXml(docId, m,
        crossHost = mode == 3 && m == 0,
        badPrio = mode == 5 && m == 0)
      val gz = GzipCodec.gzipMember(xml.getBytes("UTF-8"))
      if (mode == 0 && m == 0) java.util.Arrays.copyOf(gz, gz.length - 4)
      else gz
    }
    (indexXml(docId), children)
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sitemap", IntegerType),
    StructField("pos", IntegerType),
    StructField("loc", StringType),
    StructField("lastmod", StringType),
    StructField("changefreq", StringType),
    StructField("priority", DoubleType)))

  /** The gate: index parse → per-child gzip decode (d106) → urlset
    * parse with the protocol rules → one row per discovered URL.
    * Damaged docs contribute nothing (the d111 rule). */
  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val parsed =
              try {
                val (idx, children) = payloadFor(id)
                val entries = SitemapCodec.parseIndex(idx)
                if (entries.size != children.size) throw SitemapCodec.Malformed
                val own = SitemapCodec.hostOf(entries.head._1)
                Some(children.zipWithIndex.flatMap { case (gz, m) =>
                  val xml = GzipCodec.decode(gz) match {
                    case Some(ms) if ms.length == 1 =>
                      CharsetSniff.decodeUtf8(ms.head, 0, ms.head.length)
                    case _ => throw SitemapCodec.Malformed
                  }
                  SitemapCodec.parseUrlset(xml, own).zipWithIndex.map {
                    case (u, j) => (m, j, u)
                  }
                })
              } catch { case _: Throwable => None }
            parsed.toSeq.flatten.map { case (m, j, u) =>
              Row(id, m, j, u.loc, u.lastmod, u.changefreq, u.priority)
            }
          }
        }
      }(enc)
  }
}
