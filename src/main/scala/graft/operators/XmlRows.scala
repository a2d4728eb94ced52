package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MediaWiki/XML dump row source for the d129 gate — the shape the
  * classic public corpus actually ships in (`enwiki-…-pages-articles
  * .xml.bz2`): a `<mediawiki>` document of `<page>` elements, each
  * with `<title>`, `<ns>`, `<id>` and a `<revision>` carrying the
  * escaped wikitext in `<text>`. The shard rides the d125 bzip2
  * container (our own BWT/Huffman codec — the pairing the r12 verdict
  * planned), and the parser is a STRICT streaming subset:
  *
  *  - exact element nesting for the subset we extract (page → title/
  *    ns/id/revision → id/timestamp/text); UNKNOWN child elements
  *    (sha1, contributor, format, …) are skipped with balanced-depth
  *    scanning — a real dump carries many, and the sim plants some so
  *    the skip path runs corpus-wide;
  *  - XML entity decode in ONE pass (`&amp;lt;` → literal `&lt;`,
  *    never `<` — the d81 double-escape discipline), named + numeric;
  *    unknown entities QUARANTINE;
  *  - tag-nesting violations (truncation inside a page, mismatched
  *    close order, text after the root close), a missing mandatory
  *    child, and non-numeric ids all QUARANTINE the shard.
  *
  * The namespace filter happens IN THE PLAN (`.filter(ns === 0)`) —
  * the parser emits every page and Catalyst prunes, the Spark-first
  * split between byte-format decoding and relational work.
  */
object XmlRowsCodec {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private[graft] final case class WikiPage(
      title: String, ns: Long, pageId: Long, revId: Long,
      timestamp: String, text: String)

  // ------------------------------------------------------------ escaping

  private[graft] def xmlEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Single-pass entity decode: `&amp;lt;` stays `&lt;` (each '&'
    * consumed once). Unknown entities and bare '&' quarantine. */
  private[graft] def xmlUnescape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 12) throw Malformed
        val ent = s.substring(i + 1, semi)
        ent match {
          case "amp" => sb.append('&')
          case "lt" => sb.append('<')
          case "gt" => sb.append('>')
          case "quot" => sb.append('"')
          case "apos" => sb.append('\'')
          case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
            sb.appendCodePoint(Integer.parseInt(ent.substring(2), 16))
          case _ if ent.startsWith("#") =>
            sb.appendCodePoint(Integer.parseInt(ent.substring(1), 10))
          case _ => throw Malformed
        }
        i = semi + 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // -------------------------------------------------------------- parser

  private final class P(s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(lit: String): Unit = {
      if (!s.startsWith(lit, i)) throw Malformed
      i += lit.length
    }
    def tryConsume(lit: String): Boolean = {
      skipWs()
      if (s.startsWith(lit, i)) { i += lit.length; true } else false
    }
    /** At '<': the element name that starts here (open tags only). */
    def peekOpenName(): Option[String] = {
      skipWs()
      if (i >= s.length || s(i) != '<' || i + 1 >= s.length ||
          s(i + 1) == '/') None
      else {
        var j = i + 1
        while (j < s.length && (s(j).isLetterOrDigit || s(j) == ':')) j += 1
        if (j == i + 1) throw Malformed
        Some(s.substring(i + 1, j))
      }
    }
    /** Consume `<name …>` (attributes skipped; self-closing returns
      * false = no content). */
    def openTag(name: String): Boolean = {
      skipWs()
      expect("<" + name)
      if (i < s.length && !(s(i) == '>' || s(i) == ' ' || s(i) == '/'))
        throw Malformed // name is a strict prefix of the real tag
      val close = s.indexOf('>', i)
      if (close < 0) throw Malformed
      val selfClosing = s(close - 1) == '/'
      i = close + 1
      !selfClosing
    }
    def closeTag(name: String): Unit = { skipWs(); expect(s"</$name>") }
    /** Raw character content up to the next '<'. */
    def textUntilTag(): String = {
      val lt = s.indexOf('<', i)
      if (lt < 0) throw Malformed
      val t = s.substring(i, lt)
      i = lt
      t
    }
    /** Skip one whole element (any name) with balanced depth — the
      * unknown-child path. */
    def skipElement(): Unit = {
      val name = peekOpenName().getOrElse(throw Malformed)
      if (!openTag(name)) return
      var depth = 1
      while (depth > 0) {
        val lt = s.indexOf('<', i)
        if (lt < 0) throw Malformed
        i = lt
        if (s.startsWith(s"</$name>", i)) { depth -= 1; i += name.length + 3 }
        else if (s.startsWith("<" + name, i) &&
            i + 1 + name.length < s.length &&
            !s(i + 1 + name.length).isLetterOrDigit) {
          val close = s.indexOf('>', i)
          if (close < 0) throw Malformed
          if (s(close - 1) != '/') depth += 1
          i = close + 1
        } else i += 1
      }
    }
  }

  private def parseLong(s: String): Long = {
    val t = s.trim
    if (t.isEmpty || !t.forall(c => c >= '0' && c <= '9')) throw Malformed
    t.toLong
  }

  /** Parse a full dump document → pages, strictly. */
  private[graft] def parsePages(xml: String): Option[Seq[WikiPage]] =
    try {
      val p = new P(xml)
      if (p.tryConsume("<?xml")) { // prolog
        val close = xml.indexOf("?>", p.i)
        if (close < 0) throw Malformed
        p.i = close + 2
      }
      if (!p.openTag("mediawiki")) throw Malformed
      val pages = Seq.newBuilder[WikiPage]
      var open = true
      while (open) {
        p.peekOpenName() match {
          case Some("page") =>
            p.openTag("page")
            var title: String = null
            var ns = -1L
            var pageId = -1L
            var revId = -1L
            var ts: String = null
            var text: String = null
            var inPage = true
            while (inPage) {
              p.peekOpenName() match {
                case Some("title") =>
                  p.openTag("title")
                  title = xmlUnescape(p.textUntilTag())
                  p.closeTag("title")
                case Some("ns") =>
                  p.openTag("ns")
                  ns = parseLong(p.textUntilTag())
                  p.closeTag("ns")
                case Some("id") =>
                  p.openTag("id")
                  val v = parseLong(p.textUntilTag())
                  p.closeTag("id")
                  if (pageId < 0) pageId = v else throw Malformed
                case Some("revision") =>
                  p.openTag("revision")
                  var inRev = true
                  while (inRev) {
                    p.peekOpenName() match {
                      case Some("id") =>
                        p.openTag("id")
                        val v = parseLong(p.textUntilTag())
                        p.closeTag("id")
                        if (revId < 0) revId = v else throw Malformed
                      case Some("timestamp") =>
                        p.openTag("timestamp")
                        ts = p.textUntilTag().trim
                        p.closeTag("timestamp")
                      case Some("text") =>
                        if (p.openTag("text")) {
                          text = xmlUnescape(p.textUntilTag())
                          p.closeTag("text")
                        } else text = "" // self-closing <text/>: empty revision
                      case Some(_) => p.skipElement()
                      case None => inRev = false
                    }
                  }
                  p.closeTag("revision")
                case Some(_) => p.skipElement()
                case None => inPage = false
              }
            }
            p.closeTag("page")
            if (title == null || ns < 0 || pageId < 0 || revId < 0 ||
                ts == null || text == null) throw Malformed
            pages += WikiPage(title, ns, pageId, revId, ts, text)
          case Some(_) => p.skipElement() // siteinfo etc.
          case None => open = false
        }
      }
      p.closeTag("mediawiki")
      p.skipWs()
      if (!p.eof) throw Malformed // text after the root close
      Some(pages.result())
    } catch {
      case Malformed => None
      case _: NumberFormatException => None
      case _: StringIndexOutOfBoundsException => None
    }

  // ------------------------------------------------------------- encoder

  /** Render a dump document (prolog, siteinfo, pages with the
    * unknown-element decoys a real dump carries). */
  private[graft] def render(pages: Seq[WikiPage]): String = {
    val sb = new java.lang.StringBuilder(1024)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<mediawiki version=\"0.10\" xml:lang=\"en\">\n")
    sb.append("  <siteinfo>\n    <sitename>graftwiki</sitename>\n")
    sb.append("    <dbname>graftwiki</dbname>\n  </siteinfo>\n")
    pages.foreach { pg =>
      sb.append("  <page>\n")
      sb.append(s"    <title>${xmlEscape(pg.title)}</title>\n")
      sb.append(s"    <ns>${pg.ns}</ns>\n")
      sb.append(s"    <id>${pg.pageId}</id>\n")
      sb.append("    <revision>\n")
      sb.append(s"      <id>${pg.revId}</id>\n")
      sb.append(s"      <timestamp>${pg.timestamp}</timestamp>\n")
      sb.append("      <contributor><username>graft</username></contributor>\n")
      sb.append("      <model>wikitext</model>\n")
      sb.append("      <format>text/x-wiki</format>\n")
      sb.append(s"      <text bytes=\"${pg.text.length}\" xml:space=\"preserve\">")
      sb.append(xmlEscape(pg.text))
      sb.append("</text>\n")
      sb.append("      <sha1>deadbeef</sha1>\n")
      sb.append("    </revision>\n")
      sb.append("  </page>\n")
    }
    sb.append("</mediawiki>\n")
    sb.toString
  }
}

/** In-plan synthesizer + gate for d129 — the dump as a ROW SOURCE
  * (the d111 discipline): each doc becomes a K-page `.xml.bz2` shard
  * (pages = the d111 codepoint slices, each text prefixed with
  * `<&> ` so every page exercises the XML escaping), compressed
  * through OUR d125 bzip2 codec, decoded by the strict chain
  * (bzip2 → UTF-8 → XML subset parse), and emitted one row per page.
  * The namespace filter runs IN THE PLAN. Damaged docs contribute
  * nothing (the d105/d111 row-source rule).
  *
  * Damage slice on doc_id%7: 0 → bzip2 stream truncated (the
  * container layer catches it); 3 → TAG-NESTING TRUNCATION: the XML
  * cut mid-`</revision>` BEFORE compression — the container is
  * pristine, only the XML grammar catches it; 5 → mismatched close
  * ORDER (`</page>` before `</revision>`) — every byte well-formed
  * locally, only the nesting stack catches it. */
object XmlRowsSim {

  private[graft] def blockCut(docId: Long): Int = (600 + docId % 300).toInt

  private[graft] def dumpXml(docId: Long, text: String): String = {
    val slices = WarcSim.pageTexts(docId, text)
    XmlRowsCodec.render(slices.zipWithIndex.map { case (sl, i) =>
      XmlRowsCodec.WikiPage(
        title = s"Doc $docId Page $i",
        ns = (docId + i) % 3,
        pageId = docId * 8 + i,
        revId = (docId * 8 + i) * 10 + 1,
        timestamp = "2026-01-01T00:00:00Z",
        text = "<&> " + sl)
    })
  }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val xml = dumpXml(docId, text)
    (docId % 7) match {
      case 0 =>
        val clean = Bzip2Codec.encode(xml.getBytes("UTF-8"), blockCut(docId))
        java.util.Arrays.copyOf(clean, clean.length - 5)
      case 3 =>
        Bzip2Codec.encode(
          xml.substring(0, xml.length - 30).getBytes("UTF-8"),
          blockCut(docId))
      case 5 =>
        val broken = xml.replace(
          "    </revision>\n  </page>\n</mediawiki>",
          "  </page>\n    </revision>\n</mediawiki>")
        Bzip2Codec.encode(broken.getBytes("UTF-8"), blockCut(docId))
      case _ =>
        Bzip2Codec.encode(xml.getBytes("UTF-8"), blockCut(docId))
    }
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("page", IntegerType),
    StructField("ns", LongType),
    StructField("page_id", LongType),
    StructField("title", StringType),
    StructField("rev_id", LongType),
    StructField("text_out", StringType)))

  /** The shard as a row source: strict bzip2 + XML decode, one row
    * per page, damaged shards contribute nothing. Namespace filtering
    * is left to the PLAN. */
  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            val pages = Bzip2Codec.decode(payloadFor(id, text)).flatMap {
              case (bytes, _) =>
                try XmlRowsCodec.parsePages(
                  CharsetSniff.decodeUtf8(bytes, 0, bytes.length))
                catch { case _: Throwable => None }
            }
            pages.toSeq.flatten.zipWithIndex.map { case (pg, i) =>
              Row(id, i, pg.ns, pg.pageId, pg.title, pg.revId, pg.text)
            }
          }
        }
      }(enc)
  }
}
