package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PDF text extraction — the biggest real-corpus ingest format with a
  * text payload (papers, books, reports: arXiv mirrors, Anna's-
  * Archive-style dumps, government corpora all arrive as PDF) — from
  * the published file format (ISO 32000-1 / the classic Adobe PDF
  * Reference): the CROSS-REFERENCE TABLE + object-graph walk (never a
  * byte scan — the xref IS the random-access contract; an offset that
  * does not land on `N 0 obj` is a lie and quarantines), FlateDecode
  * content streams (zlib, RFC 1950 — decoded by the d124 walker,
  * [[DeflateCodec.zlibDecode]], adler32 verified), and the TEXT
  * OPERATOR subset BT/ET + Tf/Td + Tj/TJ with the full literal-string
  * escape grammar (\n \r \t \b \f \( \) \\ \ooo, backslash-EOL
  * continuation, balanced nested parens) plus hex strings.
  *
  * Scope rules (documented decisions, the d162 discipline):
  *  - classic xref TABLES only; xref STREAMS (PDF 1.5 compressed
  *    xref) quarantine — a production walker adds them behind the
  *    same offset-validation contract;
  *  - content operators outside {BT ET Tf Td Tj TJ} quarantine:
  *    the gate pins the text-op subset's semantics, and a strict
  *    walker surfaces out-of-scope content rather than guessing;
  *  - /Filter must be FlateDecode (uncompressed streams and filter
  *    cascades are out of scope);
  *  - generation numbers must be 0 (incremental updates out of
  *    scope); exactly one trailer; whitespace only after %%EOF.
  *
  * Strictness inventory (each caught by the spec's grids):
  *  - header must open `%PDF-1.`;
  *  - `startxref` offset must land on `xref`; subsection must start
  *    at 0 and cover /Size entries; 20-byte entry framing;
  *  - every walked object's xref offset must land on its own
  *    `N 0 obj` header (the lying-xref damage);
  *  - stream /Length must tile EXACTLY to `endstream` (the
  *    lying-length damage) and the zlib adler must verify;
  *  - /Count must equal the /Kids length; graph refs must resolve
  *    in-table; BT/ET must balance; Tj/TJ outside BT..ET quarantine;
  *  - operand shapes are typed (Tj wants one string; TJ wants one
  *    array of strings/numbers; Td two numbers; Tf name+number).
  *
  * No PDF library exists in this container (stated honestly): pinned
  * by build∘extract identity over the sim corpus, the damage grid and
  * the truncation sweep; the oracle replays page/op geometry
  * closed-form off UTF-8 byte lengths (the d129/d161 pattern). */
object PdfText {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** What the walker returns for an intact document. `textBytes` is
    * the concatenation of every shown string's raw bytes in content
    * order (PDF literal strings are BYTE strings; the round-trip
    * compares bytes, not decoded glyphs). `kernSum` sums the numeric
    * (kerning) elements inside TJ arrays. */
  final case class Extract(nPages: Int, nObjects: Int, nTextOps: Int,
                           textBytes: Array[Byte], kernSum: Long)

  // ---- object model (the subset the graph walk needs) --------------
  private sealed trait Obj
  private final case class PNum(v: Double) extends Obj
  private final case class PName(v: String) extends Obj
  private final case class PStr(v: Array[Byte]) extends Obj
  private final case class PArr(v: Vector[Obj]) extends Obj
  private final case class PDict(v: Map[String, Obj]) extends Obj
  private final case class PRef(num: Int) extends Obj
  private case object PNull extends Obj
  private final case class PBool(v: Boolean) extends Obj

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
    c == '{' || c == '}' || c == '/' || c == '%'

  /** Recursive-descent parser over `b` starting at `p0`; returns
    * (object, next position). Shared by the object graph and the
    * content-stream tokenizer. */
  private final class Lexer(b: Array[Byte]) {
    var p = 0
    def eof: Boolean = p >= b.length
    private def cur: Int = { if (eof) throw Malformed; b(p) & 0xff }
    def skipWs(): Unit = {
      while (!eof && (isWs(b(p) & 0xff) || (b(p) & 0xff) == '%')) {
        if ((b(p) & 0xff) == '%') { // comment to EOL
          while (!eof && b(p) != '\n' && b(p) != '\r') p += 1
        } else p += 1
      }
    }
    def expect(s: String): Unit = {
      if (p + s.length > b.length) throw Malformed
      var i = 0
      while (i < s.length) {
        if (b(p + i) != s.charAt(i).toByte) throw Malformed
        i += 1
      }
      p += s.length
    }
    /** Bare token: operator or keyword (alphabetic + a few symbols). */
    def token(): String = {
      skipWs()
      val s = p
      while (!eof && !isWs(b(p) & 0xff) && !isDelim(b(p) & 0xff)) p += 1
      if (p == s) throw Malformed
      new String(b, s, p - s, "ISO-8859-1")
    }
    def peekByte(): Int = { skipWs(); cur }

    def number(): Double = {
      skipWs()
      val s = p
      if (!eof && (cur == '+' || cur == '-')) p += 1
      var digits = false
      while (!eof && cur >= '0' && cur <= '9') { p += 1; digits = true }
      if (!eof && cur == '.') {
        p += 1
        while (!eof && cur >= '0' && cur <= '9') { p += 1; digits = true }
      }
      if (!digits) throw Malformed
      java.lang.Double.parseDouble(new String(b, s, p - s, "ISO-8859-1"))
    }

    def name(): String = {
      skipWs()
      if (cur != '/') throw Malformed
      p += 1
      val sb = new StringBuilder
      while (!eof && !isWs(cur) && !isDelim(cur)) {
        if (cur == '#') { // #xx hex escape in names
          if (p + 2 >= b.length) throw Malformed
          val h = Integer.parseInt(new String(b, p + 1, 2, "ISO-8859-1"), 16)
          sb.append(h.toChar); p += 3
        } else { sb.append(cur.toChar); p += 1 }
      }
      sb.toString
    }

    /** Literal string `(...)`: full escape set, balanced nested
      * parens, backslash-EOL continuation; an in-string raw EOL reads
      * as LF per spec. */
    def litString(): Array[Byte] = {
      if (cur != '(') throw Malformed
      p += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        val c = cur; p += 1
        c match {
          case '(' => depth += 1; out.write('(')
          case ')' => depth -= 1; if (depth > 0) out.write(')')
          case '\\' =>
            val e = cur; p += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (!eof && cur == '\n') p += 1 // continuation
              case '\n' => () // continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'; var n = 1
                while (n < 3 && !eof && cur >= '0' && cur <= '7') {
                  v = v * 8 + (cur - '0'); p += 1; n += 1
                }
                out.write(v & 0xff)
              case _ => out.write(e) // spec: unknown escape = the char
            }
          case '\r' => // raw EOL inside a literal reads as LF
            if (!eof && cur == '\n') p += 1
            out.write('\n')
          case other => out.write(other)
        }
      }
      out.toByteArray
    }

    /** Hex string `<...>`: pairs of hex digits, odd count pads 0. */
    def hexString(): Array[Byte] = {
      expect("<")
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      while (cur != '>') {
        val c = cur; p += 1
        if (!isWs(c)) {
          val v = Character.digit(c, 16)
          if (v < 0) throw Malformed
          if (hi < 0) hi = v else { out.write(hi * 16 + v); hi = -1 }
        }
      }
      p += 1
      if (hi >= 0) out.write(hi * 16)
      out.toByteArray
    }

    /** Full object (for the graph): handles `N 0 R` references by
      * lookahead after an integer. */
    def obj(depth: Int): Obj = {
      if (depth > 32) throw Malformed
      skipWs()
      cur match {
        case '/' => PName(name())
        case '(' => PStr(litString())
        case '[' =>
          p += 1
          val items = Vector.newBuilder[Obj]
          skipWs()
          while (cur != ']') { items += obj(depth + 1); skipWs() }
          p += 1
          PArr(items.result())
        case '<' =>
          if (p + 1 < b.length && b(p + 1) == '<') {
            p += 2
            val m = Map.newBuilder[String, Obj]
            skipWs()
            while (cur != '>') { m += (name() -> obj(depth + 1)); skipWs() }
            expect(">>")
            PDict(m.result())
          } else PStr(hexString())
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val v = number()
          // `N G R` reference lookahead (integers only)
          val save = p
          if (v >= 0 && v == math.floor(v)) {
            try {
              val g = number()
              skipWs()
              if (g == 0 && cur == 'R') {
                p += 1
                // R must be a lone token
                if (!eof && !isWs(b(p) & 0xff) && !isDelim(b(p) & 0xff))
                  throw Malformed
                return PRef(v.toInt)
              }
              // non-zero generations are out of walker scope
              if (g != 0 && cur == 'R') throw Malformed
              p = save
            } catch { case Malformed => p = save }
          }
          PNum(v)
        case 't' => expect("true"); PBool(true)
        case 'f' => expect("false"); PBool(false)
        case 'n' => expect("null"); PNull
        case _ => throw Malformed
      }
    }
  }

  /** Strict walk. None = quarantined (any deviation from the
    * strictness inventory above). */
  def extract(b: Array[Byte]): Option[Extract] =
    try Some(walk(b)) catch { case Malformed => None }

  private def walk(b: Array[Byte]): Extract = {
    // header
    if (b.length < 16) throw Malformed
    val head = new String(b, 0, 7, "ISO-8859-1")
    if (head != "%PDF-1.") throw Malformed

    // tail: ... startxref \n OFFSET \n %%EOF [ws]
    var e = b.length
    while (e > 0 && isWs(b(e - 1) & 0xff)) e -= 1
    if (e < 5 || new String(b, e - 5, 5, "ISO-8859-1") != "%%EOF")
      throw Malformed
    val tailFrom = math.max(0, e - 64)
    val tail = new String(b, tailFrom, e - 5 - tailFrom, "ISO-8859-1")
    val sxAt = tail.lastIndexOf("startxref")
    if (sxAt < 0) throw Malformed
    val xrefOff = tail.substring(sxAt + 9).trim.toLongOption
      .getOrElse(throw Malformed)
    if (xrefOff < 0 || xrefOff >= b.length) throw Malformed

    // xref table: `xref\n0 N\n` + N 20-byte entries, then trailer
    val lx = new Lexer(b)
    lx.p = xrefOff.toInt
    lx.expect("xref")
    lx.skipWs()
    val first = lx.number()
    val count = lx.number()
    if (first != 0 || count < 1 || count != math.floor(count))
      throw Malformed
    val n = count.toInt
    // entries start on the next line; each exactly 20 bytes
    if (b(lx.p) == '\r') lx.p += 1
    if (b(lx.p) == '\n') lx.p += 1
    val offsets = new Array[Long](n)
    val inUse = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val at = lx.p + i * 20
      if (at + 20 > b.length) throw Malformed
      val line = new String(b, at, 20, "ISO-8859-1")
      if (!line.matches("""\d{10} \d{5} [nf](\r\n| \n| \r)""")) throw Malformed
      offsets(i) = line.substring(0, 10).toLong
      inUse(i) = line.charAt(17) == 'n'
      if (line.substring(11, 16).toInt != (if (i == 0) 65535 else 0))
        throw Malformed
      i += 1
    }
    if (inUse(0)) throw Malformed // entry 0 is the free-list head
    lx.p += n * 20

    // trailer
    lx.skipWs()
    lx.expect("trailer")
    val trailer = lx.obj(0) match {
      case PDict(m) => m
      case _ => throw Malformed
    }
    val size = trailer.get("Size") match {
      case Some(PNum(v)) if v == n => n
      case _ => throw Malformed
    }
    val rootRef = trailer.get("Root") match {
      case Some(PRef(r)) => r
      case _ => throw Malformed
    }

    // object loader: the xref offset MUST land on `N 0 obj`
    def load(num: Int): (Map[String, Obj], Lexer) = {
      if (num <= 0 || num >= size || !inUse(num)) throw Malformed
      val off = offsets(num)
      if (off < 0 || off >= b.length) throw Malformed
      val l = new Lexer(b)
      l.p = off.toInt
      val gotNum = l.number()
      val gotGen = l.number()
      l.skipWs(); l.expect("obj")
      if (gotNum != num || gotGen != 0) throw Malformed
      l.obj(0) match {
        case PDict(m) => (m, l)
        case _ => throw Malformed
      }
    }
    def endObj(l: Lexer): Unit = { l.skipWs(); l.expect("endobj") }

    // catalog -> pages -> kids
    val (cat, lc) = load(rootRef)
    if (cat.get("Type") != Some(PName("Catalog"))) throw Malformed
    endObj(lc)
    val pagesRef = cat.get("Pages") match {
      case Some(PRef(r)) => r
      case _ => throw Malformed
    }
    val (pages, lp) = load(pagesRef)
    if (pages.get("Type") != Some(PName("Pages"))) throw Malformed
    endObj(lp)
    val kids = pages.get("Kids") match {
      case Some(PArr(ks)) => ks.map {
        case PRef(r) => r
        case _ => throw Malformed
      }
      case _ => throw Malformed
    }
    pages.get("Count") match {
      case Some(PNum(c)) if c == kids.length => ()
      case _ => throw Malformed
    }

    val text = new java.io.ByteArrayOutputStream()
    var kernSum = 0L
    var nOps = 0

    kids.foreach { pref =>
      val (page, lg) = load(pref)
      if (page.get("Type") != Some(PName("Page"))) throw Malformed
      if (page.get("Parent") != Some(PRef(pagesRef))) throw Malformed
      endObj(lg)
      val cref = page.get("Contents") match {
        case Some(PRef(r)) => r
        case _ => throw Malformed
      }
      val (sd, ls) = load(cref)
      val len = sd.get("Length") match {
        case Some(PNum(v)) if v >= 0 && v == math.floor(v) => v.toLong
        case _ => throw Malformed
      }
      if (sd.get("Filter") != Some(PName("FlateDecode"))) throw Malformed
      // `stream` then CRLF or LF, exactly Length bytes, EOL, `endstream`
      ls.skipWs()
      ls.expect("stream")
      if (ls.p < b.length && b(ls.p) == '\r') ls.p += 1
      if (ls.p >= b.length || b(ls.p) != '\n') throw Malformed
      ls.p += 1
      if (ls.p + len > b.length) throw Malformed
      val raw = java.util.Arrays.copyOfRange(b, ls.p, ls.p + len.toInt)
      ls.p += len.toInt
      if (ls.p < b.length && b(ls.p) == '\r') ls.p += 1
      if (ls.p < b.length && b(ls.p) == '\n') ls.p += 1
      ls.expect("endstream") // a lying /Length breaks exactly here
      endObj(ls)
      // /Length must tile the filtered data EXACTLY: zlibDecode is
      // strict about trailing bytes (Deflate.scala's no-trailing-
      // garbage rule), so a length one high — which smuggles the EOL
      // byte into the stream span yet still lands on `endstream` —
      // dies here, not at the framing check
      val content = DeflateCodec.zlibDecode(raw).getOrElse(throw Malformed)

      // content tokenizer: postfix operand/operator stream
      val cl = new Lexer(content)
      var operands = List.empty[Obj]
      var btDepth = 0
      cl.skipWs()
      while (!cl.eof) {
        val c = cl.peekByte()
        if (c == '(' ) { operands ::= PStr(cl.litString()) }
        else if (c == '<') { operands ::= PStr(cl.hexString()) }
        else if (c == '[') { operands ::= cl.obj(0) }
        else if (c == '/') { operands ::= PName(cl.name()) }
        else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9'))
          operands ::= PNum(cl.number())
        else {
          val op = cl.token()
          op match {
            case "BT" =>
              if (operands.nonEmpty || btDepth != 0) throw Malformed
              btDepth = 1
            case "ET" =>
              if (operands.nonEmpty || btDepth != 1) throw Malformed
              btDepth = 0
            case "Tf" => operands match {
              case PNum(_) :: PName(_) :: Nil if btDepth == 1 =>
                operands = Nil
              case _ => throw Malformed
            }
            case "Td" => operands match {
              case PNum(_) :: PNum(_) :: Nil if btDepth == 1 =>
                operands = Nil
              case _ => throw Malformed
            }
            case "Tj" => operands match {
              case PStr(s) :: Nil if btDepth == 1 =>
                text.write(s, 0, s.length); nOps += 1; operands = Nil
              case _ => throw Malformed
            }
            case "TJ" => operands match {
              case PArr(items) :: Nil if btDepth == 1 =>
                items.foreach {
                  case PStr(s) => text.write(s, 0, s.length)
                  case PNum(v) => kernSum += v.toLong
                  case _ => throw Malformed
                }
                nOps += 1; operands = Nil
              case _ => throw Malformed
            }
            case _ => throw Malformed // out-of-scope operator
          }
        }
        cl.skipWs()
      }
      if (btDepth != 0 || operands.nonEmpty) throw Malformed
    }

    Extract(kids.length, size - 1, nOps, text.toByteArray, kernSum)
  }
}

/** Deterministic PDF corpus over the documents table: each doc's REAL
  * text rides as the pages' shown strings — page i gets the UTF-8
  * byte slice [i·L/n, (i+1)·L/n), shown as one Tj (first half) and
  * one TJ of two parts around a kerning number, so the concatenated
  * extraction must equal the doc's bytes EXACTLY. n_pages = 1 +
  * doc_id % 4; objects: catalog, pages, per-page (page + Flate
  * content stream), one shared font ⇒ 3 + 2n.
  *
  * Damage %7 (the d162 grid discipline): 0 → truncation (the tail
  * anchor %%EOF/startxref is cut); 3 → a LYING XREF offset (the first
  * page object's entry one byte high — every object byte intact, only
  * the `N 0 obj` landing check objects); 5 → the LAST content
  * stream's /Length one high (stream bytes intact — only the
  * endstream tiling check objects). */
object PdfSim {
  import java.nio.charset.StandardCharsets.UTF_8

  private[graft] def nPages(docId: Long): Int = (1 + docId % 4).toInt
  private[graft] def kern(docId: Long, page: Int): Long =
    -(100 + (docId + page) % 50)

  /** Escape a byte slice into a PDF literal string body. */
  private def esc(b: Array[Byte], from: Int, until: Int,
                  out: java.io.ByteArrayOutputStream): Unit = {
    var i = from
    while (i < until) {
      val c = b(i) & 0xff
      c match {
        case '(' => out.write('\\'); out.write('(')
        case ')' => out.write('\\'); out.write(')')
        case '\\' => out.write('\\'); out.write('\\')
        case '\r' => out.write('\\'); out.write('r')
        case '\n' => out.write('\\'); out.write('n')
        case _ => out.write(c)
      }
      i += 1
    }
  }

  /** One page's content stream (pre-Flate). */
  private def pageContent(docId: Long, page: Int, tb: Array[Byte],
                          lo: Int, hi: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    val half = lo + (hi - lo) / 2
    val q3 = lo + (hi - lo) * 3 / 4
    w("BT /F1 12 Tf 72 720 Td (")
    esc(tb, lo, half, out)
    w(") Tj 0 -14 Td [(")
    esc(tb, half, q3, out)
    w(s") ${kern(docId, page)} (")
    esc(tb, q3, hi, out)
    w(")] TJ ET")
    out.toByteArray
  }

  /** Build the document; `lieXref` bumps object 3's xref offset,
    * `lieLen` over-declares the last content stream's /Length. */
  private[graft] def build(docId: Long, text: String,
                           lieXref: Boolean = false,
                           lieLen: Boolean = false): Array[Byte] = {
    val n = nPages(docId)
    val tb = text.getBytes(UTF_8)
    val L = tb.length
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    val fontObj = 3 + 2 * n
    val offsets = new Array[Long](fontObj + 1)

    w("%PDF-1.4\n")
    offsets(1) = out.size()
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets(2) = out.size()
    w(s"2 0 obj\n<< /Type /Pages /Kids [" +
      (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ") +
      s"] /Count $n >>\nendobj\n")
    for (i <- 0 until n) {
      val pageObj = 3 + 2 * i
      val contObj = 4 + 2 * i
      offsets(pageObj) = out.size()
      w(s"$pageObj 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> " +
        s"/Contents $contObj 0 R >>\nendobj\n")
      val lo = (i.toLong * L / n).toInt
      val hi = ((i + 1).toLong * L / n).toInt
      val flate = DeflateCodec.zlibEncode(
        pageContent(docId, i, tb, lo, hi), 1 << 16)
      offsets(contObj) = out.size()
      val declared = flate.length + (if (lieLen && i == n - 1) 1 else 0)
      w(s"$contObj 0 obj\n<< /Length $declared /Filter /FlateDecode >>\nstream\n")
      out.write(flate)
      w("\nendstream\nendobj\n")
    }
    offsets(fontObj) = out.size()
    w(s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xrefAt = out.size()
    w(s"xref\n0 ${fontObj + 1}\n")
    w("0000000000 65535 f \n")
    for (o <- 1 to fontObj) {
      val off = offsets(o) + (if (lieXref && o == 3) 1 else 0)
      w(f"$off%010d 00000 n \n")
    }
    w(s"trailer\n<< /Size ${fontObj + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n" +
      "%%EOF\n")
    out.toByteArray
  }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    (docId % 7) match {
      case 0 =>
        val clean = build(docId, text)
        java.util.Arrays.copyOf(clean, clean.length - 6)
      case 3 => build(docId, text, lieXref = true)
      case 5 => build(docId, text, lieLen = true)
      case _ => build(docId, text)
    }
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_pages", LongType),
    StructField("n_objects", LongType),
    StructField("n_text_ops", LongType),
    StructField("text_bytes", LongType),
    StructField("kern_sum", LongType),
    StructField("roundtrip_ok", BooleanType)))

  /** The gate: build per doc, walk strictly, emit geometry + the
    * byte-exact round-trip verdict; damaged docs never surface. */
  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            PdfText.extract(PdfSim.payloadFor(id, text)) match {
              case Some(x) =>
                Iterator.single(Row(id, x.nPages.toLong, x.nObjects.toLong,
                  x.nTextOps.toLong, x.textBytes.length.toLong, x.kernSum,
                  java.util.Arrays.equals(x.textBytes,
                    text.getBytes(UTF_8))))
              case None => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
