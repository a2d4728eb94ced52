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
  *  - [[extract]] walks classic xref TABLES; [[extractXrefStream]]
  *    walks PDF 1.5 cross-reference STREAMS + object streams (the
  *    d166 gate) — each flavor quarantines the other's anchor, and
  *    hybrid files (a table AND a stream, /XRefStm) are out of
  *    scope;
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
                           textBytes: Array[Byte], kernSum: Long,
                           nCompressed: Int = 0)

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
    def buf: Array[Byte] = b
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
          // Non-hex digits after '#' (e.g. /A#G1) are malformed input,
          // not a crash: quarantine like every other lexer error.
          val hi = Character.digit((b(p + 1) & 0xff).toChar, 16)
          val lo = Character.digit((b(p + 2) & 0xff).toChar, 16)
          if (hi < 0 || lo < 0) throw Malformed
          sb.append(((hi << 4) | lo).toChar); p += 3
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

  /** PDF 1.5 variant: cross-reference STREAM + object streams. */
  def extractXrefStream(b: Array[Byte]): Option[Extract] =
    try Some(walkXrefStream(b)) catch { case Malformed => None }

  /** Header + `startxref` anchor shared by both xref flavors. */
  private def startXrefOffset(b: Array[Byte]): Int = {
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
    xrefOff.toInt
  }

  /** Parse `N 0 obj` + dict at a validated offset. */
  private def objAt(b: Array[Byte], off: Long, num: Int): (Map[String, Obj], Lexer) = {
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

  /** Read a FlateDecode stream body following a dict: framing
    * (`stream` EOL, exactly /Length bytes, EOL, `endstream`) + zlib.
    * zlibDecode is strict about trailing bytes (Deflate.scala's
    * no-trailing-garbage rule), so a length one high — which smuggles
    * the EOL byte into the stream span yet still lands on
    * `endstream` — dies here, not at the framing check. */
  private def readStream(sd: Map[String, Obj], ls: Lexer): Array[Byte] = {
    val b = ls.buf
    val len = sd.get("Length") match {
      case Some(PNum(v)) if v >= 0 && v == math.floor(v) => v.toLong
      case _ => throw Malformed
    }
    if (sd.get("Filter") != Some(PName("FlateDecode"))) throw Malformed
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
    ls.expect("endstream")
    ls.skipWs(); ls.expect("endobj")
    DeflateCodec.zlibDecode(raw).getOrElse(throw Malformed)
  }

  private def walk(b: Array[Byte]): Extract = {
    val xrefOff = startXrefOffset(b)

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

    // object loader: the xref offset MUST land on `N 0 obj`.
    // The boolean marks "top-level" — table xref has no other kind.
    def load(num: Int): (Map[String, Obj], Lexer, Boolean) = {
      if (num <= 0 || num >= size || !inUse(num)) throw Malformed
      val (m, l) = objAt(b, offsets(num), num)
      (m, l, true)
    }
    graphWalk(size, load, rootRef)
  }

  /** PDF 1.5 walk: `startxref` points at a CROSS-REFERENCE STREAM
    * (`/Type /XRef`, FlateDecode, /W field widths, /Index ranges) and
    * non-stream objects live compressed inside OBJECT STREAMS
    * (`/Type /ObjStm`, type-2 entries). Strictness added on top of
    * the table walk's inventory:
    *  - /W exactly three positive ints; decoded bytes must TILE
    *    exactly: rows × (w1+w2+w3) = decoded length with rows =
    *    Σ /Index counts (a lying width breaks the tiling, not the
    *    parse);
    *  - /Index pairs non-negative, in-range, non-overlapping
    *    ascending; /Size must equal the table span;
    *  - entry 0 must be type 0 (free); the XRef stream's own entry
    *    must be type 1 at its actual offset;
    *  - type-2 entries: the container must be a well-formed ObjStm
    *    (header of /N strictly-increasing offsets inside /First; the
    *    header's object number AT THE ENTRY'S INDEX must equal the
    *    requested number — a lying index quarantines with every byte
    *    intact), generation implicitly 0;
    *  - ObjStm members are not top-level: no `endobj`, no streams. */
  private def walkXrefStream(b: Array[Byte]): Extract = {
    val xrefOff = startXrefOffset(b)
    // the xref stream is itself `N 0 obj <<...>> stream...endstream`
    val xl = new Lexer(b)
    xl.p = xrefOff
    val xnum = { val v = xl.number(); if (v != math.floor(v)) throw Malformed; v.toInt }
    val xgen = xl.number()
    xl.skipWs(); xl.expect("obj")
    if (xgen != 0) throw Malformed
    val xd = xl.obj(0) match {
      case PDict(m) => m
      case _ => throw Malformed
    }
    if (xd.get("Type") != Some(PName("XRef"))) throw Malformed
    val data = readStream(xd, xl)
    val size = xd.get("Size") match {
      case Some(PNum(v)) if v >= 1 && v == math.floor(v) => v.toInt
      case _ => throw Malformed
    }
    val w = xd.get("W") match {
      case Some(PArr(Vector(PNum(a), PNum(bb), PNum(c))))
        if Seq(a, bb, c).forall(x => x >= 1 && x <= 8 && x == math.floor(x)) =>
        (a.toInt, bb.toInt, c.toInt)
      case _ => throw Malformed
    }
    val rowW = w._1 + w._2 + w._3
    val index: Seq[(Int, Int)] = xd.get("Index") match {
      case None => Seq((0, size))
      case Some(PArr(es)) if es.length % 2 == 0 =>
        es.grouped(2).map {
          case Vector(PNum(f), PNum(c))
            if f >= 0 && c >= 1 && f == math.floor(f) && c == math.floor(c) =>
            (f.toInt, c.toInt)
          case _ => throw Malformed
        }.toSeq
      case _ => throw Malformed
    }
    // ranges ascending, non-overlapping, inside /Size
    index.foldLeft(0) { case (minNext, (f, c)) =>
      if (f < minNext || f + c > size) throw Malformed
      f + c
    }
    val rows = index.map(_._2).sum
    if (rows * rowW != data.length) throw Malformed // the tiling rule
    // decode entries: tpe(num), f2(num), f3(num)
    val tpe = new Array[Int](size)
    val f2 = new Array[Long](size)
    val f3 = new Array[Long](size)
    val present = new Array[Boolean](size)
    var r = 0
    index.foreach { case (first, count) =>
      var k = 0
      while (k < count) {
        var o = r * rowW
        def be(n: Int): Long = {
          var v = 0L; var i = 0
          while (i < n) { v = (v << 8) | (data(o + i) & 0xffL); i += 1 }
          o += n
          v
        }
        val num = first + k
        tpe(num) = be(w._1).toInt
        f2(num) = be(w._2)
        f3(num) = be(w._3)
        present(num) = true
        r += 1; k += 1
      }
    }
    if (!present(0) || tpe(0) != 0) throw Malformed // free-list head
    // the XRef stream's own entry must be type 1 at its real offset
    if (xnum <= 0 || xnum >= size || !present(xnum) ||
      tpe(xnum) != 1 || f2(xnum) != xrefOff) throw Malformed
    val rootRef = xd.get("Root") match {
      case Some(PRef(rr)) => rr
      case _ => throw Malformed
    }

    // object-stream cache: (decoded content, header pairs, First)
    val objStmCache = scala.collection.mutable.Map
      .empty[Int, (Array[Byte], Vector[(Int, Int)], Int)]
    def objStm(num: Int): (Array[Byte], Vector[(Int, Int)], Int) =
      objStmCache.getOrElseUpdate(num, {
        if (num <= 0 || num >= size || !present(num) || tpe(num) != 1)
          throw Malformed
        val (sd, sl) = objAt(b, f2(num), num)
        if (sd.get("Type") != Some(PName("ObjStm"))) throw Malformed
        val content = readStream(sd, sl)
        val n = sd.get("N") match {
          case Some(PNum(v)) if v >= 1 && v == math.floor(v) => v.toInt
          case _ => throw Malformed
        }
        val first = sd.get("First") match {
          case Some(PNum(v)) if v >= 0 && v == math.floor(v) => v.toInt
          case _ => throw Malformed
        }
        if (first > content.length) throw Malformed
        val hl = new Lexer(content)
        val pairs = Vector.fill(n) {
          val on = hl.number(); val off = hl.number()
          if (on != math.floor(on) || off != math.floor(off) ||
            on < 1 || off < 0) throw Malformed
          (on.toInt, off.toInt)
        }
        if (hl.p > first) throw Malformed // header must fit in /First
        pairs.foldLeft(-1) { case (prev, (_, off)) =>
          if (off <= prev || first + off > content.length) throw Malformed
          off
        }
        (content, pairs, first)
      })

    def load(num: Int): (Map[String, Obj], Lexer, Boolean) = {
      if (num <= 0 || num >= size || !present(num)) throw Malformed
      tpe(num) match {
        case 1 =>
          val (m, l) = objAt(b, f2(num), num)
          (m, l, true)
        case 2 =>
          val (content, pairs, first) = objStm(f2(num).toInt)
          val idx = f3(num)
          if (idx < 0 || idx >= pairs.length) throw Malformed
          val (hdrNum, off) = pairs(idx.toInt)
          if (hdrNum != num) throw Malformed // the lying-index catch
          val l = new Lexer(content)
          l.p = first + off
          l.obj(0) match {
            case PDict(m) => (m, l, false)
            case _ => throw Malformed
          }
        case _ => throw Malformed // free or unknown type on the graph
      }
    }
    graphWalk(size, load, rootRef)
      .copy(nCompressed = (1 until size).count(i => present(i) && tpe(i) == 2))
  }

  /** Catalog → Pages → per-page content walk + text-op tokenizer,
    * shared by both xref flavors. `load` returns (dict, lexer
    * positioned after the dict, isTopLevel) — objects inside an
    * object stream are NOT top-level: they carry no `endobj` and may
    * not own streams (the spec's ObjStm rule; the stream-read path
    * requires top-level and quarantines otherwise). */
  private def graphWalk(size: Int,
                        load: Int => (Map[String, Obj], Lexer, Boolean),
                        rootRef: Int): Extract = {
    def endObj(l: Lexer, top: Boolean): Unit =
      if (top) { l.skipWs(); l.expect("endobj") }

    // catalog -> pages -> kids
    val (cat, lc, ct) = load(rootRef)
    if (cat.get("Type") != Some(PName("Catalog"))) throw Malformed
    endObj(lc, ct)
    val pagesRef = cat.get("Pages") match {
      case Some(PRef(r)) => r
      case _ => throw Malformed
    }
    val (pages, lp, pt) = load(pagesRef)
    if (pages.get("Type") != Some(PName("Pages"))) throw Malformed
    endObj(lp, pt)
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
      val (page, lg, gt) = load(pref)
      if (page.get("Type") != Some(PName("Page"))) throw Malformed
      if (page.get("Parent") != Some(PRef(pagesRef))) throw Malformed
      endObj(lg, gt)
      val cref = page.get("Contents") match {
        case Some(PRef(r)) => r
        case _ => throw Malformed
      }
      val (sd, ls, st) = load(cref)
      if (!st) throw Malformed // streams may not live inside an ObjStm
      val content = readStream(sd, ls)

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
  private[operators] def pageContent(docId: Long, page: Int, tb: Array[Byte],
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

/** The PDF 1.5 twin of [[PdfSim]]: the SAME document model (same page
  * split, same text ops, same kerning) but with the modern file
  * structure real corpora actually ship — non-stream objects
  * (catalog, pages, page dicts, font) compressed into ONE object
  * stream, content streams top-level (streams may not nest), and a
  * cross-reference STREAM (/W [1 4 2]) closing the file. Object
  * numbering: content 4+2i, font 3+2n, ObjStm 4+2n, XRef 5+2n ⇒
  * size = 6+2n, n_objects = 5+2n, n_compressed = n+3.
  *
  * Damage %7: 0 → truncation; 3 → the catalog's type-2 entry LIES
  * about its index within the ObjStm (points one slot over — every
  * byte of the ObjStm intact; only the header-objnum-at-index check
  * objects); 5 → /W lies ([1 3 2] declared over [1 4 2] data — the
  * rows×rowWidth tiling rule objects, not the parse). */
object PdfXSim {
  import java.nio.charset.StandardCharsets.UTF_8

  private[graft] def nPages(docId: Long): Int = PdfSim.nPages(docId)

  private[graft] def build(docId: Long, text: String,
                           lieIndex: Boolean = false,
                           lieW: Boolean = false): Array[Byte] = {
    val n = nPages(docId)
    val tb = text.getBytes(UTF_8)
    val L = tb.length
    val fontObj = 3 + 2 * n
    val objStmObj = 4 + 2 * n
    val xrefObj = 5 + 2 * n
    val size = 6 + 2 * n

    // ---- the object stream: catalog, pages, page dicts, font ----
    val members: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> ("<< /Type /Pages /Kids [" +
          (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ") +
          s"] /Count $n >>")) ++
      (0 until n).map { i =>
        (3 + 2 * i) ->
          (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
            s"/Resources << /Font << /F1 $fontObj 0 R >> >> " +
            s"/Contents ${4 + 2 * i} 0 R >>")
      } ++
      Seq(fontObj -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val bodies = members.map(_._2.getBytes(UTF_8))
    val offs = bodies.scanLeft(0)((a, bb) => a + bb.length + 1).init
    val header = members.zip(offs)
      .map { case ((num, _), o) => s"$num $o" }.mkString(" ") + "\n"
    val first = header.getBytes(UTF_8).length
    val objStmContent = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(header.getBytes(UTF_8))
      bodies.foreach { bb => o.write(bb); o.write(' ') }
      o.toByteArray
    }
    val objStmFlate = DeflateCodec.zlibEncode(objStmContent, 1 << 16)

    // ---- file assembly ----
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    val offsets = new Array[Long](size)
    w("%PDF-1.5\n")
    for (i <- 0 until n) {
      val contObj = 4 + 2 * i
      val lo = (i.toLong * L / n).toInt
      val hi = ((i + 1).toLong * L / n).toInt
      val flate = DeflateCodec.zlibEncode(
        PdfSim.pageContent(docId, i, tb, lo, hi), 1 << 16)
      offsets(contObj) = out.size()
      w(s"$contObj 0 obj\n<< /Length ${flate.length} /Filter /FlateDecode >>\nstream\n")
      out.write(flate)
      w("\nendstream\nendobj\n")
    }
    offsets(objStmObj) = out.size()
    w(s"$objStmObj 0 obj\n<< /Type /ObjStm /N ${members.length} /First $first " +
      s"/Length ${objStmFlate.length} /Filter /FlateDecode >>\nstream\n")
    out.write(objStmFlate)
    w("\nendstream\nendobj\n")

    // ---- the cross-reference stream ----
    val xrefAt = out.size()
    offsets(xrefObj) = xrefAt
    // entry table: (type, f2, f3) per object number
    val entries = new Array[(Int, Long, Long)](size)
    entries(0) = (0, 0L, 65535L)
    members.zipWithIndex.foreach { case ((num, _), idx) =>
      val lied = if (lieIndex && num == 1) idx + 1 else idx
      entries(num) = (2, objStmObj.toLong, lied.toLong)
    }
    (0 until n).foreach { i =>
      entries(4 + 2 * i) = (1, offsets(4 + 2 * i), 0L)
    }
    entries(objStmObj) = (1, offsets(objStmObj), 0L)
    entries(xrefObj) = (1, xrefAt.toLong, 0L)
    val data = new java.io.ByteArrayOutputStream()
    entries.foreach { case (t, a, c) =>
      data.write(t)
      data.write(((a >> 24) & 0xff).toInt); data.write(((a >> 16) & 0xff).toInt)
      data.write(((a >> 8) & 0xff).toInt); data.write((a & 0xff).toInt)
      data.write(((c >> 8) & 0xff).toInt); data.write((c & 0xff).toInt)
    }
    val xFlate = DeflateCodec.zlibEncode(data.toByteArray, 1 << 16)
    val wDecl = if (lieW) "[1 3 2]" else "[1 4 2]"
    w(s"$xrefObj 0 obj\n<< /Type /XRef /Size $size /W $wDecl /Root 1 0 R " +
      s"/Length ${xFlate.length} /Filter /FlateDecode >>\nstream\n")
    out.write(xFlate)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefAt\n" + "%%EOF\n")
    out.toByteArray
  }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] =
    (docId % 7) match {
      case 0 =>
        val clean = build(docId, text)
        java.util.Arrays.copyOf(clean, clean.length - 6)
      case 3 => build(docId, text, lieIndex = true)
      case 5 => build(docId, text, lieW = true)
      case _ => build(docId, text)
    }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_pages", LongType),
    StructField("n_objects", LongType),
    StructField("n_compressed", LongType),
    StructField("n_text_ops", LongType),
    StructField("text_bytes", LongType),
    StructField("kern_sum", LongType),
    StructField("roundtrip_ok", BooleanType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            PdfText.extractXrefStream(PdfXSim.payloadFor(id, text)) match {
              case Some(x) =>
                Iterator.single(Row(id, x.nPages.toLong, x.nObjects.toLong,
                  x.nCompressed.toLong, x.nTextOps.toLong,
                  x.textBytes.length.toLong, x.kernSum,
                  java.util.Arrays.equals(x.textBytes,
                    text.getBytes(UTF_8))))
              case None => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
