package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RFC 5322 + MIME message reader for the d130 gate — the email-dump
  * corpus shape (.eml; the Enron-class public corpora): message
  * headers with FOLDING (continuation lines starting with WSP,
  * unfolded per RFC 5322 §2.2.3) and case-insensitive names,
  * multipart/mixed bodies delimited by the Content-Type boundary
  * (RFC 2046 §5.1: `--B` part delimiters, `--B--` close), per-part
  * headers, and the two MIME content-transfer-encodings implemented
  * from their RFCs with no borrowed primitive:
  *
  *  - BASE64 (RFC 2045 §6.8): strict alphabet, whitespace-tolerant
  *    line wrapping, exact padding discipline (bad characters, a
  *    dangling quantum, nonzero slack bits and data after the final
  *    pad all QUARANTINE);
  *  - QUOTED-PRINTABLE (RFC 2045 §6.7): `=XX` escapes (strict
  *    uppercase-hex per the RFC's canonical form), soft line breaks
  *    (`=` CRLF), literal printables; a bad escape quarantines.
  *
  * Decoded part bytes pass through the d128 charset tables
  * (`charset=` parameter: us-ascii / utf-8 / windows-1252 — the
  * cp1252 path exercises the '€'=0x80 distinguishing byte), so the
  * whole ingest chain (framing → transfer coding → charset) is
  * from-scratch end to end.
  *
  * Strictness: a missing close delimiter, content before the first
  * delimiter (the RFC's preamble is accepted but the sim never emits
  * one — a STRAY prologue line quarantines under exact-boundary
  * mode), unknown transfer encodings, unknown charsets, bad escapes
  * and undecodable bytes all quarantine.
  */
object EmlCodec {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ------------------------------------------------------------- base64

  private val B64: Array[Int] = {
    val t = Array.fill(128)(-1)
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
    alpha.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i }
    t
  }
  private val B64A =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"

  /** Strict RFC 2045 base64 decode: CR/LF/SP/TAB skipped (line
    * wrapping), anything else outside the alphabet throws; padding
    * must complete the final quantum exactly and slack bits must be
    * zero; nothing may follow the final '='. */
  private[graft] def base64Decode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length * 3 / 4 + 3)
    var acc = 0
    var q = 0 // position in the current 4-char quantum
    var pads = 0
    var done = false
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\r' || c == '\n' || c == ' ' || c == '\t') ()
      else if (done) throw Malformed // data after the final pad
      else if (c == '=') {
        if (q < 2) throw Malformed // '=' only as the 3rd/4th char
        pads += 1
        q += 1
        if (q == 4) {
          val dataBits = 6 * (4 - pads)
          val bytes = if (pads == 1) 2 else 1
          val slack = dataBits - bytes * 8
          if ((acc & ((1 << slack) - 1)) != 0) throw Malformed // slack bits
          val v = acc >> slack
          if (bytes == 2) { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
          else out.write(v & 0xFF)
          done = true
        }
      } else {
        if (pads > 0) throw Malformed // alphabet after '='
        if (c >= 128 || B64(c.toInt) < 0) throw Malformed
        acc = (acc << 6) | B64(c.toInt)
        q += 1
        if (q == 4) {
          out.write((acc >> 16) & 0xFF); out.write((acc >> 8) & 0xFF)
          out.write(acc & 0xFF)
          acc = 0; q = 0
        }
      }
      i += 1
    }
    if (!done && q != 0) throw Malformed // dangling quantum
    out.toByteArray
  }

  private[graft] def base64Encode(b: Array[Byte], wrap0: Int = 60): String = {
    // wrap only at multiples of 4: splitting a quantum (in particular
    // the final padding) across lines is RFC-2045-legal but the JDK's
    // own MIME decoder rejects a lone '=' continuation line ("wrong
    // 4-byte ending unit") — every real MIME encoder wraps at 4k
    // columns, so ours does too; the DECODER stays break-tolerant
    val wrap = math.max(4, wrap0 - (wrap0 % 4))
    val sb = new java.lang.StringBuilder(b.length * 4 / 3 + 8)
    var i = 0
    var col0 = 0
    def emit(c: Char): Unit = {
      sb.append(c)
      col0 += 1
      if (col0 == wrap) { sb.append("\r\n"); col0 = 0 }
    }
    while (i + 2 < b.length) {
      val v = ((b(i) & 0xFF) << 16) | ((b(i + 1) & 0xFF) << 8) | (b(i + 2) & 0xFF)
      emit(B64A((v >> 18) & 63)); emit(B64A((v >> 12) & 63))
      emit(B64A((v >> 6) & 63)); emit(B64A(v & 63))
      i += 3
    }
    (b.length - i) match {
      case 1 =>
        val v = (b(i) & 0xFF) << 16
        emit(B64A((v >> 18) & 63)); emit(B64A((v >> 12) & 63))
        emit('='); emit('=')
      case 2 =>
        val v = ((b(i) & 0xFF) << 16) | ((b(i + 1) & 0xFF) << 8)
        emit(B64A((v >> 18) & 63)); emit(B64A((v >> 12) & 63))
        emit(B64A((v >> 6) & 63)); emit('=')
      case _ => ()
    }
    sb.toString
  }

  // ---------------------------------------------------- quoted-printable

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else throw Malformed // RFC 2045: canonical escapes use UPPERCASE hex

  /** Strict quoted-printable decode: `=XX` (uppercase hex), `=CRLF`
    * soft breaks, literal printables/CRLF/TAB; a bad escape or a
    * bare '=' at end throws. */
  private[graft] def qpDecode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '=') {
        if (i + 3 > s.length) throw Malformed // bare '=' at end
        if (s(i + 1) == '\r' && s(i + 2) == '\n') () // soft line break
        else out.write((hexVal(s(i + 1)) << 4) | hexVal(s(i + 2)))
        i += 3
      } else {
        if (c == '\r' || c == '\n' || c == '\t' ||
            (c >= ' ' && c <= '~')) out.write(c.toInt)
        else throw Malformed // raw non-printable: not canonical QP
        i += 1
      }
    }
    out.toByteArray
  }

  /** Quoted-printable encode of raw bytes: printables literal (except
    * '='), everything else `=XX`, soft-wrapped at ~72 chars. */
  private[graft] def qpEncode(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length + 16)
    var col0 = 0
    def room(n: Int): Unit =
      if (col0 + n > 72) { sb.append("=\r\n"); col0 = 0 }
    b.foreach { by =>
      val v = by & 0xFF
      if (v >= ' ' && v <= '~' && v != '=') { room(1); sb.append(v.toChar); col0 += 1 }
      else { room(3); sb.append(f"=${v}%02X"); col0 += 3 }
    }
    sb.toString
  }

  // ------------------------------------------------------ message parse

  private[graft] final case class MimePart(
      headers: Map[String, String], body: String)

  /** Split CRLF lines; a bare LF or trailing CR quarantines. */
  private def lines(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    var start = 0
    while (i < s.length) {
      if (s(i) == '\n') {
        if (i == 0 || s(i - 1) != '\r') throw Malformed
        out += s.substring(start, i - 1)
        start = i + 1
      } else if (s(i) == '\r' && (i + 1 >= s.length || s(i + 1) != '\n'))
        throw Malformed
      i += 1
    }
    if (start < s.length) out += s.substring(start)
    out.result()
  }

  /** RFC 5322 header block parse with UNFOLDING: continuation lines
    * (leading SP/TAB) append to the previous value with one space.
    * Returns (lowercased-name → value, remaining lines). */
  private def parseHeaders(ls: Seq[String]): (Map[String, String], Seq[String]) = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var lastKey: String = null
    var i = 0
    var done = false
    while (!done) {
      if (i >= ls.length) throw Malformed // no body separator
      val l = ls(i)
      if (l.isEmpty) { done = true }
      else if (l(0) == ' ' || l(0) == '\t') {
        if (lastKey == null) throw Malformed // folding with no header
        m(lastKey) = m(lastKey) + " " + l.trim
        i += 1
      } else {
        val c = l.indexOf(':')
        if (c <= 0) throw Malformed
        val name = l.substring(0, c)
        if (name.exists(ch => ch <= ' ' || ch >= 127)) throw Malformed
        lastKey = name.toLowerCase(java.util.Locale.ROOT)
        if (m.contains(lastKey)) throw Malformed // duplicates: out of scope
        m(lastKey) = l.substring(c + 1).trim
        i += 1
      }
    }
    (m.toMap, ls.drop(i + 1))
  }

  /** `name/sub; key="v"; k2=v2` → (media type, params). */
  private def parseContentType(v: String): (String, Map[String, String]) = {
    val parts = v.split(";").map(_.trim)
    val mt = parts.head.toLowerCase(java.util.Locale.ROOT)
    val params = parts.tail.filter(_.nonEmpty).map { p =>
      val e = p.indexOf('=')
      if (e <= 0) throw Malformed
      val k = p.substring(0, e).trim.toLowerCase(java.util.Locale.ROOT)
      var value = p.substring(e + 1).trim
      if (value.length >= 2 && value.head == '"' && value.last == '"')
        value = value.substring(1, value.length - 1)
      k -> value
    }.toMap
    (mt, params)
  }

  /** Parse one .eml message: top headers, multipart body, per-part
    * transfer decode + charset transcode → decoded part texts with
    * their (encoding, charset) labels. Strict throughout. */
  private[graft] def parseMessage(raw: String): Option[Seq[(String, String, String)]] =
    try {
      val (top, bodyLines) = parseHeaders(lines(raw))
      if (!top.get("mime-version").exists(_.startsWith("1.0"))) throw Malformed
      val (mt, params) = parseContentType(
        top.getOrElse("content-type", throw Malformed))
      if (mt != "multipart/mixed") throw Malformed // bounded gate scope
      val boundary = params.getOrElse("boundary", throw Malformed)
      if (boundary.isEmpty || boundary.length > 70) throw Malformed
      val delim = "--" + boundary
      val close = delim + "--"
      // walk the body: nothing before the first delimiter (no
      // preamble in this gate's scope), parts between delimiters,
      // close delimiter mandatory, nothing after (no epilogue)
      if (bodyLines.isEmpty || bodyLines.head != delim) throw Malformed
      val parts = Seq.newBuilder[Seq[String]]
      var cur = Seq.newBuilder[String]
      var closed = false
      var i = 1
      while (!closed) {
        if (i >= bodyLines.length) throw Malformed // close delimiter missing
        val l = bodyLines(i)
        if (l == close) { parts += cur.result(); closed = true }
        else if (l == delim) { parts += cur.result(); cur = Seq.newBuilder[String] }
        else cur += l
        i += 1
      }
      if (i != bodyLines.length &&
          !bodyLines.drop(i).forall(_.isEmpty)) throw Malformed // epilogue
      Some(parts.result().map { pls =>
        val (ph, pbody) = parseHeaders(pls)
        val (pmt, pparams) = parseContentType(
          ph.getOrElse("content-type", "text/plain"))
        if (pmt != "text/plain") throw Malformed
        val charset = pparams.getOrElse("charset", "us-ascii")
          .toLowerCase(java.util.Locale.ROOT)
        val enc = ph.getOrElse("content-transfer-encoding", "7bit")
          .toLowerCase(java.util.Locale.ROOT)
        val joined = pbody.mkString("\r\n")
        val bytes = enc match {
          case "base64" => base64Decode(joined)
          case "quoted-printable" => qpDecode(joined)
          case "7bit" =>
            val b = joined.getBytes("US-ASCII")
            if (joined.exists(_ >= 128)) throw Malformed
            b
          case _ => throw Malformed
        }
        val text = charset match {
          case "us-ascii" => CharsetSniff.decodeAscii(bytes, 0, bytes.length)
          case "utf-8" => CharsetSniff.decodeUtf8(bytes, 0, bytes.length)
          case "windows-1252" => CharsetSniff.decodeCp1252(bytes, 0, bytes.length)
          case _ => throw Malformed
        }
        (enc, charset, text)
      })
    } catch {
      case Malformed => None
      case CharsetSniff.Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: StringIndexOutOfBoundsException => None
    }
}

/** In-plan synthesizer + gate for d130 — the message as a ROW SOURCE
  * (the d129 discipline): each doc becomes one .eml with K = 2 +
  * doc_id%3 text parts (the d111 codepoint slices), transfer
  * encodings rotating base64 / quoted-printable / 7bit and charsets
  * utf-8 / windows-1252 / us-ascii, folded top headers, and a
  * boundary starting with '=' — a character base64's alphabet lacks
  * and quoted-printable always escapes, so NO part content can ever
  * collide with the delimiter (the classic MIME injection hazard,
  * dodged by construction and documented).
  *
  * Damage slice on doc_id%7: 0 → close delimiter truncated (a
  * multipart body must END; an unterminated message quarantines);
  * 3 → one bad BASE64 character ('!') in the first part — only the
  * transfer-coding alphabet catches it; 5 → a bad QUOTED-PRINTABLE
  * escape (`=G7`) in the second part — strict uppercase-hex rejects.
  * Damaged docs contribute nothing (the d105/d111 row-source rule). */
object EmlSim {

  private[graft] def nParts(docId: Long): Int = (2 + docId % 3).toInt

  private[graft] def slices(docId: Long, text: String): Seq[String] = {
    val k = nParts(docId)
    val cps = text.codePointCount(0, text.length)
    (0 until k).map { j =>
      val a = text.offsetByCodePoints(0, (j.toLong * cps / k).toInt)
      val b = text.offsetByCodePoints(0, ((j + 1).toLong * cps / k).toInt)
      text.substring(a, b)
    }
  }

  /** The decoded text the gate expects for part j (the oracle's
    * closed forms). */
  private[graft] def partText(docId: Long, slice: String, j: Int): String =
    (j % 3) match {
      case 0 => slice // base64 carries raw UTF-8
      case 1 => CharsetSim.sanitize(slice).replace('e', '€') // cp1252 via QP
      case _ => CharsetSim.sanitize(slice).replace('=', ' ') // 7bit ascii
    }

  private[graft] def render(docId: Long, text: String,
                            badB64: Boolean = false,
                            badQp: Boolean = false): String = {
    val boundary = s"=_graft_$docId"
    val sb = new java.lang.StringBuilder(text.length * 2 + 512)
    sb.append("MIME-Version: 1.0\r\n")
    sb.append("From: corpus@example.org\r\n")
    sb.append(s"Subject: graft doc $docId\r\n")
    sb.append(" (folded continuation line)\r\n") // RFC 5322 folding
    sb.append(s"""conTent-tYpe: multipart/mixed; boundary="$boundary"\r\n""")
    sb.append("\r\n")
    slices(docId, text).zipWithIndex.foreach { case (sl, j) =>
      sb.append(s"--$boundary\r\n")
      (j % 3) match {
        case 0 =>
          sb.append("Content-Type: text/plain; charset=\"utf-8\"\r\n")
          sb.append("Content-Transfer-Encoding: base64\r\n\r\n")
          var enc = EmlCodec.base64Encode(CharsetSim.utf8Encode(sl))
          if (badB64 && j == 0) enc = "!" + enc
          sb.append(enc).append("\r\n")
        case 1 =>
          sb.append("Content-Type: text/plain; charset=\"windows-1252\"\r\n")
          sb.append("Content-Transfer-Encoding: quoted-printable\r\n\r\n")
          var enc = EmlCodec.qpEncode(
            CharsetSim.cp1252Encode(partText(docId, sl, j)))
          if (badQp && j == 1) enc = "=G7" + enc
          sb.append(enc).append("\r\n")
        case _ =>
          sb.append("Content-Type: text/plain; charset=\"us-ascii\"\r\n")
          sb.append("Content-Transfer-Encoding: 7bit\r\n\r\n")
          sb.append(partText(docId, sl, j)).append("\r\n")
      }
    }
    sb.append(s"--$boundary--\r\n")
    sb.toString
  }

  private[graft] def payloadFor(docId: Long, text: String): String =
    (docId % 7) match {
      case 0 =>
        val clean = render(docId, text)
        clean.substring(0, clean.length - 6) // close delimiter mangled
      case 3 => render(docId, text, badB64 = true)
      case 5 => render(docId, text, badQp = true)
      case _ => render(docId, text)
    }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("part", IntegerType),
    StructField("encoding", StringType),
    StructField("charset", StringType),
    StructField("text_out", StringType)))

  /** The message as a row source: strict parse + transfer decode +
    * charset transcode, one row per part, damaged docs contribute
    * nothing. */
  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            EmlCodec.parseMessage(payloadFor(id, r.getString(1)))
              .toSeq.flatten.zipWithIndex.map { case ((e, cs, t), j) =>
                Row(id, j, e, cs, t)
              }
          }
        }
      }(enc)
  }
}
