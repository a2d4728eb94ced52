package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Charset sniffing + strict transcode for the d128 gate — the
  * pre-d91 ingest stage: raw crawl bytes arrive in an UNKNOWN charset
  * and must become UTF-8 before any text operator runs. Detection
  * order (the WHATWG-ish precedence real ingest uses): BOM (UTF-8 /
  * UTF-16LE / UTF-16BE) → `<meta charset="...">` sniffed from the
  * first 1024 bytes → the transport's Content-Type charset parameter
  * → strict UTF-8 validation as the last resort. NO lenient
  * fallback: undecodable bytes under the detected charset QUARANTINE
  * (a training corpus wants certainty, not U+FFFD soup — the d91
  * repair stage exists for declared-and-valid-but-mangled text, not
  * for guessing).
  *
  * Every decoder is implemented here from the published tables — no
  * java.nio.charset involved: a strict UTF-8 validator (overlongs,
  * surrogates, > U+10FFFF, truncated sequences all rejected), strict
  * UTF-16 with surrogate PAIRING (lone surrogates rejected), the
  * windows-1252 0x80-0x9F table with its FIVE holes (0x81 0x8D 0x8F
  * 0x90 0x9D are unmapped — the JDK's decoder passes them through as
  * C1 controls; ours rejects, which is what makes the cp1252 damage
  * class catchable at all), ISO-8859-1 (byte = codepoint), US-ASCII.
  *
  * The oracle replays the transcode via literal byte-pair tables (the
  * d91/d94 MOJIBAKE_PAIRS pattern): the sim plants 'e' → a
  * charset-DISTINGUISHING character ('€' is 0x80 in cp1252 and
  * unmapped in latin-1; 'é' is 0xE9 in both latin-1 and cp1252; 'π'
  * needs real UTF-8/UTF-16), so a hash match proves the right table
  * was used, not just that something decoded.
  */
object CharsetSniff {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** windows-1252, 0x80-0x9F (the published table; -1 = unmapped). */
  private val CP1252_HIGH: Array[Int] = Array(
    0x20AC, -1, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, -1, 0x017D, -1,
    -1, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, -1, 0x017E, 0x0178)

  /** Strict UTF-8 decode of b[from, to): overlongs, surrogates,
    * > U+10FFFF, bad continuations and truncation all throw. */
  private[graft] def decodeUtf8(b: Array[Byte], from: Int, to: Int): String = {
    val sb = new java.lang.StringBuilder(to - from)
    var i = from
    while (i < to) {
      val b0 = b(i) & 0xFF
      if (b0 < 0x80) { sb.append(b0.toChar); i += 1 }
      else {
        val (n, min, init) =
          if ((b0 & 0xE0) == 0xC0) (1, 0x80, b0 & 0x1F)
          else if ((b0 & 0xF0) == 0xE0) (2, 0x800, b0 & 0x0F)
          else if ((b0 & 0xF8) == 0xF0) (3, 0x10000, b0 & 0x07)
          else throw Malformed // continuation or 0xF8+ lead
        if (i + n > to - 1) throw Malformed // truncated sequence
        var cp = init
        var k = 1
        while (k <= n) {
          val bc = b(i + k) & 0xFF
          if ((bc & 0xC0) != 0x80) throw Malformed
          cp = (cp << 6) | (bc & 0x3F)
          k += 1
        }
        if (cp < min) throw Malformed // overlong
        if (cp >= 0xD800 && cp <= 0xDFFF) throw Malformed // surrogate
        if (cp > 0x10FFFF) throw Malformed
        sb.appendCodePoint(cp)
        i += n + 1
      }
    }
    sb.toString
  }

  /** True iff b[from, to) is valid strict UTF-8. */
  private[graft] def isUtf8(b: Array[Byte], from: Int, to: Int): Boolean =
    try { decodeUtf8(b, from, to); true } catch { case Malformed => false }

  /** Strict UTF-16 decode (le/be): odd lengths and LONE surrogates
    * throw; pairs combine. */
  private[graft] def decodeUtf16(b: Array[Byte], from: Int, to: Int,
                                 le: Boolean): String = {
    if (((to - from) & 1) != 0) throw Malformed
    val sb = new java.lang.StringBuilder((to - from) / 2)
    var i = from
    def u16(p: Int): Int =
      if (le) (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
      else ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)
    while (i < to) {
      val c = u16(i)
      if (c >= 0xD800 && c <= 0xDBFF) { // high surrogate: needs its pair
        if (i + 4 > to) throw Malformed
        val lo = u16(i + 2)
        if (lo < 0xDC00 || lo > 0xDFFF) throw Malformed
        sb.append(c.toChar).append(lo.toChar)
        i += 4
      } else if (c >= 0xDC00 && c <= 0xDFFF) throw Malformed // lone low
      else { sb.append(c.toChar); i += 2 }
    }
    sb.toString
  }

  /** Strict windows-1252 via the published table: the five unmapped
    * bytes (0x81 0x8D 0x8F 0x90 0x9D) throw. */
  private[graft] def decodeCp1252(b: Array[Byte], from: Int, to: Int): String = {
    val sb = new java.lang.StringBuilder(to - from)
    var i = from
    while (i < to) {
      val v = b(i) & 0xFF
      if (v < 0x80) sb.append(v.toChar)
      else if (v < 0xA0) {
        val m = CP1252_HIGH(v - 0x80)
        if (m < 0) throw Malformed
        sb.append(m.toChar)
      } else sb.append(v.toChar) // 0xA0-0xFF: same as latin-1
      i += 1
    }
    sb.toString
  }

  private[graft] def decodeLatin1(b: Array[Byte], from: Int, to: Int): String = {
    val sb = new java.lang.StringBuilder(to - from)
    var i = from
    while (i < to) { sb.append((b(i) & 0xFF).toChar); i += 1 }
    sb.toString
  }

  private[graft] def decodeAscii(b: Array[Byte], from: Int, to: Int): String = {
    val sb = new java.lang.StringBuilder(to - from)
    var i = from
    while (i < to) {
      val v = b(i) & 0xFF
      if (v >= 0x80) throw Malformed
      sb.append(v.toChar)
      i += 1
    }
    sb.toString
  }

  private val META_RE =
    """<meta\s+charset\s*=\s*"([a-z0-9\-]+)"\s*/?>""".r

  /** Sniff + strict transcode. Returns (charset, detection, decoded
    * UTF-16 string); None when no charset can be established or the
    * established one cannot decode the bytes (the quarantine verdict
    * — never a lenient guess). */
  private[graft] def sniffTranscode(
      b: Array[Byte],
      httpCharset: Option[String]): Option[(String, String, String)] =
    try {
      // 1. BOM
      if (b.length >= 3 && (b(0) & 0xFF) == 0xEF && (b(1) & 0xFF) == 0xBB &&
          (b(2) & 0xFF) == 0xBF)
        return Some(("utf-8", "bom", decodeUtf8(b, 3, b.length)))
      if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xFE)
        return Some(("utf-16le", "bom", decodeUtf16(b, 2, b.length, le = true)))
      if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
        return Some(("utf-16be", "bom", decodeUtf16(b, 2, b.length, le = false)))
      // 2. <meta charset="..."> in the first 1024 bytes (ASCII view —
      //    every supported charset is ASCII-transparent there)
      val head = {
        val n = math.min(1024, b.length)
        val sb = new java.lang.StringBuilder(n)
        var i = 0
        while (i < n) {
          val v = b(i) & 0xFF
          sb.append(if ((v >= 0x20 && v <= 0x7E) ||
            v == '\n' || v == '\r' || v == '\t') v.toChar else '?')
          i += 1
        }
        sb.toString.toLowerCase(java.util.Locale.ROOT)
      }
      val declared = META_RE.findFirstMatchIn(head).map(_.group(1))
        .map(cs => (cs, "meta"))
        .orElse(httpCharset.map(cs =>
          (cs.toLowerCase(java.util.Locale.ROOT), "header")))
      declared match {
        case Some((cs, how)) =>
          val decoded = cs match {
            case "utf-8" => decodeUtf8(b, 0, b.length)
            case "windows-1252" => decodeCp1252(b, 0, b.length)
            case "iso-8859-1" | "latin-1" => decodeLatin1(b, 0, b.length)
            case "us-ascii" | "ascii" => decodeAscii(b, 0, b.length)
            case "utf-16le" => decodeUtf16(b, 0, b.length, le = true)
            case "utf-16be" => decodeUtf16(b, 0, b.length, le = false)
            case _ => throw Malformed // unknown declaration
          }
          Some((if (cs == "latin-1") "iso-8859-1"
            else if (cs == "ascii") "us-ascii" else cs, how, decoded))
        case None =>
          // 3. last resort: strict UTF-8 validation, never a guess
          Some(("utf-8", "sniff", decodeUtf8(b, 0, b.length)))
      }
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
}

/** In-plan synthesizer + gate for d128 — the d91/d94 closed-form
  * discipline applied to the byte layer: the corpus text is
  * ASCII-sanitized, a charset-DISTINGUISHING character is planted
  * ('e' → 'π'/'€'/'é' depending on the variant), and the result is
  * encoded through one of five real ingest shapes (doc_id%5): UTF-8
  * with BOM, UTF-16LE with BOM, windows-1252 declared by an in-content
  * `<meta charset>`, ISO-8859-1 declared by the transport header, and
  * bare UTF-8 detected by strict validation. The oracle replays the
  * whole transcode as literal replaces, so a hash match proves the
  * right byte table ran — '€' is 0x80 in cp1252 and UNMAPPED in
  * latin-1, so a decoder that guessed wrong cannot pass.
  *
  * Damage slice on doc_id%7 (all per-variant undecodable-byte
  * classes): 0 → a truncated multibyte tail (lone UTF-8 lead 0xC3 /
  * an odd UTF-16 cut / a cp1252 hole 0x81 / latin-1 bytes re-declared
  * as UTF-8); 3 → an invalid byte mid-stream (0xFF, never legal in
  * UTF-8 / a lone HIGH surrogate / hole 0x8D / re-declared US-ASCII);
  * 5 → a lying declaration (0xFF under a UTF-8 BOM / a lone LOW
  * surrogate / hole 0x90 / latin-1 re-declared UTF-8). */
object CharsetSim {

  private[graft] def sanitize(text: String): String =
    text.replaceAll("[^ -~]", "").replace('<', ' ')

  private val META = "<meta charset=\"windows-1252\">"

  private[graft] def utf8Encode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length + 16)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 0x80) out.write(cp)
      else if (cp < 0x800) {
        out.write(0xC0 | (cp >> 6)); out.write(0x80 | (cp & 0x3F))
      } else if (cp < 0x10000) {
        out.write(0xE0 | (cp >> 12)); out.write(0x80 | ((cp >> 6) & 0x3F))
        out.write(0x80 | (cp & 0x3F))
      } else {
        out.write(0xF0 | (cp >> 18)); out.write(0x80 | ((cp >> 12) & 0x3F))
        out.write(0x80 | ((cp >> 6) & 0x3F)); out.write(0x80 | (cp & 0x3F))
      }
      i += Character.charCount(cp)
    }
    out.toByteArray
  }

  private[graft] def utf16leEncode(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length * 2)
    var i = 0
    while (i < s.length) {
      out(2 * i) = (s(i) & 0xFF).toByte
      out(2 * i + 1) = ((s(i) >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }

  private[graft] def cp1252Encode(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i).toInt
      out(i) = (if (c < 0x80 || (c >= 0xA0 && c <= 0xFF)) c
        else c match { // reverse of the published high table (gate chars)
          case 0x20AC => 0x80
          case 0x2018 => 0x91
          case 0x2019 => 0x92
          case 0x201C => 0x93
          case 0x201D => 0x94
          case _ => throw CharsetSniff.Malformed
        }).toByte
      i += 1
    }
    out
  }

  private[graft] def latin1Encode(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) { out(i) = (s(i) & 0xFF).toByte; i += 1 }
    out
  }

  /** (payload bytes, Content-Type charset param if the transport
    * carries one). */
  private[graft] def payloadFor(docId: Long, text: String): (Array[Byte], Option[String]) = {
    val base = sanitize(text)
    val v = (docId % 5).toInt
    val bom8 = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    val bomLe = Array(0xFF.toByte, 0xFE.toByte)
    val (clean, hdr) = v match {
      case 0 => (bom8 ++ utf8Encode(base.replace('e', 'π')), None)
      case 1 => (bomLe ++ utf16leEncode(base.replace('e', 'π')), None)
      case 2 => (cp1252Encode(META + "\n" + base.replace('e', '€')), None)
      case 3 => (latin1Encode(base.replace('e', 'é')), Some("ISO-8859-1"))
      case _ => (utf8Encode(base.replace('e', 'π')), None)
    }
    def insertAt(b: Array[Byte], pos: Int, v: Byte): Array[Byte] = {
      val out = new Array[Byte](b.length + 1)
      System.arraycopy(b, 0, out, 0, pos)
      out(pos) = v
      System.arraycopy(b, pos, out, pos + 1, b.length - pos)
      out
    }
    (docId % 7) match {
      case 0 => v match {
        case 0 | 4 => (clean :+ 0xC3.toByte, hdr) // truncated multibyte
        case 1 => (java.util.Arrays.copyOf(clean, clean.length - 1), hdr) // odd cut
        case 2 => (clean :+ 0x81.toByte, hdr) // cp1252 hole
        case _ => (clean :+ 0xE9.toByte, Some("UTF-8")) // latin-1 re-declared
      }
      case 3 => v match {
        case 0 | 4 => (insertAt(clean, clean.length / 2, 0xFF.toByte), hdr)
        case 1 => (clean ++ Array(0x00.toByte, 0xD8.toByte), hdr) // lone HIGH surrogate
        case 2 => (clean :+ 0x8D.toByte, hdr)
        case _ => (clean :+ 0xE9.toByte, Some("US-ASCII"))
      }
      case 5 => v match {
        case 0 | 4 => (insertAt(clean, clean.length / 3, 0xFF.toByte), hdr)
        case 1 => (clean ++ Array(0x00.toByte, 0xDC.toByte), hdr) // lone LOW surrogate
        case 2 => (clean :+ 0x90.toByte, hdr)
        case _ => (clean :+ 0xE9.toByte, Some("UTF-8"))
      }
      case _ => (clean, hdr)
    }
  }

  private[graft] def plantedChar(docId: Long): Char = (docId % 5) match {
    case 2 => '€'
    case 3 => 'é'
    case _ => 'π'
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("charset", StringType),
    StructField("detection", StringType),
    StructField("text_out", StringType),
    StructField("n_planted", LongType)))

  /** Batched sniff + strict transcode → per-doc stats with the FULL
    * decoded text as a column (the oracle hash-pins every character)
    * plus the planted-character count. Map-only. */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val (bytes, hdr) = payloadFor(id, r.getString(1))
            CharsetSniff.sniffTranscode(bytes, hdr) match {
              case Some((cs, how, decoded)) =>
                val pc = plantedChar(id)
                var n = 0L
                var j = 0
                while (j < decoded.length) {
                  if (decoded(j) == pc) n += 1
                  j += 1
                }
                Row(id, "ok", cs, how, decoded, n)
              case None =>
                Row(id, "quarantined", null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
