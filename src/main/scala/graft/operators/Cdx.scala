package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The CDX index — the lookup structure every web-archive read path
  * (Common Crawl's cc-index, wayback machines) runs on — plus SURT
  * URL canonicalization and the WARC payload digest, implemented from
  * their public definitions:
  *
  *  - SHA-1 from the spec (FIPS 180: message schedule, the four round
    * functions, length padding) + RFC 4648 Base32 — the
  *    `WARC-Payload-Digest: sha1:B32` convention; spec-pinned against
  *    java.security.MessageDigest on arbitrary inputs;
  *  - SURT (Sort-friendly URI Reordering Transform): lowercase,
  *    scheme dropped, a leading `www\d*.` label stripped, the host
  *    REVERSED comma-joined with the non-default port kept
  *    (`com,example,sub:8443)`), default ports (80/443) dropped, the
  *    fragment dropped, query parameters SORTED with empty and
  *    session parameters (jsessionid & friends) removed — the
  *    canonicalization that makes captures of the same resource
  *    adjacent under a sort;
  *  - CDX-11 lines (` CDX N b a m s k r M S V g` header; urlkey,
  *    14-digit timestamp, original url, mime, status, digest, length,
  *    OFFSET, filename), strictly parsed: field arity, numeric
  *    fields, and the (urlkey, timestamp) SORT ORDER the format
  *    exists to provide (binary search over an unsorted index reads
  *    garbage — disorder quarantines);
  *  - the SERVE path: random access into the WARC shard at the
  *    index's declared (offset, length) — exactly one record must
  *    parse there, its target URI must canonicalize to the urlkey,
  *    its HTTP status must match, and the payload digest must
  *    RECOMPUTE to the index's digest (the d123 lying-table
  *    discipline at the crawl layer: an index entry that lies about
  *    offset or digest quarantines the capture).
  */
object Sha1 {

  /** FIPS 180 SHA-1 over b[from, to). */
  def hash(b: Array[Byte], from: Int, to: Int): Array[Byte] = {
    var h0 = 0x67452301
    var h1 = 0xEFCDAB89
    var h2 = 0x98BADCFE
    var h3 = 0x10325476
    var h4 = 0xC3D2E1F0
    val len = to - from
    val padded = ((len + 8) / 64 + 1) * 64
    val msg = new Array[Byte](padded)
    System.arraycopy(b, from, msg, 0, len)
    msg(len) = 0x80.toByte
    val bits = len.toLong * 8
    var i = 0
    while (i < 8) { msg(padded - 1 - i) = ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
    val w = new Array[Int](80)
    var block = 0
    while (block < padded) {
      var t = 0
      while (t < 16) {
        w(t) = ((msg(block + 4 * t) & 0xff) << 24) |
          ((msg(block + 4 * t + 1) & 0xff) << 16) |
          ((msg(block + 4 * t + 2) & 0xff) << 8) |
          (msg(block + 4 * t + 3) & 0xff)
        t += 1
      }
      while (t < 80) {
        val x = w(t - 3) ^ w(t - 8) ^ w(t - 14) ^ w(t - 16)
        w(t) = (x << 1) | (x >>> 31)
        t += 1
      }
      var a = h0; var bb = h1; var c = h2; var d = h3; var e = h4
      t = 0
      while (t < 80) {
        val (f, k) =
          if (t < 20) ((bb & c) | (~bb & d), 0x5A827999)
          else if (t < 40) (bb ^ c ^ d, 0x6ED9EBA1)
          else if (t < 60) ((bb & c) | (bb & d) | (c & d), 0x8F1BBCDC.toInt)
          else (bb ^ c ^ d, 0xCA62C1D6.toInt)
        val tmp = ((a << 5) | (a >>> 27)) + f + e + k + w(t)
        e = d; d = c; c = (bb << 30) | (bb >>> 2); bb = a; a = tmp
        t += 1
      }
      h0 += a; h1 += bb; h2 += c; h3 += d; h4 += e
      block += 64
    }
    val out = new Array[Byte](20)
    Seq(h0, h1, h2, h3, h4).zipWithIndex.foreach { case (h, j) =>
      out(4 * j) = (h >>> 24).toByte
      out(4 * j + 1) = (h >>> 16).toByte
      out(4 * j + 2) = (h >>> 8).toByte
      out(4 * j + 3) = h.toByte
    }
    out
  }

  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  /** RFC 4648 Base32 (no padding needed: 20 bytes = 32 chars exactly). */
  def base32(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 8 / 5 + 1)
    var acc = 0L
    var nbits = 0
    b.foreach { x =>
      acc = (acc << 8) | (x & 0xff)
      nbits += 8
      while (nbits >= 5) {
        sb.append(B32(((acc >>> (nbits - 5)) & 31).toInt))
        nbits -= 5
      }
    }
    if (nbits > 0) sb.append(B32(((acc << (5 - nbits)) & 31).toInt))
    sb.toString
  }

  /** The WARC convention: `sha1:` + Base32 of the SHA-1. */
  def warcDigest(b: Array[Byte], from: Int, to: Int): String =
    "sha1:" + base32(hash(b, from, to))
}

object Surt {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private val SESSION_PARAMS = Set(
    "jsessionid", "phpsessid", "sid", "sessionid", "cfid", "cftoken",
    "aspsessionid")

  /** Canonicalize a URL to its SURT form. Strict: a missing scheme,
    * an empty host or a non-numeric port quarantine — an index keyed
    * on guessed canonicalizations stops being an index. */
  def canonicalize(url0: String): String = {
    val url = url0.trim.toLowerCase
    val schemeEnd = url.indexOf("://")
    if (schemeEnd <= 0) throw Malformed
    val scheme = url.substring(0, schemeEnd)
    if (scheme != "http" && scheme != "https") throw Malformed
    var rest = url.substring(schemeEnd + 3)
    // fragment dropped
    val hashAt = rest.indexOf('#')
    if (hashAt >= 0) rest = rest.substring(0, hashAt)
    val pathAt = rest.indexOf('/')
    val authority = if (pathAt < 0) rest else rest.substring(0, pathAt)
    var pathQuery = if (pathAt < 0) "/" else rest.substring(pathAt)
    val (host0, port) = authority.indexOf(':') match {
      case -1 => (authority, -1)
      case i =>
        val p = authority.substring(i + 1)
        if (p.isEmpty || !p.forall(_.isDigit) || p.length > 5) throw Malformed
        (authority.substring(0, i), p.toInt)
    }
    if (host0.isEmpty || host0.startsWith(".") || host0.endsWith(".") ||
        host0.contains("..")) throw Malformed
    // a leading www/www2/... label is navigational noise, not identity
    val host = host0.replaceFirst("^www\\d*\\.", "")
    if (host.isEmpty) throw Malformed
    val defaultPort = if (scheme == "http") 80 else 443
    val portSuffix = if (port < 0 || port == defaultPort) "" else s":$port"
    // query: sorted params, empties and session ids dropped
    val qAt = pathQuery.indexOf('?')
    if (qAt >= 0) {
      val path = pathQuery.substring(0, qAt)
      val params = pathQuery.substring(qAt + 1).split("&", -1).toSeq
        .filter(_.nonEmpty)
        .filterNot { p =>
          val k = p.indexOf('=') match {
            case -1 => p
            case i => p.substring(0, i)
          }
          SESSION_PARAMS(k)
        }
        .sorted
      pathQuery = if (params.isEmpty) path else path + "?" + params.mkString("&")
    }
    host.split('.').reverse.mkString(",") + portSuffix + ")" + pathQuery
  }
}

object CdxCodec {
  import Surt.Malformed

  final case class CdxEntry(urlkey: String, timestamp: String, url: String,
      mime: String, status: Int, digest: String, length: Long, offset: Long,
      filename: String)

  private val HEADER = " CDX N b a m s k r M S V g"

  /** Render a CDX-11 file: the header line, then one line per entry
    * in (urlkey, timestamp) order — the sort IS the format's point. */
  def render(entries: Seq[CdxEntry]): String = {
    val sb = new java.lang.StringBuilder(entries.size * 80 + 32)
    sb.append(HEADER).append('\n')
    entries.sortBy(e => (e.urlkey, e.timestamp)).foreach { e =>
      sb.append(e.urlkey).append(' ').append(e.timestamp).append(' ')
        .append(e.url).append(' ').append(e.mime).append(' ')
        .append(e.status).append(' ').append(e.digest).append(" - - ")
        .append(e.length).append(' ').append(e.offset).append(' ')
        .append(e.filename).append('\n')
    }
    sb.toString
  }

  /** Strict parse: header line, 11 fields per line, numeric status/
    * length/offset, 14-digit timestamps, and (urlkey, timestamp)
    * ORDER — an unsorted index quarantines. */
  def parse(cdx: String): Seq[CdxEntry] = {
    val lines = cdx.split("\n", -1).toSeq
    if (lines.isEmpty || lines.head != HEADER) throw Malformed
    if (lines.last.nonEmpty) throw Malformed // must end with a newline
    val entries = lines.tail.init.map { line =>
      val f = line.split(" ", -1)
      if (f.length != 11) throw Malformed
      if (f(1).length != 14 || !f(1).forall(_.isDigit)) throw Malformed
      if (!f(4).forall(_.isDigit) || !f(8).forall(_.isDigit) ||
          !f(9).forall(_.isDigit)) throw Malformed
      if (f(6) != "-" || f(7) != "-") throw Malformed // redirect/meta unused
      CdxEntry(f(0), f(1), f(2), f(3), f(4).toInt, f(5),
        f(8).toLong, f(9).toLong, f(10))
    }
    entries.sliding(2).foreach {
      case Seq(a, b) =>
        if ((a.urlkey + " " + a.timestamp) > (b.urlkey + " " + b.timestamp))
          throw Malformed
      case _ => ()
    }
    entries
  }

  /** The SERVE path: random access at the entry's declared (offset,
    * length) — exactly one WARC response record must parse there, its
    * URI must canonicalize to the urlkey, the status must match, and
    * the payload digest must recompute to the entry's digest. Returns
    * the payload body. */
  def serve(shard: Array[Byte], e: CdxEntry): Array[Byte] = {
    if (e.offset < 0 || e.length <= 0 ||
        e.offset + e.length > shard.length) throw Malformed
    val slice = java.util.Arrays.copyOfRange(
      shard, e.offset.toInt, (e.offset + e.length).toInt)
    val recs = WarcCodec.decode(slice).getOrElse(throw Malformed)
    if (recs.length != 1) throw Malformed
    val rec = recs.head
    if (rec.warcType != "response") throw Malformed
    val uri = rec.headers.getOrElse("warc-target-uri", throw Malformed)
    if (Surt.canonicalize(uri) != e.urlkey) throw Malformed
    val (status, body) =
      WarcCodec.parseHttpResponse(rec.block).getOrElse(throw Malformed)
    if (status != e.status) throw Malformed
    if (Sha1.warcDigest(body, 0, body.length) != e.digest) throw Malformed
    body
  }
}

/** In-plan synthesizer + gate for d136 — the crawl INDEX: each doc's
  * text becomes a K-capture WARC shard whose URLs exercise every SURT
  * rule (uppercase + www hosts, default and non-default ports,
  * unsorted queries, session params, fragments), a CDX-11 index built
  * at WRITE time (offsets exact by construction, digests = our
  * from-scratch SHA-1), and the gate SERVES every entry by random
  * access — parse at the declared offset, canonicalize, digest-verify.
  * Damage %7: shard truncation / a LYING OFFSET on one entry (every
  * byte of the shard intact — the record parse at the wrong offset
  * catches it) / a LYING DIGEST (offset, record and content all fine —
  * only the recompute catches it). Damaged docs contribute nothing. */
object CdxSim {

  private[graft] def nCaptures(docId: Long): Int = (2 + docId % 4).toInt

  private[graft] def urlFor(docId: Long, i: Int): String = {
    val d = docId % 10
    ((docId + i) % 5) match {
      case 0 => s"http://WWW.Example$d.COM/Doc/$i"
      case 1 => s"http://example$d.com:80/doc/$i?b=2&a=1"
      case 2 => s"https://sub.example$d.com:8443/doc/$i"
      case 3 => s"http://example$d.com/doc/$i?jsessionid=ABC123&z=9&"
      case _ => s"http://example$d.com/doc/$i#frag"
    }
  }

  /** The closed-form SURT the oracle replays as a CASE. */
  private[graft] def surtFor(docId: Long, i: Int): String = {
    val d = docId % 10
    ((docId + i) % 5) match {
      case 0 => s"com,example$d)/doc/$i"
      case 1 => s"com,example$d)/doc/$i?a=1&b=2"
      case 2 => s"com,example$d,sub:8443)/doc/$i"
      case 3 => s"com,example$d)/doc/$i?z=9"
      case _ => s"com,example$d)/doc/$i"
    }
  }

  private[graft] def tsFor(i: Int): String = f"2026010100${i}%02d00"

  private[graft] def slices(docId: Long, text: String): Seq[String] = {
    val k = nCaptures(docId)
    val cps = text.codePointCount(0, text.length)
    (0 until k).map { i =>
      val a = text.offsetByCodePoints(0, (i.toLong * cps / k).toInt)
      val b = text.offsetByCodePoints(0, ((i + 1).toLong * cps / k).toInt)
      text.substring(a, b)
    }
  }

  /** Build (shard, cdx) with exact offsets; apply the damage slice. */
  private[graft] def payloadFor(docId: Long, text: String): (Array[Byte], String) = {
    val k = nCaptures(docId)
    val sl = slices(docId, text)
    val date = "2026-01-01T00:00:00Z"
    val parts = Seq.newBuilder[Array[Byte]]
    val entries = Seq.newBuilder[CdxCodec.CdxEntry]
    // one gzip MEMBER per record — the crawl layout that makes the
    // CDX's (offset, length) a valid random-access handle at all
    val info = GzipCodec.gzipMember(WarcCodec.renderRecord(
      Seq("WARC-Type" -> "warcinfo",
        "WARC-Record-ID" -> f"<urn:uuid:00000000-0000-4000-9000-${docId * 8 + 7}%012d>",
        "WARC-Date" -> date, "Content-Type" -> "application/warc-fields"),
      "software: graft-cdx/1.0\r\n".getBytes("US-ASCII")))
    parts += info
    var offset = info.length.toLong
    (0 until k).foreach { i =>
      val rid = f"<urn:uuid:00000000-0000-4000-9000-${docId * 8 + i}%012d>"
      val req = GzipCodec.gzipMember(WarcCodec.renderRecord(
        Seq("WARC-Type" -> "request", "WARC-Record-ID" -> rid,
          "WARC-Date" -> date, "WARC-Target-URI" -> urlFor(docId, i),
          "Content-Type" -> "application/http; msgtype=request"),
        s"GET /doc/$i HTTP/1.1\r\nHost: x\r\n\r\n".getBytes("US-ASCII")))
      parts += req
      offset += req.length
      val body = sl(i).getBytes("UTF-8")
      val head = ("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/plain; charset=utf-8\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
      val msg = head ++ body
      val resp = GzipCodec.gzipMember(WarcCodec.renderRecord(
        Seq("WARC-Type" -> "response", "WARC-Record-ID" -> rid,
          "WARC-Date" -> date, "WARC-Target-URI" -> urlFor(docId, i),
          "Content-Type" -> "application/http; msgtype=response"),
        msg))
      parts += resp
      entries += CdxCodec.CdxEntry(
        urlkey = surtFor(docId, i), timestamp = tsFor(i),
        url = urlFor(docId, i), mime = "text/plain", status = 200,
        digest = Sha1.warcDigest(body, 0, body.length),
        length = resp.length.toLong, offset = offset,
        filename = s"shard-$docId.warc")
      offset += resp.length
    }
    val shard = parts.result().reduce(_ ++ _)
    val clean = entries.result()
    (docId % 7) match {
      case 0 =>
        (java.util.Arrays.copyOf(shard, shard.length - 9),
          CdxCodec.render(clean))
      case 3 =>
        val lied = clean.zipWithIndex.map { case (e, j) =>
          if (j == 0) e.copy(offset = e.offset + 3) else e
        }
        (shard, CdxCodec.render(lied))
      case 5 =>
        val lied = clean.zipWithIndex.map { case (e, j) =>
          if (j == 0) {
            val c = e.digest.last
            val alt = if (c == 'A') 'B' else 'A'
            e.copy(digest = e.digest.init + alt)
          } else e
        }
        (shard, CdxCodec.render(lied))
      case _ => (shard, CdxCodec.render(clean))
    }
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("capture", IntegerType),
    StructField("urlkey", StringType),
    StructField("ts", StringType),
    StructField("status", IntegerType),
    StructField("n_bytes", LongType)))

  /** The gate: parse the index, SERVE every entry by random access
    * (offset parse + SURT + digest recompute), one row per verified
    * capture in index order. Any entry failing verification
    * quarantines the whole doc (an index you cannot trust end to end
    * is not an index — the d111 rule). */
  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            val served =
              try {
                val (shard, cdx) = payloadFor(id, text)
                val entries = CdxCodec.parse(cdx)
                Some(entries.map { e =>
                  val body = CdxCodec.serve(shard, e)
                  (e, body.length.toLong)
                })
              } catch { case _: Throwable => None }
            served.toSeq.flatten.zipWithIndex.map { case ((e, n), j) =>
              Row(id, j, e.urlkey, e.timestamp, e.status, n)
            }
          }
        }
      }(enc)
  }
}
