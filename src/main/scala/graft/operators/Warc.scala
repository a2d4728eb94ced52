package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC/1.0 (ISO 28500) reader for the d108 gate — the container web
  * crawls actually ship in: a `.warc.gz` file is a sequence of gzip
  * MEMBERS, one WARC record per member (the layout crawl archives use
  * so a reader can seek to a record and inflate just it). The gzip
  * layer is [[GzipCodec]] (d106 — framing, FHCRC, CRC-32 + ISIZE all
  * verified per member); this file owns the WARC grammar on top:
  *
  *   WARC/1.0 CRLF · named-field lines CRLF · CRLF · block · CRLF CRLF
  *
  * with `Content-Length` giving the exact block size in octets and
  * field NAMES case-insensitive (the spec's grammar; values are not).
  * Response records carry an HTTP/1.1 message as their block — status
  * line, headers, CRLF CRLF, body — and when the HTTP headers declare
  * their own Content-Length it must match the body exactly (a crawl
  * writer that disagrees with itself is corrupt, not sloppy).
  *
  * Scope (the d98 discipline): WARC/1.0, one record per member,
  * blocks under 1 GiB, no header-line folding (legal in the grammar,
  * absent from crawl writers) — anything else QUARANTINES rather than
  * crashes. Unknown WARC-Types pass through as opaque records; the
  * gate's shard shape (warcinfo + request + response) only constrains
  * what [[WarcSim.stats]] reports, not what the parser accepts.
  *
  * Reference anchor: same constructor∘decoder discipline as the
  * d89-d107 gates (SURVEY §2.5). The gzip layer is pinned against
  * `gzip` and the JDK independently (d106); the WARC text grammar is
  * pinned against a HAND-WRITTEN raw fixture in
  * MediaDecodePropertySpec (a literal byte string, not this file's
  * encoder) so encoder∘decoder compensating bugs can't hide.
  */
object WarcCodec {

  private val MAX_BLOCK = 1L << 30

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** One parsed record: type, the (lowercased-name → value) header
    * map, and the raw block bytes. */
  private[graft] final case class WarcRec(
      warcType: String,
      headers: Map[String, String],
      block: Array[Byte])

  private val CRLF = "\r\n".getBytes("US-ASCII")

  /** Render one record (version line, fields in the given order,
    * block, record trailer) — UNCOMPRESSED. `lenDelta` skews the
    * declared Content-Length (the d108 damage-5 constructor); 0 for
    * conformant output. */
  private[graft] def renderRecord(fields: Seq[(String, String)],
                                  block: Array[Byte],
                                  lenDelta: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(block.length + 256)
    out.write("WARC/1.0\r\n".getBytes("US-ASCII"))
    fields.foreach { case (k, v) =>
      out.write(s"$k: $v\r\n".getBytes("US-ASCII"))
    }
    out.write(s"Content-Length: ${block.length + lenDelta}\r\n".getBytes("US-ASCII"))
    out.write(CRLF)
    out.write(block, 0, block.length)
    out.write(CRLF); out.write(CRLF)
    out.toByteArray
  }

  /** Encode records as the crawl layout: one gzip member each,
    * concatenated. */
  private[graft] def encode(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val g = GzipCodec.gzipMember(r)
      out.write(g, 0, g.length)
    }
    out.toByteArray
  }

  /** Find the next CRLF at/after `from`; Malformed if the line runs
    * past the buffer or contains a bare CR/LF (strict grammar). */
  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length) {
      if (b(i) == '\r') {
        if (i + 1 >= b.length || b(i + 1) != '\n') throw Malformed
        return i
      }
      if (b(i) == '\n') throw Malformed // LF without CR
      i += 1
    }
    throw Malformed // no terminator
  }

  /** Parse one named-field block starting at `pos`: lines until the
    * empty CRLF line. Returns (lowercased-name → value, posAfterBlank).
    * Duplicate names and folded continuation lines quarantine (out of
    * scope — crawl writers emit neither). */
  private def parseFields(b: Array[Byte], pos0: Int): (Map[String, String], Int) = {
    var pos = pos0
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var done = false
    while (!done) {
      val e = lineEnd(b, pos)
      if (e == pos) { done = true; pos += 2 }
      else {
        val line = new String(b, pos, e - pos, "US-ASCII")
        if (line(0) == ' ' || line(0) == '\t') throw Malformed // folding: out of scope
        val c = line.indexOf(':')
        if (c <= 0) throw Malformed
        val name = line.substring(0, c)
        if (name.exists(ch => ch <= ' ' || ch >= 127)) throw Malformed
        val key = name.toLowerCase(java.util.Locale.ROOT)
        if (m.contains(key)) throw Malformed
        m(key) = line.substring(c + 1).trim
        pos = e + 2
      }
    }
    (m.toMap, pos)
  }

  private def parseLen(s: String): Long = {
    if (s.isEmpty || s.length > 12 || !s.forall(c => c >= '0' && c <= '9'))
      throw Malformed
    s.toLong
  }

  /** Parse one member as exactly one WARC/1.0 record; trailing bytes
    * after the record trailer quarantine (one record per member IS
    * the crawl layout this gate reads). */
  private def parseRecord(b: Array[Byte]): WarcRec = {
    val e0 = lineEnd(b, 0)
    if (new String(b, 0, e0, "US-ASCII") != "WARC/1.0") throw Malformed
    val (hdrs, blockStart) = parseFields(b, e0 + 2)
    val wtype = hdrs.getOrElse("warc-type", throw Malformed)
    if (!hdrs.contains("warc-record-id") || !hdrs.contains("warc-date"))
      throw Malformed
    val len = parseLen(hdrs.getOrElse("content-length", throw Malformed))
    if (len > MAX_BLOCK || blockStart + len + 4 != b.length) throw Malformed
    val bs = blockStart.toLong
    // record trailer: exactly CRLF CRLF then member end
    val t = (bs + len).toInt
    if (b(t) != '\r' || b(t + 1) != '\n' || b(t + 2) != '\r' || b(t + 3) != '\n')
      throw Malformed
    if (wtype.isEmpty || !wtype.forall(c => c > ' ' && c < 127)) throw Malformed
    WarcRec(wtype, hdrs, java.util.Arrays.copyOfRange(b, blockStart, t))
  }

  /** STRICT decode of a `.warc.gz` stream → records, or None for
    * anything malformed at either layer (gzip framing/integrity, WARC
    * grammar, block length vs member size, missing mandatory fields,
    * HTTP self-disagreement is caught later in [[parseHttpResponse]]). */
  private[graft] def decode(b: Array[Byte]): Option[Seq[WarcRec]] =
    try {
      GzipCodec.decode(b) match {
        case None => None
        case Some(members) =>
          if (members.isEmpty) None
          else Some(members.map(parseRecord))
      }
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  /** Parse a response record's HTTP/1.1 message block → (status code,
    * body bytes). Strict: `HTTP/1.1 SP 3-digits SP reason`, named
    * headers, CRLF CRLF, body = the rest; an HTTP Content-Length that
    * disagrees with the actual body quarantines; chunked transfer is
    * out of scope. */
  private[graft] def parseHttpResponse(block: Array[Byte]): Option[(Int, Array[Byte])] =
    parseHttpMessage(block).map(m => (m._1, m._2))

  /** Full HTTP/1.1 response parse for d127 — real Common-Crawl bodies
    * ship `Transfer-Encoding: chunked` and `Content-Encoding: gzip`.
    * Returns (status, DECODED body, wire chunk count — -1 when the
    * framing was identity, gzip flag). Strict grammar: the chunk-size
    * hex line (optional `;ext`), per-chunk CRLFs, the 0-size
    * terminator, trailer headers, the final CRLF; a LYING chunk size
    * (overrunning the block) quarantines — the framing field the
    * grammar exists for; Content-Length ALONGSIDE chunked quarantines
    * (the request-smuggling classic a strict parser must reject);
    * unknown transfer/content codings quarantine; a gzip body must be
    * exactly one valid member (d106's walker verifies its CRC/ISIZE). */
  private[graft] def parseHttpMessage(
      block: Array[Byte]): Option[(Int, Array[Byte], Int, Boolean)] =
    try {
      val e0 = lineEnd(block, 0)
      val sl = new String(block, 0, e0, "US-ASCII")
      if (!sl.startsWith("HTTP/1.1 ") || sl.length < 12) throw Malformed
      val code = sl.substring(9, 12)
      if (!code.forall(c => c >= '0' && c <= '9')) throw Malformed
      if (sl.length > 12 && sl(12) != ' ') throw Malformed
      val (hdrs, bodyStart) = parseFields(block, e0 + 2)
      val te = hdrs.get("transfer-encoding")
      val (wire, nChunks) = te match {
        case Some(v) =>
          if (v.trim.toLowerCase != "chunked") throw Malformed
          if (hdrs.contains("content-length")) throw Malformed // CL+TE
          deChunk(block, bodyStart)
        case None =>
          val body = java.util.Arrays.copyOfRange(block, bodyStart, block.length)
          hdrs.get("content-length").foreach { cl =>
            if (parseLen(cl) != body.length.toLong) throw Malformed
          }
          (body, -1)
      }
      val (decoded, gz) = hdrs.get("content-encoding") match {
        case None => (wire, false)
        case Some(ce) if ce.trim.toLowerCase == "identity" => (wire, false)
        case Some(ce) if ce.trim.toLowerCase == "gzip" =>
          GzipCodec.decode(wire) match {
            case Some(members) if members.length == 1 => (members.head, true)
            case _ => throw Malformed
          }
        case _ => throw Malformed
      }
      Some((code.toInt, decoded, nChunks, gz))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  /** Strict chunked-transfer decode from `pos` to the block's end:
    * returns (de-chunked bytes, data chunk count). The block must be
    * consumed EXACTLY (trailing garbage after the final CRLF is
    * corruption). */
  private def deChunk(block: Array[Byte], pos0: Int): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream(block.length - pos0)
    var pos = pos0
    var n = 0
    var done = false
    while (!done) {
      val e = lineEnd(block, pos)
      val line = new String(block, pos, e - pos, "US-ASCII")
      val semi = line.indexOf(';')
      val hexs = if (semi >= 0) line.substring(0, semi) else line
      if (hexs.isEmpty || !hexs.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
          (c >= 'A' && c <= 'F'))) throw Malformed
      if (hexs.length > 8) throw Malformed // > 4 GiB chunk: a lie
      val size = java.lang.Long.parseLong(hexs, 16)
      pos = e + 2
      if (size == 0) done = true
      else {
        if (pos + size + 2 > block.length) throw Malformed // lying size
        out.write(block, pos, size.toInt)
        pos += size.toInt
        if (block(pos) != '\r' || block(pos + 1) != '\n') throw Malformed
        pos += 2
        n += 1
      }
    }
    // trailer section: header lines until the empty line
    val (_, after) = parseFields(block, pos)
    if (after != block.length) throw Malformed // trailing garbage
    (out.toByteArray, n)
  }

  /** Chunked-transfer encode: cut `body` every `cut` bytes; optional
    * trailer header after the 0 chunk (the grammar's rarest corner). */
  private[graft] def chunkBody(body: Array[Byte], cut: Int,
                               trailer: Option[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + 64)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, s.length)
    var p = 0
    while (p < body.length) {
      val len = math.min(cut, body.length - p)
      ascii(java.lang.Long.toHexString(len.toLong) + "\r\n")
      out.write(body, p, len)
      ascii("\r\n")
      p += len
    }
    ascii("0\r\n")
    trailer.foreach { case (k, v) => ascii(s"$k: $v\r\n") }
    ascii("\r\n")
    out.toByteArray
  }
}

/** d108 gate — the corpus's REAL text through the `.warc.gz` crawl
  * container: every doc becomes a three-record shard (warcinfo +
  * request + response, the capture shape crawl writers emit per
  * fetched page), each record its own gzip member; the strict
  * two-layer decode (gzip integrity, WARC grammar, HTTP framing)
  * extracts the response body and reduces to stats the oracle replays
  * straight off `documents`: record count, HTTP status (closed form
  * 404 on doc_id%11==0, else 200), exact body byte count
  * (= octet_length(text)), the target URI (closed-form synthetic
  * example host), plus the in-plan body round-trip verdict.
  *
  * Damage slice on doc_id%7: 0 → truncated mid gzip trailer (the
  * interrupted-write shape; a member-boundary cut would be a VALID
  * shorter shard — the d106 lesson), 3 → version stomped to WARC/9.9
  * pre-compression (gzip layer stays intact: only the WARC grammar
  * catches it), 5 → the response record's Content-Length off by one
  * (the block-framing field the format exists for — the record
  * trailer lands shifted and the parse quarantines). */
object WarcSim {

  private def uri(docId: Long) = s"http://corpus.example/doc/$docId"

  private[graft] def httpStatus(docId: Long): Int =
    if (docId % 11 == 0) 404 else 200

  /** The three raw (uncompressed) records of one shard, pre-damage.
    * `respLenDelta` skews the response record's declared
    * Content-Length (damage mode 5); 0 for a conformant shard. */
  private[graft] def records(docId: Long, text: String,
                             respLenDelta: Int = 0): Seq[Array[Byte]] = {
    val date = "2026-01-01T00:00:00Z"
    val rid = f"<urn:uuid:00000000-0000-4000-8000-${docId}%012d>"
    val info = WarcCodec.renderRecord(
      Seq("WARC-Type" -> "warcinfo", "WARC-Record-ID" -> rid,
        "WARC-Date" -> date, "Content-Type" -> "application/warc-fields"),
      "software: graft-warc/1.0\r\nformat: WARC File Format 1.0\r\n"
        .getBytes("US-ASCII"))
    val req = WarcCodec.renderRecord(
      Seq("WARC-Type" -> "request", "WARC-Record-ID" -> rid,
        "WARC-Date" -> date, "WARC-Target-URI" -> uri(docId),
        "Content-Type" -> "application/http; msgtype=request"),
      s"GET /doc/$docId HTTP/1.1\r\nHost: corpus.example\r\n\r\n"
        .getBytes("US-ASCII"))
    val body = text.getBytes("UTF-8")
    val httpHead =
      (s"HTTP/1.1 ${httpStatus(docId)} ${if (httpStatus(docId) == 404) "Not Found" else "OK"}\r\n" +
        "Content-Type: text/plain; charset=utf-8\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
    val httpMsg = new Array[Byte](httpHead.length + body.length)
    System.arraycopy(httpHead, 0, httpMsg, 0, httpHead.length)
    System.arraycopy(body, 0, httpMsg, httpHead.length, body.length)
    val resp = WarcCodec.renderRecord(
      Seq("WARC-Type" -> "response", "WARC-Record-ID" -> rid,
        "WARC-Date" -> date, "WARC-Target-URI" -> uri(docId),
        "Content-Type" -> "application/http; msgtype=response"),
      httpMsg, respLenDelta)
    Seq(info, req, resp)
  }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    lazy val raw = records(docId, text)
    (docId % 7) match {
      case 0 =>
        val clean = WarcCodec.encode(raw)
        java.util.Arrays.copyOf(clean, clean.length - 5)
      case 3 =>
        val d = raw.head.clone()
        d(5) = '9'; d(7) = '9' // WARC/1.0 → WARC/9.9, pre-compression
        WarcCodec.encode(d +: raw.tail)
      case 5 =>
        // the response record's WARC Content-Length off by one: the
        // block-framing field the format exists for — the record
        // trailer lands shifted and the parse quarantines
        WarcCodec.encode(records(docId, text, respLenDelta = 1))
      case _ => WarcCodec.encode(raw)
    }
  }

  // ---- WET extraction (d111): the shard as a ROW SOURCE -----------

  /** Page slice boundaries for the multi-capture shard: text split
    * into K codepoint slices (never inside a surrogate pair — the
    * d106 rule; DuckDB's substring counts codepoints too, so the
    * oracle replays the same boundaries). */
  private[graft] def nPages(docId: Long): Int = (1 + docId % 3).toInt

  private[graft] def pageTexts(docId: Long, text: String): Seq[String] = {
    val k = nPages(docId)
    val cps = text.codePointCount(0, text.length)
    (0 until k).map { i =>
      val a = text.offsetByCodePoints(0, (i.toLong * cps / k).toInt)
      val b = text.offsetByCodePoints(0, ((i + 1).toLong * cps / k).toInt)
      text.substring(a, b)
    }
  }

  private[graft] def pageStatus(docId: Long, page: Int): Int =
    if ((docId + page) % 11 == 0) 404 else 200

  private def pageUri(docId: Long, page: Int) =
    s"http://corpus.example/doc/$docId/p$page"

  /** The multi-capture shard: warcinfo + K × (request, response) —
    * the shape a real crawl segment has (MANY fetches per file).
    * Same damage slice as the single-capture gate (truncation /
    * version stomp / Content-Length off by one on the LAST
    * response). */
  private[graft] def wetPayloadFor(docId: Long, text: String): Array[Byte] = {
    val date = "2026-01-01T00:00:00Z"
    def capture(page: Int, body: Array[Byte], lenDelta: Int): Seq[Array[Byte]] = {
      val rid = f"<urn:uuid:00000000-0000-4000-9000-${docId * 8 + page}%012d>"
      val st = pageStatus(docId, page)
      val req = WarcCodec.renderRecord(
        Seq("WARC-Type" -> "request", "WARC-Record-ID" -> rid,
          "WARC-Date" -> date, "WARC-Target-URI" -> pageUri(docId, page),
          "Content-Type" -> "application/http; msgtype=request"),
        s"GET /doc/$docId/p$page HTTP/1.1\r\nHost: corpus.example\r\n\r\n"
          .getBytes("US-ASCII"))
      val head = (s"HTTP/1.1 $st ${if (st == 404) "Not Found" else "OK"}\r\n" +
        "Content-Type: text/plain; charset=utf-8\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
      val msg = new Array[Byte](head.length + body.length)
      System.arraycopy(head, 0, msg, 0, head.length)
      System.arraycopy(body, 0, msg, head.length, body.length)
      val resp = WarcCodec.renderRecord(
        Seq("WARC-Type" -> "response", "WARC-Record-ID" -> rid,
          "WARC-Date" -> date, "WARC-Target-URI" -> pageUri(docId, page),
          "Content-Type" -> "application/http; msgtype=response"),
        msg, lenDelta)
      Seq(req, resp)
    }
    val k = nPages(docId)
    val slices = pageTexts(docId, text)
    def shard(stompVersion: Boolean, lenDelta: Int): Array[Byte] = {
      val rid = f"<urn:uuid:00000000-0000-4000-9000-${docId * 8 + 7}%012d>"
      val info0 = WarcCodec.renderRecord(
        Seq("WARC-Type" -> "warcinfo", "WARC-Record-ID" -> rid,
          "WARC-Date" -> date, "Content-Type" -> "application/warc-fields"),
        "software: graft-warc/1.0\r\nformat: WARC File Format 1.0\r\n"
          .getBytes("US-ASCII"))
      val info = if (stompVersion) {
        val d = info0.clone(); d(5) = '9'; d(7) = '9'; d
      } else info0
      val caps = (0 until k).flatMap { i =>
        capture(i, slices(i).getBytes("UTF-8"),
          if (i == k - 1) lenDelta else 0)
      }
      WarcCodec.encode(info +: caps)
    }
    (docId % 7) match {
      case 0 =>
        val clean = shard(stompVersion = false, lenDelta = 0)
        java.util.Arrays.copyOf(clean, clean.length - 5)
      case 3 => shard(stompVersion = true, lenDelta = 0)
      case 5 => shard(stompVersion = false, lenDelta = 1)
      case _ => shard(stompVersion = false, lenDelta = 0)
    }
  }

  val pagesSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("page", IntegerType),
    StructField("target_uri", StringType),
    StructField("n_bytes", LongType),
    StructField("n_lines", LongType),
    StructField("extract_ok", BooleanType)))

  /** The WET conversion — d111's row source: clean multi-capture
    * shards flat-map to one row per 200-status response carrying the
    * EXTRACTED text's stats (the CCNet/RefinedWeb ingest step: crawl
    * container in, per-page text out); 404 captures are dropped like
    * a WET writer drops failed fetches, and damaged shards contribute
    * nothing (their audit is the d108-style quarantine). Map-only
    * flatMap: ingest parallelism IS scan parallelism. */
  def pages(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(pagesSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            val slices = pageTexts(id, text)
            WarcCodec.decode(wetPayloadFor(id, text)).toSeq.flatMap { recs =>
              recs.filter(_.warcType == "response").zipWithIndex.flatMap {
                case (rec, page) =>
                  WarcCodec.parseHttpResponse(rec.block).collect {
                    case (200, body) =>
                      var nLines = 1L
                      var j = 0
                      while (j < body.length) {
                        if (body(j) == '\n') nLines += 1
                        j += 1
                      }
                      Row(id, page,
                        rec.headers.getOrElse("warc-target-uri", ""),
                        body.length.toLong, nLines,
                        java.lang.Boolean.valueOf(java.util.Arrays.equals(
                          body, slices(page).getBytes("UTF-8"))))
                  }
              }
            }
          }
        }
      }(enc)
  }

  private val pageRowsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("page", IntegerType),
    StructField("text", StringType)))

  /** The WET row source with the extracted TEXT itself (not just
    * stats) — what a downstream curation chain consumes: one row per
    * 200-status response of each clean multi-capture shard, carrying
    * the page body decoded back to a string. Same keep/drop rules as
    * [[pages]]; map-only flatMap. */
  def pageRows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(pageRowsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            WarcCodec.decode(wetPayloadFor(id, r.getString(1))).toSeq.flatMap {
              recs =>
                recs.filter(_.warcType == "response").zipWithIndex.flatMap {
                  case (rec, page) =>
                    WarcCodec.parseHttpResponse(rec.block).collect {
                      case (200, body) =>
                        Row(id, page, new String(body, "UTF-8"))
                    }
                }
            }
          }
        }
      }(enc)
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_records", LongType),
    StructField("http_status", LongType),
    StructField("body_bytes", LongType),
    StructField("target_uri", StringType),
    StructField("body_roundtrip", BooleanType)))

  /** Batched strict decode → per-doc stats with quarantine — the d108
    * gate. Map-only: the payload is synthesized per row from the real
    * text column (no join), decoded through both layers, and the
    * response body compared byte-for-byte against the source text. */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            val parsed = WarcCodec.decode(payloadFor(id, text)).flatMap { recs =>
              val resp = recs.filter(_.warcType == "response")
              if (resp.length != 1) None
              else WarcCodec.parseHttpResponse(resp.head.block).map {
                case (code, body) =>
                  (recs.length.toLong, code.toLong, body,
                    resp.head.headers.getOrElse("warc-target-uri", ""))
              }
            }
            parsed match {
              case Some((n, code, body, target)) =>
                Row(id, "ok", n, code, body.length.toLong, target,
                  java.lang.Boolean.valueOf(
                    java.util.Arrays.equals(body, text.getBytes("UTF-8"))))
              case None =>
                Row(id, "quarantined", null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}

/** d127 gate — REAL Common-Crawl response bodies: d108's WARC/HTTP
  * walk extended with `Transfer-Encoding: chunked` and
  * `Content-Encoding: gzip`, the two encodings live crawl payloads
  * actually carry (d108 parses identity bodies only). Every doc's
  * response is chunked at a closed-form cut; doc_id%3==0 docs are
  * ALSO gzip-coded inside the chunking (the de-chunk → gzip-decode
  * order RFC 9112 mandates); doc_id%5==2 docs carry a TRAILER header
  * after the 0 chunk (the grammar's rarest corner, exercised
  * corpus-wide). roundtrip_ok pins decoded bytes == the original
  * text, which makes every downstream d114 pipeline stage identical
  * by construction — the capstone flow over chunked+gzipped pages.
  *
  * Damage slice on doc_id%7: 0 → truncated mid gzip trailer (the
  * container layer catches it); 3 → a LYING CHUNK SIZE — the first
  * chunk's hex size inflated by 0x100000 so the declared chunk
  * overruns the record block (the framing field the grammar exists
  * for); 5 → Content-Length ALONGSIDE Transfer-Encoding: chunked —
  * the request-smuggling classic a strict parser must reject even
  * though every byte of the message is intact. */
object ChunkedSim {

  private[graft] def chunkCut(docId: Long): Int = (200 + docId % 150).toInt
  private[graft] def isGzip(docId: Long): Boolean = docId % 3 == 0

  /** The response record's HTTP message, pre-damage. */
  private[graft] def httpMessage(docId: Long, text: String,
                                 lieFirstChunk: Boolean = false,
                                 clAlongside: Boolean = false): Array[Byte] = {
    val body = text.getBytes("UTF-8")
    val wire = if (isGzip(docId)) GzipCodec.gzipMember(body) else body
    val trailer = if (docId % 5 == 2) Some("X-Corpus-Doc" -> docId.toString)
      else None
    val chunked0 = WarcCodec.chunkBody(wire, chunkCut(docId), trailer)
    val chunked = if (!lieFirstChunk) chunked0 else {
      // inflate the first chunk's declared hex size by 0x100000: the
      // declared chunk overruns the record block — deterministically
      val e = chunked0.indexOf('\r'.toByte)
      val size = java.lang.Long.parseLong(
        new String(chunked0, 0, e, "US-ASCII"), 16)
      val lie = java.lang.Long.toHexString(size + 0x100000L).getBytes("US-ASCII")
      val out = new Array[Byte](chunked0.length - e + lie.length)
      System.arraycopy(lie, 0, out, 0, lie.length)
      System.arraycopy(chunked0, e, out, lie.length, chunked0.length - e)
      out
    }
    val st = WarcSim.httpStatus(docId)
    val head = new StringBuilder()
    head.append(s"HTTP/1.1 $st ${if (st == 404) "Not Found" else "OK"}\r\n")
    head.append("Content-Type: text/plain; charset=utf-8\r\n")
    if (isGzip(docId)) head.append("Content-Encoding: gzip\r\n")
    head.append("Transfer-Encoding: chunked\r\n")
    if (clAlongside) head.append(s"Content-Length: ${chunked.length}\r\n")
    head.append("\r\n")
    val hb = head.toString.getBytes("US-ASCII")
    val msg = new Array[Byte](hb.length + chunked.length)
    System.arraycopy(hb, 0, msg, 0, hb.length)
    System.arraycopy(chunked, 0, msg, hb.length, chunked.length)
    msg
  }

  /** The three-record shard (warcinfo + request + response), the d108
    * capture shape, with the chunked response. */
  private[graft] def records(docId: Long, text: String,
                             lieFirstChunk: Boolean = false,
                             clAlongside: Boolean = false): Seq[Array[Byte]] = {
    val date = "2026-01-01T00:00:00Z"
    val rid = f"<urn:uuid:00000000-0000-4000-a000-${docId}%012d>"
    val uri = s"http://corpus.example/doc/$docId"
    val info = WarcCodec.renderRecord(
      Seq("WARC-Type" -> "warcinfo", "WARC-Record-ID" -> rid,
        "WARC-Date" -> date, "Content-Type" -> "application/warc-fields"),
      "software: graft-warc/1.0\r\nformat: WARC File Format 1.0\r\n"
        .getBytes("US-ASCII"))
    val req = WarcCodec.renderRecord(
      Seq("WARC-Type" -> "request", "WARC-Record-ID" -> rid,
        "WARC-Date" -> date, "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=request"),
      s"GET /doc/$docId HTTP/1.1\r\nHost: corpus.example\r\n\r\n"
        .getBytes("US-ASCII"))
    val resp = WarcCodec.renderRecord(
      Seq("WARC-Type" -> "response", "WARC-Record-ID" -> rid,
        "WARC-Date" -> date, "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
      httpMessage(docId, text, lieFirstChunk, clAlongside))
    Seq(info, req, resp)
  }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    (docId % 7) match {
      case 0 =>
        val clean = WarcCodec.encode(records(docId, text))
        java.util.Arrays.copyOf(clean, clean.length - 5)
      case 3 => WarcCodec.encode(records(docId, text, lieFirstChunk = true))
      case 5 => WarcCodec.encode(records(docId, text, clAlongside = true))
      case _ => WarcCodec.encode(records(docId, text))
    }
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("encoding", StringType),
    StructField("n_chunks", LongType),
    StructField("body_bytes", LongType),
    StructField("n_lines", LongType),
    StructField("roundtrip_ok", BooleanType)))

  /** Batched strict two-layer decode (gzip members → WARC grammar →
    * chunked HTTP framing → optional gzip content coding) → per-doc
    * stats with quarantine. n_chunks is the WALKED wire chunk count —
    * oracle-replayable for identity docs (NULL for gzip docs: the
    * member length is not a closed form; their chunk walk is pinned
    * by the spec suite instead). */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            val parsed = WarcCodec.decode(payloadFor(id, text)).flatMap {
              recs =>
                val resp = recs.filter(_.warcType == "response")
                if (resp.length != 1) None
                else WarcCodec.parseHttpMessage(resp.head.block)
            }
            parsed match {
              case Some((_, body, nChunks, gz)) =>
                var nLines = 1L
                var j = 0
                while (j < body.length) {
                  if (body(j) == '\n') nLines += 1
                  j += 1
                }
                Row(id, "ok", if (gz) "gzip" else "identity",
                  if (gz) null else java.lang.Long.valueOf(nChunks.toLong),
                  body.length.toLong, nLines,
                  java.lang.Boolean.valueOf(
                    java.util.Arrays.equals(body, text.getBytes("UTF-8"))))
              case None =>
                Row(id, "quarantined", null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
