package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RFC 1952 gzip member codec for the d106 gate — the container THE
  * text-corpus shipping format actually uses (.jsonl.gz / .txt.gz
  * shards). PNG (d98) used the JDK's zlib-wrapped Inflater; here the
  * member framing is ours: magic/CM/flag parsing (FEXTRA, FNAME,
  * FCOMMENT, FHCRC — what `gzip` itself emits), raw-DEFLATE body,
  * and the RFC's own integrity trailer — CRC-32 of the uncompressed
  * bytes plus ISIZE — verified strictly per member, with MULTI-MEMBER
  * concatenation (cat a.gz b.gz is a valid gzip stream by spec, and
  * append-style corpus writers produce exactly that).
  *
  * Unlike the d98/d101/d102 sims this gate compresses the corpus's
  * REAL text column in-plan — the oracle replays byte/line counts
  * straight off `documents.text`, so the round trip is pinned against
  * genuine data, not a synthetic recurrence.
  *
  * Reference anchor: same constructor∘decoder discipline as the
  * d89-d105 gates (SURVEY §2.5); the independent implementation
  * pinned in MediaDecodePropertySpec is `gzip` itself, both
  * directions, plus the JDK's GZIPInputStream.
  */
object GzipCodec {

  private val MAX_BYTES = 1L << 30

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private def w32le(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
  }

  /** Compress one member: 10-byte header (no optional fields),
    * raw-DEFLATE body, CRC-32 + ISIZE trailer. */
  private[graft] def gzipMember(content: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(content.length / 2 + 32)
    out.write(0x1F); out.write(0x8B) // magic
    out.write(8) // CM = deflate
    out.write(0) // no flags
    w32le(out, 0) // mtime 0: deterministic shards
    out.write(0) // XFL
    out.write(255) // OS unknown
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(content); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    val crc = new java.util.zip.CRC32
    crc.update(content)
    w32le(out, crc.getValue)
    w32le(out, content.length.toLong & 0xFFFFFFFFL)
    out.toByteArray
  }

  /** Concatenated members — the multi-member stream the RFC defines
    * and append-style writers produce. */
  private[graft] def encode(members: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { m =>
      val g = gzipMember(m)
      out.write(g, 0, g.length)
    }
    out.toByteArray
  }

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  /** STRICT multi-member decode → per-member uncompressed contents,
    * or None. Verifies magic/CM per member, walks the optional
    * header fields `gzip` emits (FEXTRA, FNAME, FCOMMENT, and FHCRC
    * — the 16-bit header CRC is VERIFIED, not skipped), inflates the
    * raw body, and checks the CRC-32 + ISIZE trailer exactly.
    * Trailing garbage that is not another member quarantines. */
  private[graft] def decode(b: Array[Byte]): Option[Seq[Array[Byte]]] = {
    try {
      val out = Seq.newBuilder[Array[Byte]]
      var pos = 0
      var total = 0L
      if (b.length == 0) throw Malformed
      while (pos < b.length) {
        if (pos + 10 > b.length || (b(pos) & 0xFF) != 0x1F ||
          (b(pos + 1) & 0xFF) != 0x8B || (b(pos + 2) & 0xFF) != 8)
          throw Malformed
        val flg = b(pos + 3) & 0xFF
        if ((flg & 0xE0) != 0) throw Malformed // reserved bits
        val hdrStart = pos
        pos += 10
        if ((flg & 0x04) != 0) { // FEXTRA
          if (pos + 2 > b.length) throw Malformed
          val xlen = (b(pos) & 0xFF) | ((b(pos + 1) & 0xFF) << 8)
          pos += 2 + xlen
          if (pos > b.length) throw Malformed
        }
        if ((flg & 0x08) != 0) { // FNAME: NUL-terminated
          while (pos < b.length && b(pos) != 0) pos += 1
          if (pos >= b.length) throw Malformed
          pos += 1
        }
        if ((flg & 0x10) != 0) { // FCOMMENT
          while (pos < b.length && b(pos) != 0) pos += 1
          if (pos >= b.length) throw Malformed
          pos += 1
        }
        if ((flg & 0x02) != 0) { // FHCRC: low 16 bits of header CRC-32
          if (pos + 2 > b.length) throw Malformed
          val hc = new java.util.zip.CRC32
          hc.update(b, hdrStart, pos - hdrStart)
          val want = (hc.getValue & 0xFFFF).toInt
          val got = (b(pos) & 0xFF) | ((b(pos + 1) & 0xFF) << 8)
          if (want != got) throw Malformed
          pos += 2
        }
        val inf = new java.util.zip.Inflater(true)
        inf.setInput(b, pos, b.length - pos)
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        try {
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            if (n == 0 && !inf.finished()) throw Malformed // truncated
            bos.write(buf, 0, n)
            total += n
            if (total > MAX_BYTES) throw Malformed
          }
          pos = b.length - inf.getRemaining // end of this DEFLATE body
        } catch {
          case _: java.util.zip.DataFormatException => throw Malformed
        } finally inf.end()
        val content = bos.toByteArray
        if (pos + 8 > b.length) throw Malformed
        val crc = new java.util.zip.CRC32
        crc.update(content)
        if (u32le(b, pos) != crc.getValue ||
          u32le(b, pos + 4) != (content.length.toLong & 0xFFFFFFFFL))
          throw Malformed
        pos += 8
        out += content
      }
      Some(out.result())
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}

/** d106 gate — the corpus's REAL text column through the gzip member
  * codec: each doc's text is gzipped in-plan (doc_id % 5 == 2 docs as
  * TWO concatenated members split at the character midpoint — the
  * append-writer stream shape), strictly decoded, and reduced to the
  * stats the oracle replays straight off `documents.text`: member
  * count, exact UTF-8 byte total, line count, plus the in-plan
  * round-trip verdict (decoded bytes == original text). Damage slice
  * on doc_id % 7: 0 → truncated mid-trailer (an interrupted write;
  * half-truncation would be nondeterministic here — a multi-member
  * stream cut exactly at a member boundary is a VALID shorter
  * stream), 3 → magic stomped, 5 → one CRC-32 trailer bit flipped
  * (the integrity path the RFC trailer exists for). */
object GzipSim {

  /** Split at the CODEPOINT midpoint (never inside a surrogate pair —
    * a broken pair would mangle the UTF-8 bytes and desync the
    * byte-count oracle, which counts codepoints engine-side). */
  private[graft] def memberTexts(docId: Long, text: String): Seq[String] = {
    val cps = text.codePointCount(0, text.length)
    if (docId % 5 == 2 && cps >= 2) {
      val mid = text.offsetByCodePoints(0, cps / 2)
      Seq(text.substring(0, mid), text.substring(mid))
    } else Seq(text)
  }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val clean = {
      val out = new java.io.ByteArrayOutputStream()
      memberTexts(docId, text).foreach { t =>
        val g = GzipCodec.gzipMember(t.getBytes("UTF-8"))
        out.write(g, 0, g.length)
      }
      out.toByteArray
    }
    (docId % 7) match {
      // cut INSIDE the final trailer (ISIZE gone, CRC partial):
      // always malformed regardless of member layout — a half cut
      // could land exactly on a member boundary, which the RFC says
      // is a valid (shorter) stream, making quarantine data-dependent
      case 0 => java.util.Arrays.copyOf(clean, clean.length - 5)
      case 3 => val d = clean.clone(); d(0) = 'X'; d
      case 5 =>
        // flip one bit in the FIRST member's CRC-32 trailer: framing
        // and DEFLATE stay intact, only the integrity verify catches
        // it. The trailer's position depends on the compressed size,
        // so locate it from the END for single-member payloads and
        // re-walk for multi-member ones: flipping the LAST member's
        // CRC is equivalent and always 8 bytes from the end.
        val d = clean.clone()
        d(d.length - 8) = (d(d.length - 8) ^ 0x01).toByte
        d
      case _ => clean
    }
  }

  private val payloadSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  /** (doc_id, text) → gzip payload. Map-only over the scan. */
  def payloads(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(payloadSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        Row(id, payloadFor(id, r.getString(1)))
      })(enc)
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_members", LongType),
    StructField("n_bytes", LongType),
    StructField("n_lines", LongType),
    StructField("roundtrip_ok", BooleanType)))

  /** Batched strict decode → per-doc stats with quarantine — the
    * d106 gate. Needs the original text alongside the payload for
    * the round-trip verdict, so it maps over (doc_id, text, payload)
    * rows built by [[payloads]] joined in-plan — in practice the
    * gate recomputes the payload per row (map-only, no join). */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            GzipCodec.decode(payloadFor(id, text)) match {
              case Some(ms) =>
                var nBytes = 0L; var nLines = 0L
                ms.foreach { m =>
                  nBytes += m.length
                  var j = 0
                  while (j < m.length) { if (m(j) == '\n') nLines += 1; j += 1 }
                  nLines += 1 // last (or only) line of each member
                }
                val decoded = ms.map(new String(_, "UTF-8")).mkString
                Row(id, "ok", ms.length.toLong, nBytes, nLines,
                  java.lang.Boolean.valueOf(decoded == text))
              case None =>
                Row(id, "quarantined", null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
