package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Snappy framing + block codec for the d122 gate — the compression
  * format SPARK ITSELF runs on (shuffle/broadcast/RDD codecs default
  * through snappy) and a standard corpus shard wrapper: the FRAMING
  * format (stream identifier `sNaPpY`, chunked compressed/
  * uncompressed data with a masked CRC-32C of the UNCOMPRESSED bytes
  * per chunk — the same rotate-17+magic masking TFRecord borrowed
  * FROM snappy, shared via [[TfRecordCodec.maskedCrc]] — padding and
  * skippable chunks handled, reserved-unskippable rejected) wrapping
  * the snappy BLOCK format — varint preamble, tag-coded literals and
  * 1/2/4-byte-offset copies with overlapping-copy semantics, a greedy
  * hash-table encoder. Both layers implemented HERE from the
  * published format descriptions in BOTH directions; the independent
  * interop twins are snappy-java (`SnappyFramedInput/OutputStream`,
  * `Snappy.compress/uncompress` at the block layer) AND
  * commons-compress (`FramedSnappyCompressorInputStream`) — both on
  * the public Spark classpath, pinned in MediaDecodePropertySpec.
  *
  * Scope (the d98 discipline): stream identifier REQUIRED first;
  * chunk types 0x00/0x01 (data), 0xfe (padding, skipped), 0x80-0xfd
  * (skippable, skipped); 0x02-0x7f (reserved UNSKIPPABLE) and any
  * CRC mismatch, length lie, uncompressed chunk > 65536, or
  * truncation QUARANTINE rather than crash.
  */
object SnappyCodec {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private val MAX_CHUNK = 65536
  private val MAX_BYTES = 1L << 28

  // ---- block layer ------------------------------------------------------

  /** Greedy snappy block compress (4-byte hash table) — conforms to
    * the block format so any reader (incl. snappy-java's) decodes. */
  private[graft] def compressBlock(src: Array[Byte]): Array[Byte] = {
    val n = src.length
    val out = new java.io.ByteArrayOutputStream(n / 2 + 32)
    // uncompressed-length preamble: PLAIN varint (no zigzag)
    var v = n
    while ((v & ~0x7F) != 0) { out.write((v & 0x7F) | 0x80); v >>>= 7 }
    out.write(v)
    def u32(i: Int): Int =
      (src(i) & 0xFF) | ((src(i + 1) & 0xFF) << 8) |
        ((src(i + 2) & 0xFF) << 16) | ((src(i + 3) & 0xFF) << 24)
    def hash(x: Int): Int = (x * -1640531535) >>> (32 - 13)
    def emitLiteral(from: Int, to: Int): Unit = {
      var p = from
      while (p < to) {
        val len = math.min(to - p, 1 << 16) // 3-byte len covers any slice here
        if (len <= 60) out.write(((len - 1) << 2))
        else if (len <= 256) { out.write(60 << 2); out.write(len - 1) }
        else { out.write(61 << 2); out.write((len - 1) & 0xFF); out.write((len - 1) >> 8) }
        out.write(src, p, len)
        p += len
      }
    }
    val table = new Array[Int](1 << 13)
    java.util.Arrays.fill(table, -1)
    var anchor = 0
    var i = 0
    while (i + 4 <= n) {
      val h = hash(u32(i))
      val cand = table(h)
      table(h) = i
      if (cand >= 0 && u32(cand) == u32(i)) {
        emitLiteral(anchor, i)
        var ml = 4
        while (i + ml < n && src(cand + ml) == src(i + ml)) ml += 1
        val off = i - cand
        // emit copies: ≤64 per element, 2-byte-offset form (tag 10
        // carries lengths 1..64, and off < 65536 always: our chunks
        // are ≤ 64 KiB)
        var rem = ml
        while (rem > 0) {
          val take = math.min(rem, 64)
          out.write(((take - 1) << 2) | 2)
          out.write(off & 0xFF); out.write(off >> 8)
          rem -= take
        }
        i += ml
        anchor = i
      } else i += 1
    }
    emitLiteral(anchor, n)
    out.toByteArray
  }

  /** STRICT block decompress with a declared output bound. */
  private[graft] def decompressBlock(b: Array[Byte], from: Int, to: Int): Array[Byte] = {
    var p = from
    // preamble varint
    var n = 0
    var shift = 0
    var done = false
    while (!done) {
      if (p >= to || shift > 31) throw Malformed
      val byte = b(p); p += 1
      n |= (byte & 0x7F) << shift
      if ((byte & 0x80) == 0) done = true
      shift += 7
    }
    if (n < 0 || n > MAX_CHUNK) throw Malformed
    val out = new Array[Byte](n)
    var o = 0
    while (p < to) {
      val tag = b(p) & 0xFF; p += 1
      (tag & 3) match {
        case 0 => // literal
          var len = (tag >> 2) + 1
          if (len > 60) {
            val extra = len - 60 // 1..4 length bytes
            if (p + extra > to) throw Malformed
            var lv = 0L
            var k = 0
            while (k < extra) { lv |= (b(p + k) & 0xFFL) << (8 * k); k += 1 }
            p += extra
            if (lv > MAX_CHUNK) throw Malformed
            len = lv.toInt + 1
          }
          if (p + len > to || o + len > n) throw Malformed
          System.arraycopy(b, p, out, o, len)
          p += len; o += len
        case c =>
          val (len, off) = c match {
            case 1 =>
              if (p >= to) throw Malformed
              val l = 4 + ((tag >> 2) & 7)
              val of = ((tag >> 5) << 8) | (b(p) & 0xFF); p += 1
              (l, of)
            case 2 =>
              if (p + 2 > to) throw Malformed
              val of = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8); p += 2
              ((tag >> 2) + 1, of)
            case _ =>
              if (p + 4 > to) throw Malformed
              val of = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
                ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
              p += 4
              if (of < 0) throw Malformed
              ((tag >> 2) + 1, of)
          }
          if (off == 0 || off > o || o + len > n) throw Malformed
          var k = 0
          while (k < len) { out(o) = out(o - off); o += 1; k += 1 }
      }
    }
    if (o != n) throw Malformed // preamble lies about the output
    out
  }

  // ---- framing layer ------------------------------------------------------

  private val STREAM_ID = Array[Byte](0xFF.toByte, 6, 0, 0,
    's', 'N', 'a', 'P', 'p', 'Y')

  /** Encode content as a framed stream, chunks cut every `chunkCut`
    * bytes (≤ 64 KiB); each chunk compresses or stores, whichever is
    * smaller. `padAfterFirst` inserts a padding chunk after the first
    * data chunk (the spec's skip path, exercised corpus-wide). */
  private[graft] def encodeFramed(content: Array[Byte], chunkCut: Int,
                                  padAfterFirst: Boolean): Array[Byte] = {
    require(chunkCut >= 1 && chunkCut <= MAX_CHUNK)
    val out = new java.io.ByteArrayOutputStream(content.length + 64)
    out.write(STREAM_ID, 0, STREAM_ID.length)
    def chunk(tpe: Int, payload: Array[Byte]): Unit = {
      out.write(tpe)
      out.write(payload.length & 0xFF)
      out.write((payload.length >> 8) & 0xFF)
      out.write((payload.length >> 16) & 0xFF)
      out.write(payload, 0, payload.length)
    }
    var p = 0
    var first = true
    var emitted = false
    while (p < content.length || !emitted) {
      val len = math.min(chunkCut, content.length - p)
      val crc = TfRecordCodec.maskedCrc(content, p, len)
      val comp = compressBlock(java.util.Arrays.copyOfRange(content, p, p + len))
      val crcB = Array[Byte]((crc & 0xFF).toByte, ((crc >> 8) & 0xFF).toByte,
        ((crc >> 16) & 0xFF).toByte, ((crc >>> 24) & 0xFF).toByte)
      if (comp.length < len) chunk(0x00, crcB ++ comp)
      else chunk(0x01, crcB ++ java.util.Arrays.copyOfRange(content, p, p + len))
      if (first && padAfterFirst) chunk(0xFE, Array[Byte](0, 0, 0))
      first = false
      p += len
      emitted = true
    }
    out.toByteArray
  }

  /** STRICT framed decode → (content, dataChunkCount), or None. */
  private[graft] def decodeFramed(b: Array[Byte]): Option[(Array[Byte], Int)] =
    try {
      if (b.length < STREAM_ID.length) return None
      var i = 0
      while (i < STREAM_ID.length) {
        if (b(i) != STREAM_ID(i)) return None
        i += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      var chunks = 0
      var p = STREAM_ID.length
      while (p < b.length) {
        if (p + 4 > b.length) throw Malformed
        val tpe = b(p) & 0xFF
        val len = (b(p + 1) & 0xFF) | ((b(p + 2) & 0xFF) << 8) |
          ((b(p + 3) & 0xFF) << 16)
        p += 4
        if (p + len > b.length) throw Malformed
        tpe match {
          case 0x00 | 0x01 => // compressed / uncompressed data
            if (len < 4) throw Malformed
            val crc = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
              ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
            val data =
              if (tpe == 0x01) java.util.Arrays.copyOfRange(b, p + 4, p + len)
              else decompressBlock(b, p + 4, p + len)
            if (data.length > MAX_CHUNK) throw Malformed
            if (TfRecordCodec.maskedCrc(data, 0, data.length) != crc)
              throw Malformed
            out.write(data, 0, data.length)
            if (out.size() > MAX_BYTES) throw Malformed
            chunks += 1
          case 0xFF => throw Malformed // second stream identifier
          case t if t == 0xFE || (t >= 0x80 && t <= 0xFD) => () // skip
          case _ => throw Malformed // reserved UNSKIPPABLE
        }
        p += len
      }
      Some((out.toByteArray, chunks))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
}

/** d122 gate — the corpus's REAL text through the snappy framing (the
  * d115/d117 discipline): chunks cut at 700+doc_id%400 bytes (chunk
  * count replayable as ceil(bytes/cut)), doc_id%5==2 docs carry a
  * PADDING chunk (the spec's skip path), strict decode, stats replayed
  * off documents.text. Damage slice on doc_id%7: 0 → truncated mid
  * chunk, 3 → stream identifier stomped, 5 → one masked-CRC bit
  * flipped (the integrity field the framing exists for). */
object SnappySim {

  private[graft] def chunkCut(docId: Long): Int = (700 + docId % 400).toInt

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val clean = SnappyCodec.encodeFramed(text.getBytes("UTF-8"),
      chunkCut(docId), padAfterFirst = docId % 5 == 2)
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(clean, clean.length - 3)
      case 3 => val d = clean.clone(); d(4) = 'X'; d // inside "sNaPpY"
      case 5 =>
        // first data chunk's masked CRC: right after the 10-byte
        // stream identifier + 4-byte chunk header
        val d = clean.clone()
        d(15) = (d(15) ^ 0x10).toByte
        d
      case _ => clean
    }
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_chunks", LongType),
    StructField("n_bytes", LongType),
    StructField("n_lines", LongType),
    StructField("roundtrip_ok", BooleanType)))

  /** Batched strict decode → per-doc stats with quarantine — the d122
    * gate, same mapPartitions batch contract as the other codec
    * gates (map-only). */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            SnappyCodec.decodeFramed(payloadFor(id, text)) match {
              case Some((content, chunks)) =>
                var nLines = 1L
                var j = 0
                while (j < content.length) {
                  if (content(j) == '\n') nLines += 1
                  j += 1
                }
                Row(id, "ok", chunks.toLong, content.length.toLong, nLines,
                  java.lang.Boolean.valueOf(
                    java.util.Arrays.equals(content, text.getBytes("UTF-8"))))
              case None =>
                Row(id, "quarantined", null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
