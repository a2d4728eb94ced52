package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LZ4 frame + block codec for the d115 gate — the compression format
  * big-data storage actually uses (Hadoop/Spark shuffle and event
  * logs, .lz4 corpus shards): the FRAME format (magic, FLG/BD
  * descriptor with an xxHash32 header checksum, length-prefixed
  * blocks, EndMark, whole-content xxHash32) wrapping the LZ4 BLOCK
  * format — token-coded literal/match sequences with 16-bit offsets
  * and overlapping copies. The BLOCK codec — both directions — is
  * implemented HERE from the published spec (greedy hash-table
  * encoder honoring the end rules: no match starting within the last
  * 12 bytes, final literals-only sequence); the xxHash32 primitive
  * comes from lz4-java on the Spark classpath (the PNG/Inflater
  * precedent: the checksum is the borrowed primitive, the codec is
  * ours) — which also serves as the INDEPENDENT interop
  * implementation: LZ4FrameOutputStream-written frames decode in our
  * walker and LZ4FrameInputStream reads our encoder's output,
  * byte-exact both ways.
  *
  * Scope (the d98 discipline): frame version 01, block-independent,
  * no block checksums, no content size field, no dictID, content
  * checksum PRESENT and verified — anything else QUARANTINES rather
  * than crashes. Blocks may be any size ≤ the declared max (the spec
  * allows arbitrary splits — our sim cuts at a closed-form boundary
  * so the oracle can replay the block count).
  */
object Lz4Codec {

  private val xxf = net.jpountz.xxhash.XXHashFactory.fastestJavaInstance()

  private[graft] def xxh32(b: Array[Byte], off: Int, len: Int): Int =
    xxf.hash32().hash(b, off, len, 0)

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** LZ4 BLOCK compress (greedy, 4-byte hash table) — conforms to the
    * spec's end rules so any conformant decoder (including
    * lz4-java's) reads it. */
  private[graft] def compressBlock(src: Array[Byte]): Array[Byte] = {
    val n = src.length
    val out = new java.io.ByteArrayOutputStream(n + n / 255 + 16)
    def u32(i: Int): Int =
      (src(i) & 0xFF) | ((src(i + 1) & 0xFF) << 8) |
        ((src(i + 2) & 0xFF) << 16) | ((src(i + 3) & 0xFF) << 24)
    def writeLen(extra: Int): Unit = {
      var e = extra
      while (e >= 255) { out.write(255); e -= 255 }
      out.write(e)
    }
    val HASH_BITS = 13
    val table = new Array[Int](1 << HASH_BITS)
    java.util.Arrays.fill(table, -1)
    def hash(v: Int): Int = ((v * -1640531535) >>> (32 - HASH_BITS))
    var anchor = 0
    var i = 0
    val mfLimit = n - 12 // no match may START in the last 12 bytes
    while (i < mfLimit) {
      val h = hash(u32(i))
      val cand = table(h)
      table(h) = i
      if (cand >= 0 && i - cand <= 0xFFFF && u32(cand) == u32(i)) {
        // extend the match (may not run into the last 5 bytes)
        val matchLimit = n - 5
        var ml = 4
        while (i + ml < matchLimit && src(cand + ml) == src(i + ml)) ml += 1
        val litLen = i - anchor
        val mlCode = ml - 4
        out.write((math.min(litLen, 15) << 4) | math.min(mlCode, 15))
        if (litLen >= 15) writeLen(litLen - 15)
        out.write(src, anchor, litLen)
        val off = i - cand
        out.write(off & 0xFF); out.write(off >> 8)
        if (mlCode >= 15) writeLen(mlCode - 15)
        i += ml
        anchor = i
      } else i += 1
    }
    // final literals-only sequence
    val litLen = n - anchor
    out.write(math.min(litLen, 15) << 4)
    if (litLen >= 15) writeLen(litLen - 15)
    out.write(src, anchor, litLen)
    out.toByteArray
  }

  private def w32le(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
  }

  /** Encode content as one frame, cutting blocks every `blockCut`
    * bytes (any size ≤ the declared 64 KB max is spec-legal). */
  private[graft] def encodeFrame(content: Array[Byte], blockCut: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(content.length + 64)
    w32le(out, 0x184D2204L) // magic
    val flg = 0x64 // version 01, block independence, content checksum
    val bd = 0x40 // block max size code 4 (64 KB)
    out.write(flg); out.write(bd)
    val hdr = Array(flg.toByte, bd.toByte)
    out.write((xxh32(hdr, 0, 2) >> 8) & 0xFF) // HC
    var p = 0
    while (p < content.length) {
      val len = math.min(blockCut, content.length - p)
      val raw = java.util.Arrays.copyOfRange(content, p, p + len)
      val comp = compressBlock(raw)
      if (comp.length < len) {
        w32le(out, comp.length.toLong)
        out.write(comp, 0, comp.length)
      } else { // incompressible: stored, high bit set
        w32le(out, len.toLong | 0x80000000L)
        out.write(raw, 0, len)
      }
      p += len
    }
    w32le(out, 0) // EndMark
    w32le(out, xxh32(content, 0, content.length).toLong & 0xFFFFFFFFL)
    out.toByteArray
  }

  /** STRICT frame decode → content, or None for anything malformed or
    * out of scope (bad magic, version/flag scope, header-checksum or
    * content-checksum mismatch, block overrun, trailing bytes). */
  private[graft] def decode(b: Array[Byte]): Option[Array[Byte]] = {
    def u32(i: Int): Long =
      (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
        ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
    try {
      if (b.length < 11 || u32(0) != 0x184D2204L) return None
      val flg = b(4) & 0xFF; val bd = b(5) & 0xFF
      // FLG: bits 7-6 version (01), 5 block independence, 4 block
      // checksum, 3 content size, 2 content checksum, 1 reserved,
      // 0 dictID
      if ((flg >> 6) != 1) throw Malformed // version
      if ((flg & 0x20) == 0) throw Malformed // block independence required
      if ((flg & 0x10) != 0) throw Malformed // block checksums: out of scope
      if ((flg & 0x08) != 0) throw Malformed // content size: out of scope
      if ((flg & 0x04) == 0) throw Malformed // content checksum REQUIRED in scope
      if ((flg & 0x03) != 0) throw Malformed // reserved / dictID
      if ((bd & 0x8F) != 0) throw Malformed
      val maxCode = (bd >> 4) & 7
      if (maxCode < 4 || maxCode > 7) throw Malformed
      val blockMax = 1 << (8 + 2 * maxCode)
      val hdr = Array(b(4), b(5))
      if (((xxh32(hdr, 0, 2) >> 8) & 0xFF) != (b(6) & 0xFF)) throw Malformed
      val out = new java.io.ByteArrayOutputStream()
      var p = 7
      var end = false
      while (!end) {
        if (p + 4 > b.length) throw Malformed
        val sz = u32(p); p += 4
        if (sz == 0L) end = true
        else {
          val stored = (sz & 0x80000000L) != 0
          val len = (sz & 0x7FFFFFFFL).toInt
          if (len == 0 || len > blockMax) throw Malformed
          if (p + len > b.length) throw Malformed
          if (stored) out.write(b, p, len)
          else {
            // decode with a bounded output: a block may expand to at
            // most blockMax (the declared frame bound)
            val dec = decompressBounded(b, p, p + len, blockMax)
            out.write(dec, 0, dec.length)
          }
          p += len
        }
      }
      val content = out.toByteArray
      // content checksum (FLG bit 2 verified present above)
      if (p + 4 > b.length) throw Malformed
      if (u32(p) != (xxh32(content, 0, content.length).toLong & 0xFFFFFFFFL))
        throw Malformed
      p += 4
      if (p != b.length) throw Malformed // trailing bytes
      Some(content)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** [[decompressBlock]] without a known output size: grows up to
    * `maxOut`. */
  private def decompressBounded(b: Array[Byte], from: Int, to: Int,
                                maxOut: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(maxOut, 1 << 16))
    var o = 0
    val buf = new Array[Byte](maxOut)
    var p = from
    def readLen(base: Int): Int = {
      var len = base
      if (base == 15) {
        var more = 255
        while (more == 255) {
          if (p >= to) throw Malformed
          more = b(p) & 0xFF; p += 1
          len += more
        }
      }
      len
    }
    var done = false
    while (!done) {
      if (p >= to) throw Malformed
      val token = b(p) & 0xFF; p += 1
      val litLen = readLen(token >> 4)
      if (p + litLen > to || o + litLen > maxOut) throw Malformed
      System.arraycopy(b, p, buf, o, litLen)
      p += litLen; o += litLen
      if (p == to) done = true
      else {
        if (p + 2 > to) throw Malformed
        val off = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
        p += 2
        if (off == 0 || off > o) throw Malformed
        val ml = readLen(token & 0x0F) + 4
        if (o + ml > maxOut) throw Malformed
        var j = 0
        while (j < ml) { buf(o) = buf(o - off); o += 1; j += 1 }
      }
    }
    out.write(buf, 0, o)
    out.toByteArray
  }
}

/** d115 gate — the corpus's REAL text through the LZ4 frame codec
  * (the d106 discipline): each doc's text is framed in-plan with a
  * closed-form block cut (700 + doc_id%500 bytes — multi-block for
  * longer texts, block count replayable as ceil(bytes/cut)), strictly
  * decoded, and reduced to stats the oracle replays off
  * documents.text: block count, exact byte total, line count, plus
  * the in-plan round-trip verdict. Damage slice on doc_id%7: 0 →
  * truncated mid content-checksum, 3 → magic stomped, 5 → one content
  * checksum bit flipped (the integrity field the frame exists for). */
object Lz4Sim {

  private[graft] def blockCut(docId: Long): Int = (700 + docId % 500).toInt

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val clean = Lz4Codec.encodeFrame(text.getBytes("UTF-8"), blockCut(docId))
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(clean, clean.length - 3)
      case 3 => val d = clean.clone(); d(0) = 'X'; d
      case 5 =>
        val d = clean.clone()
        d(d.length - 2) = (d(d.length - 2) ^ 0x10).toByte
        d
      case _ => clean
    }
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_blocks", LongType),
    StructField("n_bytes", LongType),
    StructField("n_lines", LongType),
    StructField("roundtrip_ok", BooleanType)))

  /** Batched strict decode → per-doc stats with quarantine — the d115
    * gate, same mapPartitions batch contract as the other codec
    * gates (map-only; payload synthesized per row from the real
    * text). */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            Lz4Codec.decode(payloadFor(id, text)) match {
              case Some(content) =>
                var nLines = 1L
                var j = 0
                while (j < content.length) {
                  if (content(j) == '\n') nLines += 1
                  j += 1
                }
                val cut = blockCut(id)
                val nBlocks =
                  math.max(1L, (content.length.toLong + cut - 1) / cut)
                Row(id, "ok", nBlocks, content.length.toLong, nLines,
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
