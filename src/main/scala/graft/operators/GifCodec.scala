package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Real GIF codec for the d102 gate — the third compressed multimodal
  * format after PNG (d98) and JPEG (d101), and the one whose entropy
  * layer is entirely ours: PNG's DEFLATE came from the JDK and JPEG's
  * Huffman tables from Annex K, but GIF's variable-width LZW
  * (dictionary growth, deferred code-size bumps, clear-code resets,
  * the KwKwK self-reference) is implemented here from the public
  * GIF87a/89a specification. GIF is LOSSLESS over an indexed palette,
  * so unlike d101 the oracle is hash-exact on channel sums — the d98
  * rigor with a harder entropy stage.
  *
  * Scope: single-image GIF87a/89a, global or local color table,
  * interlaced or sequential row order, extension blocks skipped
  * (comment, GCE, application — what javax.imageio writes; its GIF
  * writer also INTERLACES by default, so interlace is real-world
  * scope, not an exotic). Multi-image animations quarantine. The
  * decoder reads any conformant in-scope stream, not just its own
  * encoder's output — javax.imageio-written GIFs are pinned in
  * MediaDecodePropertySpec, both directions.
  *
  * Reference anchor: same constructor∘decoder pattern as the
  * d89/d98/d101 gates (SURVEY §2.5) — slurm2sql.py's build-then-parse
  * fixture discipline carried to LZW-coded media.
  */
object GifCodec {

  /** Bomb bound, same rationale as PngCodec.MAX_PIXELS: a hostile
    * 13-byte screen descriptor must not allocate gigabytes. */
  private val MAX_PIXELS = 1L << 26

  // ---- LSB-first bit I/O (GIF packs codes little-endian, the
  // opposite of JPEG/PNG) ----

  private final class LzwWriter {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) {
        bytes.write((acc & 0xFF).toInt)
        acc >>>= 8
        nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) { bytes.write((acc & 0xFF).toInt); acc = 0; nbits = 0 }
      bytes.toByteArray
    }
  }

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** LZW-compress pixel indices at `minCodeSize` (GIF semantics:
    * leading clear code, deferred width bumps after the write when the
    * free pointer has passed the width's ceiling — the classic
    * compress()-derived pairing every GIF reader expects, full-table
    * reset via clear). */
  private[graft] def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bw = new LzwWriter
    var nBits = minCodeSize + 1
    var maxCode = (1 << nBits) - 1
    var freeEnt = eoi + 1
    // (prefixCode << 8 | pixel) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    def emit(code: Int): Unit = {
      bw.put(code, nBits)
      if (freeEnt > maxCode && nBits < 12) { nBits += 1; maxCode = (1 << nBits) - 1 }
    }
    emit(clear)
    if (indices.isEmpty) { emit(eoi); return bw.finish() }
    var ent: Int = indices(0) & 0xFF
    var i = 1
    while (i < indices.length) {
      val c = indices(i) & 0xFF
      val key = Integer.valueOf((ent << 8) | c)
      val hit = dict.get(key)
      if (hit != null) ent = hit.intValue()
      else {
        emit(ent)
        if (freeEnt < 4096) { dict.put(key, Integer.valueOf(freeEnt)); freeEnt += 1 }
        else {
          emit(clear)
          dict = new java.util.HashMap[Integer, Integer]()
          freeEnt = eoi + 1; nBits = minCodeSize + 1; maxCode = (1 << nBits) - 1
        }
        ent = c
      }
      i += 1
    }
    emit(ent)
    emit(eoi)
    bw.finish()
  }

  /** Strict LZW decode: must produce EXACTLY `expected` pixels and hit
    * EOI — anything else (bad code, overrun, underrun) throws. */
  private[graft] def lzwDecode(data: Array[Byte], minCodeSize: Int,
                               expected: Int): Array[Byte] = {
    if (minCodeSize < 2 || minCodeSize > 8) throw Malformed
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outPos = 0
    // dictionary as prefix-link + last-char arrays (the giflib shape)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var available = eoi + 1
    var codeSize = minCodeSize + 1
    var codeMask = (1 << codeSize) - 1
    var oldCode = -1
    var firstChar: Byte = 0
    var acc = 0L
    var nbits = 0
    var pos = 0
    var done = false
    while (!done) {
      while (nbits < codeSize) {
        if (pos >= data.length) throw Malformed // ran out before EOI
        acc |= (data(pos) & 0xFFL) << nbits
        nbits += 8; pos += 1
      }
      val code = (acc & codeMask).toInt
      acc >>>= codeSize; nbits -= codeSize
      if (code == clear) {
        available = eoi + 1; codeSize = minCodeSize + 1
        codeMask = (1 << codeSize) - 1; oldCode = -1
      } else if (code == eoi) {
        done = true
      } else {
        if (code > available || (code == available && oldCode < 0)) throw Malformed
        var sp = 0
        var cur = code
        if (code == available) { // KwKwK
          stack(sp) = firstChar; sp += 1
          cur = oldCode
        }
        while (cur >= clear + 2) {
          stack(sp) = suffix(cur); sp += 1
          if (sp > 4096) throw Malformed
          cur = prefix(cur)
        }
        if (cur >= clear) throw Malformed
        firstChar = cur.toByte
        stack(sp) = firstChar; sp += 1
        if (outPos + sp > expected) throw Malformed // too many pixels
        while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        if (oldCode >= 0 && available < 4096) {
          prefix(available) = oldCode
          suffix(available) = firstChar
          available += 1
          if (available > codeMask && codeSize < 12) {
            codeSize += 1; codeMask = (1 << codeSize) - 1
          }
        }
        oldCode = code
      }
    }
    if (outPos != expected) throw Malformed
    out
  }

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  /** Encode an indexed raster as a single-image GIF87a. `palette` =
    * RGB triples (length 3·2^n, 2 ≤ 2^n ≤ 256); `indices` = w·h
    * palette indices. `comment` optionally emits a GIF comment
    * extension before the image descriptor (the skip path conformant
    * readers must take). */
  private[graft] def encode(w: Int, h: Int, palette: Array[Byte],
                            indices: Array[Byte],
                            comment: Option[String] = None): Array[Byte] = {
    val nColors = palette.length / 3
    require(nColors >= 2 && nColors <= 256 && Integer.bitCount(nColors) == 1,
      s"palette size $nColors")
    require(indices.length == w * h, s"raster ${indices.length} != $w*$h")
    val sizeBits = 31 - Integer.numberOfLeadingZeros(nColors) // log2
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 64)
    out.write("GIF87a".getBytes("US-ASCII"))
    // logical screen descriptor
    out.write(w & 0xFF); out.write((w >> 8) & 0xFF)
    out.write(h & 0xFF); out.write((h >> 8) & 0xFF)
    out.write(0x80 | ((sizeBits - 1) & 0x07)) // GCT flag + size
    out.write(0) // background color index
    out.write(0) // aspect
    out.write(palette, 0, palette.length)
    comment.foreach { c =>
      out.write(0x21); out.write(0xFE) // comment extension
      val cb = c.getBytes("US-ASCII")
      var o = 0
      while (o < cb.length) {
        val n = math.min(255, cb.length - o)
        out.write(n); out.write(cb, o, n); o += n
      }
      out.write(0x00)
    }
    // image descriptor (no LCT, not interlaced)
    out.write(0x2C)
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(w & 0xFF); out.write((w >> 8) & 0xFF)
    out.write(h & 0xFF); out.write((h >> 8) & 0xFF)
    out.write(0x00)
    val minCodeSize = math.max(2, sizeBits)
    out.write(minCodeSize)
    val lzw = lzwEncode(indices, minCodeSize)
    var o = 0
    while (o < lzw.length) {
      val n = math.min(255, lzw.length - o)
      out.write(n); out.write(lzw, o, n); o += n
    }
    out.write(0x00) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** STRICT single-image decode → (w, h, rgb) where rgb is 3·w·h
    * bytes through the active palette. None = malformed or out of
    * scope (interlaced, >1 image, bad LZW, truncation, overrun). */
  private[graft] def decodeNative(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      if (b.length < 14) return None
      val magic = new String(b, 0, 6, "US-ASCII")
      if (magic != "GIF87a" && magic != "GIF89a") return None
      val sw = u16le(b, 6); val sh = u16le(b, 8)
      if (sw <= 0 || sh <= 0 || sw.toLong * sh > MAX_PIXELS) return None
      val flags = b(10) & 0xFF
      var pos = 13
      var gct: Array[Byte] = null
      if ((flags & 0x80) != 0) {
        val n = 2 << (flags & 0x07)
        if (pos + 3 * n > b.length) return None
        gct = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
        pos += 3 * n
      }
      var result: (Int, Int, Array[Byte]) = null
      var sawTrailer = false
      while (!sawTrailer) {
        if (pos >= b.length) return None
        (b(pos) & 0xFF) match {
          case 0x3B =>
            if (pos != b.length - 1) return None // trailing garbage
            sawTrailer = true
          case 0x21 => // extension: label + sub-blocks, skip strictly
            if (pos + 2 > b.length) return None
            pos += 2
            var blockLen = -1
            while (blockLen != 0) {
              if (pos >= b.length) return None
              blockLen = b(pos) & 0xFF
              pos += 1 + blockLen
              if (pos > b.length) return None
            }
          case 0x2C =>
            if (result != null) return None // multi-image out of scope
            if (pos + 10 > b.length) return None
            val left = u16le(b, pos + 1); val top = u16le(b, pos + 3)
            val iw = u16le(b, pos + 5); val ih = u16le(b, pos + 7)
            val iflags = b(pos + 9) & 0xFF
            val interlaced = (iflags & 0x40) != 0
            if (iw <= 0 || ih <= 0 || left + iw > sw || top + ih > sh) return None
            pos += 10
            var pal = gct
            if ((iflags & 0x80) != 0) {
              val n = 2 << (iflags & 0x07)
              if (pos + 3 * n > b.length) return None
              pal = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
              pos += 3 * n
            }
            if (pal == null) return None
            if (pos >= b.length) return None
            val minCodeSize = b(pos) & 0xFF
            pos += 1
            val lzw = new java.io.ByteArrayOutputStream()
            var blockLen = -1
            while (blockLen != 0) {
              if (pos >= b.length) return None
              blockLen = b(pos) & 0xFF
              if (pos + 1 + blockLen > b.length) return None
              lzw.write(b, pos + 1, blockLen)
              pos += 1 + blockLen
            }
            val seq = lzwDecode(lzw.toByteArray, minCodeSize, iw * ih)
            // interlaced images store rows in 4 passes (8/8 from 0,
            // 8/8 from 4, 4/4 from 2, 2/2 from 1) — what javax.imageio
            // WRITES by default, so real-world scope, not an exotic
            val indices = if (!interlaced) seq else {
              val out = new Array[Byte](iw * ih)
              var src = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                var y = start
                while (y < ih) {
                  System.arraycopy(seq, src * iw, out, y * iw, iw)
                  src += 1; y += step
                }
              }
              out
            }
            val nPal = pal.length / 3
            val rgb = new Array[Byte](3 * iw * ih)
            var i = 0
            while (i < indices.length) {
              val idx = indices(i) & 0xFF
              if (idx >= nPal) throw Malformed
              rgb(3 * i) = pal(3 * idx)
              rgb(3 * i + 1) = pal(3 * idx + 1)
              rgb(3 * i + 2) = pal(3 * idx + 2)
              i += 1
            }
            // the gate's screens are exactly the image (left=top=0,
            // full size); anything else is out of scope
            if (left != 0 || top != 0 || iw != sw || ih != sh) return None
            result = (iw, ih, rgb)
          case _ => return None
        }
      }
      Option(result)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** (w, h, sumR, sumG, sumB) or None — the gate's projection. */
  private[graft] def decodeSums(b: Array[Byte]): Option[Array[Long]] =
    decodeNative(b).map { case (w, h, rgb) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < rgb.length) {
        sr += rgb(i) & 0xFF; sg += rgb(i + 1) & 0xFF; sb += rgb(i + 2) & 0xFF
        i += 3
      }
      Array(w.toLong, h.toLong, sr, sg, sb)
    }
}

/** Deterministic in-plan GIF synthesizer + gate for d102 — the
  * lossless LZW sibling of [[PngSim]]/[[JpegSim]]. Every doc becomes
  * a conformant 16-color GIF87a whose palette and pixel indices are
  * closed-form integer recurrences, so the oracle replays exact
  * channel sums over a bounded coordinate grid (GIF is lossless: the
  * hash carries the full d98-style exactness through OUR LZW).
  * doc_id % 5 == 2 rows carry a comment extension block before the
  * image (the skip path every conformant reader needs). Damage slice
  * on doc_id % 7: 0 → truncated to half (sub-block chain or LZW falls
  * off the buffer), 3 → magic stomped, 5 → LZW root code size set to
  * 12 (conformant framing that only the entropy layer's range check
  * catches — d101's precision-12 analog). */
object GifSim {

  private[graft] val N_COLORS = 16

  private[graft] def dims(docId: Long): (Int, Int) =
    ((5 + docId % 11).toInt, (4 + (docId * 3) % 9).toInt)

  /** Palette entry i → (r, g, b), closed-form. */
  private[graft] def palR(i: Int): Int = (i * 37 + 11) % 256
  private[graft] def palG(i: Int): Int = (i * 59 + 17) % 256
  private[graft] def palB(i: Int): Int = (i * 83 + 5) % 256

  private[graft] def pixelIndex(docId: Long, x: Int, y: Int): Int =
    ((docId + 3 * x + 7 * y) % N_COLORS).toInt

  private[graft] def palette(): Array[Byte] = {
    val p = new Array[Byte](3 * N_COLORS)
    var i = 0
    while (i < N_COLORS) {
      p(3 * i) = palR(i).toByte; p(3 * i + 1) = palG(i).toByte
      p(3 * i + 2) = palB(i).toByte
      i += 1
    }
    p
  }

  private[graft] def indices(docId: Long, w: Int, h: Int): Array[Byte] = {
    val ix = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { ix(y * w + x) = pixelIndex(docId, x, y).toByte; x += 1 }
      y += 1
    }
    ix
  }

  private[graft] def cleanGif(docId: Long): Array[Byte] = {
    val (w, h) = dims(docId)
    GifCodec.encode(w, h, palette(), indices(docId, w, h),
      comment = if (docId % 5 == 2) Some(s"graft doc $docId") else None)
  }

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val gif = cleanGif(docId)
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(gif, gif.length / 2)
      case 3 => val d = gif.clone(); d(0) = 'X'; d
      case 5 =>
        // stomp the LZW root code size to 12: framing stays fully
        // conformant, only the entropy layer's 2..8 range check can
        // catch it. The byte follows the 10-byte image descriptor —
        // the first 0x2C separator after the 13-byte header + 48-byte
        // GCT (+ optional comment extension); we write no LCT.
        val d = gif.clone()
        var i = 13 + 3 * N_COLORS
        while ((d(i) & 0xFF) == 0x21) { // skip extensions
          i += 2
          while ((d(i) & 0xFF) != 0) i += 1 + (d(i) & 0xFF)
          i += 1
        }
        require((d(i) & 0xFF) == 0x2C, "image descriptor not found")
        d(i + 10) = 12.toByte
        d
      case _ => gif
    }
  }

  private val payloadSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  /** doc_id → payload. Map-only, id-driven: parallelizes as the scan
    * does and shuffles nothing at any corpus size. */
  def payloads(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(payloadSchema)
    docs.select(col("doc_id"))
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        Row(id, payloadFor(id))
      })(enc)
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  /** Batched strict GIF decode → per-image stats with quarantine —
    * the d102 gate, same mapPartitions batch contract as
    * [[PngCodec.pngStats]]. Lossless codec → all sums exact. */
  def stats(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    withPayloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            GifCodec.decodeSums(r.getAs[Array[Byte]](1)) match {
              case Some(f) =>
                Row(id, "ok", f(0).toInt, f(1).toInt, f(2), f(3), f(4))
              case None =>
                Row(id, "quarantined", null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
