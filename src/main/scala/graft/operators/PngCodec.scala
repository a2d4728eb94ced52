package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Real COMPRESSED-image codec for the d98 gate — the first of the
  * multimodal parsers (d89 PPM/BMP, d93 WAV, d97 AVI are all
  * uncompressed containers) that must cross a genuine entropy-coding
  * boundary: PNG = chunked container + CRC-32 integrity + zlib
  * (DEFLATE) stream + per-scanline prediction filters. Every real
  * 100 TB multimodal corpus is JPEG/PNG-class, and the decode shape
  * is the one that matters at scale: a map-only mapPartitions stage,
  * one batch per [[Multimodal.BATCH_SIZE]] payloads, quarantine (not
  * crash, not silent drop) on every malformed byte stream.
  *
  * Scope: 8-bit grayscale / RGB / RGBA (color types 0, 2, 6),
  * non-interlaced — the shapes real corpora carry; everything else
  * (palette, 16-bit, interlace) quarantines. The zlib side uses only
  * public JDK parts (java.util.zip Deflater/Inflater/CRC32), so the
  * encoder emits byte-exact, spec-conformant PNGs (javax.imageio
  * reads them — pinned in MediaDecodePropertySpec) and the decoder
  * reads any conformant 8-bit RGB PNG, not just its own output.
  *
  * Reference anchor: same constructor∘decoder = identity pattern as
  * the d89 gate (SURVEY §2.5), slurm2sql's build-then-parse testing
  * idea (slurm2sql.py's sacct CSV fixtures) carried to binary media.
  */
object PngCodec {

  private val MAGIC: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Sanity bound on decoded raster size: dims past this are either
    * corruption or a decompression bomb — at corpus scale a hostile
    * 16-byte IHDR must not allocate gigabytes. */
  private val MAX_PIXELS = 1L << 26

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  private def crcOf(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(b, off, len)
    c.getValue.toInt
  }

  /** len(be32) + type + data + CRC32(type ++ data). */
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    putBe32(out, 0, data.length)
    var i = 0
    while (i < 4) { out(4 + i) = typ.charAt(i).toByte; i += 1 }
    System.arraycopy(data, 0, out, 8, data.length)
    putBe32(out, 8 + data.length, crcOf(out, 4, 4 + data.length))
    out
  }

  /** PNG Paeth predictor — exact spec arithmetic (the tie-break order
    * a, then b, then c is normative; getting it wrong still
    * round-trips against a same-bug encoder, which is why the spec
    * pins decode against javax.imageio too). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Bytes per pixel for the supported 8-bit color types: 0 =
    * grayscale, 2 = RGB, 6 = RGBA — the three shapes real corpora
    * carry (palette/16-bit/interlaced quarantine). */
  private def bppOf(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 6 => 4
    case ct => throw new IllegalArgumentException(s"unsupported color type $ct")
  }

  /** Encode an 8-bit raster (row-major, bpp bytes/pixel per
    * `colorType`: 0 gray, 2 RGB, 6 RGBA) as a conformant PNG.
    * `filterOf(y)` picks the scanline filter (0–4) — the gate varies
    * it per row so every un-filter path is exercised corpus-wide.
    * `idatChunkLimit` splits the zlib stream across multiple IDAT
    * chunks (PNG allows any split; decoders must concatenate) — the
    * spec uses it to pin the multi-IDAT path. */
  private[graft] def encode(w: Int, h: Int, rgb: Array[Byte],
                            filterOf: Int => Int,
                            idatChunkLimit: Int = Int.MaxValue,
                            colorType: Int = 2): Array[Byte] = {
    val bpp = bppOf(colorType)
    require(rgb.length == bpp * w * h, s"raster ${rgb.length} != $bpp*$w*$h")
    val bpr = bpp * w
    val raw = new Array[Byte](h * (1 + bpr))
    var y = 0
    while (y < h) {
      val f = filterOf(y)
      raw(y * (1 + bpr)) = f.toByte
      var i = 0
      while (i < bpr) {
        val cur = rgb(y * bpr + i) & 0xFF
        val a = if (i >= bpp) rgb(y * bpr + i - bpp) & 0xFF else 0
        val b = if (y > 0) rgb((y - 1) * bpr + i) & 0xFF else 0
        val c = if (y > 0 && i >= bpp) rgb((y - 1) * bpr + i - bpp) & 0xFF else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(y * (1 + bpr) + 1 + i) = ((cur - pred) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    val d = new java.util.zip.Deflater // default level, zlib wrapper
    d.setInput(raw); d.finish()
    val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) zout.write(buf, 0, d.deflate(buf))
    d.end()
    val z = zout.toByteArray
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // bit depth 8
    // ihdr(10..12): compression 0, filter 0, interlace 0
    val out = new java.io.ByteArrayOutputStream(z.length + 128)
    out.write(MAGIC)
    out.write(chunk("IHDR", ihdr))
    var off = 0
    while (off < z.length || (z.length == 0 && off == 0)) {
      val n = math.min(idatChunkLimit, z.length - off)
      out.write(chunk("IDAT", java.util.Arrays.copyOfRange(z, off, off + n)))
      off += math.max(n, 1)
    }
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** STRICT decode of an 8-bit gray/RGB/RGBA non-interlaced PNG →
    * (w, h, sumR, sumG, sumB), or None for anything malformed: bad
    * magic, chunk framing past the buffer, any chunk CRC mismatch,
    * an unsupported IHDR, bomb-sized dims, zlib errors, inflated
    * length ≠ h·(1+bpp·w), an unknown filter byte, a missing IEND,
    * or trailing bytes after it. Ancillary chunks between IHDR and IEND are
    * skipped (their CRCs still checked) — a conformant reader must
    * tolerate tEXt/gAMA/etc. */
  private[graft] def decodeSums(b: Array[Byte]): Option[Array[Long]] =
    decodeNative(b).map { case (w, h, ct, px) =>
      val bpp = bppOf(ct)
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < px.length) {
        // grayscale contributes its value to all three channels;
        // RGBA's alpha is metadata, not color — excluded from sums
        val r = px(i) & 0xFF
        val g = if (bpp >= 3) px(i + 1) & 0xFF else r
        val bl = if (bpp >= 3) px(i + 2) & 0xFF else r
        sr += r; sg += g; sb += bl
        i += bpp
      }
      Array(w.toLong, h.toLong, sr, sg, sb)
    }

  /** RGB projection of [[decodeNative]] — the spec's byte-exact
    * round-trip surface for the RGB family. */
  private[graft] def decodeRaster(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeNative(b).collect { case (w, h, 2, px) => (w, h, px) }

  /** Full native-layout raster decode: (w, h, colorType, row-major
    * pixels at the type's bpp); [[decodeSums]] is the gate's
    * projection. */
  private[graft] def decodeNative(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (b == null || b.length < 8) return None
    var i = 0
    while (i < 8) { if (b(i) != MAGIC(i)) return None; i += 1 }
    var w = -1; var h = -1; var colorType = -1
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream
    while (!seenIend) {
      if (i + 12 > b.length) return None // truncated chunk framing
      val len = be32(b, i)
      if (len < 0 || i + 12 + len.toLong > b.length) return None
      if (crcOf(b, i + 4, 4 + len) != be32(b, i + 8 + len)) return None
      val typ = new String(b, i + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          w = be32(b, i + 8); h = be32(b, i + 12)
          // 8-bit gray/RGB/RGBA, non-interlaced only; dims bounded
          // against bombs
          if (w <= 0 || h <= 0 || w.toLong * h > MAX_PIXELS) return None
          colorType = b(i + 17) & 0xFF
          if (b(i + 16) != 8 ||
            (colorType != 0 && colorType != 2 && colorType != 6) ||
            b(i + 18) != 0 || b(i + 19) != 0 || b(i + 20) != 0) return None
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(b, i + 8, len)
        case "IEND" =>
          if (!seenIhdr || len != 0) return None
          seenIend = true
        case _ =>
          if (!seenIhdr) return None // IHDR must be first
      }
      i += 12 + len
    }
    if (i != b.length) return None // trailing garbage after IEND
    val bpp = bppOf(colorType)
    val bpr = bpp * w
    val expLen = h.toLong * (1 + bpr)
    if (expLen > Int.MaxValue) return None
    val raw = new Array[Byte](expLen.toInt)
    val inf = new java.util.zip.Inflater
    inf.setInput(idat.toByteArray)
    val got =
      try {
        var t = 0
        while (t < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, t, raw.length - t)
          // no progress + input exhausted = truncated stream
          if (n == 0 && inf.needsInput()) return None
          t += n
        }
        t
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally inf.end()
    // the stream must carry EXACTLY the raster: short (truncated
    // source) and long (corrupt length) both quarantine
    if (got != raw.length || !inf.finished()) return None
    val rgb = new Array[Byte](h * bpr)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + bpr)) & 0xFF
      if (f > 4) return None
      var x = 0
      while (x < bpr) {
        val cur = raw(y * (1 + bpr) + 1 + x) & 0xFF
        val a = if (x >= bpp) rgb(y * bpr + x - bpp) & 0xFF else 0
        val bb = if (y > 0) rgb((y - 1) * bpr + x) & 0xFF else 0
        val c = if (y > 0 && x >= bpp) rgb((y - 1) * bpr + x - bpp) & 0xFF else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => bb
          case 3 => (a + bb) / 2
          case 4 => paeth(a, bb, c)
        }
        rgb(y * bpr + x) = ((cur + pred) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, colorType, rgb))
  }

  val pngStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  /** Batched strict PNG decode → per-image stats with quarantine —
    * the d98 gate, same mapPartitions batch contract as
    * [[Multimodal.decodeStats]] (map-only, one decode call per
    * payload batch, scan partitioning preserved — parallelizes as
    * widely as the scan at any corpus size). No n_bytes column here:
    * a DEFLATE stream's length is not closed-form SQL-replayable (the
    * honest boundary the d75 deflate_len scoring already documents),
    * so the gate hashes dims + exact channel sums + the quarantine
    * slice instead. */
  def pngStats(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(pngStatsSchema)
    withPayloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            // positional getters: upstream frames built by RowEncoder
            // mapPartitions carry schema-less GenericRows
            val id = r.getLong(0)
            decodeSums(r.getAs[Array[Byte]](1)) match {
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

/** Deterministic in-plan PNG synthesizer for the d98 gate — the
  * compressed-format sibling of [[ImageSim]]/[[AudioSim]]: every doc
  * becomes a REAL zlib-compressed PNG whose pixels follow closed-form
  * per-coordinate gradients (so a SQL oracle replays the channel sums
  * arithmetically over a bounded coordinate grid), with the scanline
  * filter cycling (doc_id + y) % 5 so all five PNG filter paths are
  * exercised corpus-wide, and the COLOR TYPE cycling doc_id % 3 →
  * grayscale / RGB / RGBA so all three supported layouts (and their
  * bpp-dependent filter offsets) run corpus-wide too. Column
  * expressions can't speak DEFLATE or CRC-32, so unlike ImageSim's
  * hex/unhex build this constructor runs in the same map-only
  * mapPartitions shape as the decoder.
  *
  * Damage slice (deterministic, id-keyed): doc_id % 7 == 0 → payload
  * truncated to half (chunk framing falls off the buffer);
  * % 7 == 3 → magic stomped; % 7 == 5 → one IHDR CRC byte flipped —
  * the integrity-check path no uncompressed-container gate could
  * exercise. */
object PngSim {

  private[graft] def dims(docId: Long): (Int, Int) =
    ((4 + docId % 9).toInt, (3 + (docId * 5) % 7).toInt)

  /** doc_id % 3 → 0 grayscale, 1 RGB, 2 RGBA. */
  private[graft] def colorType(docId: Long): Int =
    (docId % 3) match { case 0 => 0; case 1 => 2; case _ => 6 }

  /** Closed-form pixel gradients — each channel a distinct linear
    * form mod 256, so neighboring pixels differ and every filter
    * genuinely predicts. Grayscale carries the r-gradient alone;
    * RGBA adds a fourth (alpha) gradient the channel sums exclude
    * by contract. */
  private[graft] def raster(docId: Long, w: Int, h: Int): Array[Byte] =
    rasterOf(docId, w, h, 2)

  private[graft] def rasterOf(docId: Long, w: Int, h: Int,
                              ct: Int): Array[Byte] = {
    val bpp = ct match { case 0 => 1; case 2 => 3; case _ => 4 }
    val px = new Array[Byte](bpp * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = bpp * (y * w + x)
        px(i) = ((docId + 3 * x + 7 * y) % 256).toByte
        if (bpp >= 3) {
          px(i + 1) = ((docId * 7 + 11 + 5 * x + 2 * y) % 256).toByte
          px(i + 2) = ((docId * 13 + 5 + x + 4 * y) % 256).toByte
        }
        if (bpp == 4)
          px(i + 3) = ((docId * 11 + 7 + 2 * x + 3 * y) % 256).toByte
        x += 1
      }
      y += 1
    }
    px
  }

  private[graft] def cleanPng(docId: Long): Array[Byte] = {
    val (w, h) = dims(docId)
    val ct = colorType(docId)
    PngCodec.encode(w, h, rasterOf(docId, w, h, ct),
      y => ((docId + y) % 5).toInt, colorType = ct)
  }

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val png = cleanPng(docId)
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(png, png.length / 2)
      case 3 => val d = png.clone(); d(0) = 'X'; d(1) = 'X'; d
      case 5 =>
        // IHDR CRC lives at bytes 29..32 (magic 8 + len 4 + type 4 +
        // data 13); flipping one bit there leaves the framing intact
        // so ONLY the CRC check can catch it
        val d = png.clone(); d(32) = (d(32) ^ 0x01).toByte; d
      case _ => png
    }
  }

  private val payloadSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  /** doc_id → payload, the gate's input frame. Map-only, id-driven:
    * at any corpus size this synthesizer parallelizes as the scan
    * does and shuffles nothing. */
  def payloads(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(payloadSchema)
    docs.select(col("doc_id"))
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        Row(id, payloadFor(id))
      })(enc)
  }
}
