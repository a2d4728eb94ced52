package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Real baseline-JPEG codec for the d101 gate — the second compressed
  * multimodal format after PNG (d98) and the one that actually
  * dominates real 100 TB image corpora. Unlike PNG the entropy
  * boundary here is Huffman coding over quantized DCT coefficients,
  * i.e. the decode path must cross marker framing, table parsing
  * (DQT/DHT/DRI), canonical-Huffman bit decoding with byte
  * unstuffing and restart markers, dequantization, an 8×8 inverse
  * DCT, and YCbCr→RGB — all from public spec knowledge (ITU T.81 +
  * JFIF; the quantization and Huffman tables are the spec's own
  * Annex K examples).
  *
  * Scope (the d98 discipline): baseline sequential SOF0, 8-bit,
  * 1-component grayscale or 3-component YCbCr at 4:4:4, 4:2:2 or
  * 4:2:0 (sampling factors 1-2 — what real camera/libjpeg output
  * uses; chroma upsampled by replication at the color convert) —
  * everything else (progressive, 12-bit, 3-4x factors,
  * arithmetic-coded) QUARANTINES rather than crashes. The decoder
  * reads any conformant stream in scope (javax.imageio-written
  * grayscale AND 4:2:0 color JPEGs are pinned in
  * MediaDecodePropertySpec), not just its own encoder's output.
  *
  * Determinism: the DCT runs in doubles, so coefficients that are
  * integers in exact arithmetic land within ~1e-13 of them; [[snap]]
  * collapses that float fuzz before every round site. The payoff is
  * the d101 oracle: a solid-color 8×8 tile quantizes to a pure-DC
  * block whose decoded value is the closed form
  * `clamp(2·round((c−128)/2) + 128)` = "c rounded up to even",
  * SQL-replayable through a genuinely lossy codec.
  *
  * Reference anchor: same constructor∘decoder testing pattern as the
  * d89/d98 gates (SURVEY §2.5) — slurm2sql.py's build-then-parse
  * sacct fixtures carried to entropy-coded media.
  */
object JpegCodec {

  /** Bomb bound, same rationale as PngCodec.MAX_PIXELS: a hostile
    * 10-byte SOF0 must not allocate gigabytes. */
  private val MAX_PIXELS = 1L << 26

  /** ITU T.81 Annex K.1 luminance quantization table (quality 50 —
    * the spec's own example values, used unscaled). Natural order. */
  private[graft] val QT_LUM: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance table. Natural order. */
  private[graft] val QT_CHR: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Zigzag scan: natural index of each zigzag position. */
  private val ZIGZAG: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ---- Annex K.3 typical Huffman tables: (bits per length 1..16,
  // symbol values in canonical order) ----
  private val DC_LUM_BITS = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DC_LUM_VALS = (0 to 11).toArray
  private val DC_CHR_BITS = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DC_CHR_VALS = (0 to 11).toArray

  private val AC_LUM_BITS = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AC_LUM_VALS: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val AC_CHR_BITS = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AC_CHR_VALS: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman ENCODE table: symbol → (code, length). */
  private final class HuffEnc(bits: Array[Int], vals: Array[Int]) {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          codeOf(vals(k)) = code; lenOf(vals(k)) = l
          code += 1; k += 1; i += 1
        }
        code <<= 1; l += 1
      }
    }
  }

  /** Canonical Huffman DECODE table — the spec's mincode/maxcode/
    * valptr walk (T.81 F.2.2.3): O(code length) per symbol, no
    * 64K lookup allocation per table per image. */
  private[operators] final class HuffDec(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) maxCode(l) = -1
        else {
          valPtr(l) = k; minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1; l += 1
      }
    }
  }

  private val ENC_DC = Array(new HuffEnc(DC_LUM_BITS, DC_LUM_VALS), new HuffEnc(DC_CHR_BITS, DC_CHR_VALS))
  private val ENC_AC = Array(new HuffEnc(AC_LUM_BITS, AC_LUM_VALS), new HuffEnc(AC_CHR_BITS, AC_CHR_VALS))

  /** 8×8 DCT basis matrix M(x)(u) = c(u)/2 · cos((2x+1)uπ/16); both
    * transforms are two 8×8 matrix products over it (FDCT = MᵀfM,
    * IDCT = MFMᵀ) — exact-enough doubles, [[snap]] handles the rest. */
  private val DCT_M: Array[Array[Double]] = {
    val m = Array.ofDim[Double](8, 8)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        m(x)(u) = 0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    m
  }

  /** Collapse float fuzz: values within 1e-6 of an integer ARE that
    * integer. DCT of integer rasters produces coefficients at most
    * ~1e-12 off their exact values; snapping before each round site
    * makes the codec's integer outputs deterministic per the exact
    * math (which is what the d101 oracle replays). */
  private def snap(x: Double): Double = {
    val r = math.rint(x)
    if (math.abs(x - r) < 1e-6) r else x
  }

  private def clamp255(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** In-place-free FDCT of one level-shifted block (natural order in,
    * natural order out). */
  private def fdct(in: Array[Double]): Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) { // t = f · M  (t(x)(v) = Σy f(x,y)·M(y)(v))
      var v = 0
      while (v < 8) {
        var s = 0.0; var y = 0
        while (y < 8) { s += in(x * 8 + y) * DCT_M(y)(v); y += 1 }
        t(x * 8 + v) = s; v += 1
      }
      x += 1
    }
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) { // out = Mᵀ · t
      var v = 0
      while (v < 8) {
        var s = 0.0; var x2 = 0
        while (x2 < 8) { s += DCT_M(x2)(u) * t(x2 * 8 + v); x2 += 1 }
        out(u * 8 + v) = s; v += 1
      }
      u += 1
    }
    out
  }

  /** IDCT of one dequantized block (natural order) → spatial. */
  private def idct(in: Array[Double]): Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) { // t = M · F
      var v = 0
      while (v < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += DCT_M(x)(u) * in(u * 8 + v); u += 1 }
        t(x * 8 + v) = s; v += 1
      }
      x += 1
    }
    val out = new Array[Double](64)
    var x2 = 0
    while (x2 < 8) { // out = t · Mᵀ
      var y = 0
      while (y < 8) {
        var s = 0.0; var v = 0
        while (v < 8) { s += t(x2 * 8 + v) * DCT_M(y)(v); v += 1 }
        out(x2 * 8 + y) = s; y += 1
      }
      x2 += 1
    }
    out
  }

  // ---- bit I/O ----

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1 << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = (acc >>> (nbits - 8)) & 0xFF
        out.write(b)
        if (b == 0xFF) out.write(0) // byte stuffing
        nbits -= 8
        acc &= (1 << nbits) - 1
      }
    }
    /** 1-pad to a byte boundary (T.81 F.1.2.3). */
    def align(): Unit = if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
  }

  /** Magnitude category (DC diff / AC value size): bits needed for
    * |v|; the appended raw bits are v for v>0 and v−1's low bits for
    * v<0 (the spec's one's-complement trick). */
  private def magnitude(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def putMagBits(bw: BitWriter, v: Int, s: Int): Unit =
    if (s > 0) bw.put(if (v < 0) v - 1 else v, s)

  private def writeSeg(out: java.io.ByteArrayOutputStream, marker: Int,
                       payload: Array[Byte]): Unit = {
    out.write(0xFF); out.write(marker)
    val len = payload.length + 2
    out.write((len >>> 8) & 0xFF); out.write(len & 0xFF)
    out.write(payload, 0, payload.length)
  }

  /** Encode an 8-bit raster as a baseline JFIF JPEG. `comps` = 1
    * (grayscale, `pix` = w·h bytes) or 3 (RGB interleaved, 3·w·h
    * bytes; converted to YCbCr and coded 4:4:4). Fixed Annex K
    * quantization (quality 50) and Huffman tables — the DECODER reads
    * any in-scope tables from the stream; the encoder does not need a
    * quality knob for the gate and keeping the tables fixed keeps the
    * oracle's closed form honest. `restartInterval` > 0 emits DRI +
    * RSTn markers every that-many MCUs (decoders must resync —
    * exercised corpus-wide by JpegSim). */
  private[graft] def encode(w: Int, h: Int, pix: Array[Byte], comps: Int,
                            restartInterval: Int = 0): Array[Byte] = {
    require(comps == 1 || comps == 3, s"comps $comps")
    require(pix.length == comps * w * h, s"raster ${pix.length} != $comps*$w*$h")
    // component planes (level-shift happens at block build)
    val planes: Array[Array[Int]] = if (comps == 1) {
      val y = new Array[Int](w * h)
      var i = 0
      while (i < w * h) { y(i) = pix(i) & 0xFF; i += 1 }
      Array(y)
    } else {
      val yp = new Array[Int](w * h); val cb = new Array[Int](w * h); val cr = new Array[Int](w * h)
      var i = 0
      while (i < w * h) {
        val r = pix(3 * i) & 0xFF; val g = pix(3 * i + 1) & 0xFF; val b = pix(3 * i + 2) & 0xFF
        // JFIF full-range BT.601
        yp(i) = clamp255(math.round(snap(0.299 * r + 0.587 * g + 0.114 * b)))
        cb(i) = clamp255(math.round(snap(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)))
        cr(i) = clamp255(math.round(snap(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)))
        i += 1
      }
      Array(yp, cb, cr)
    }

    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 1024)
    out.write(0xFF); out.write(0xD8) // SOI
    writeSeg(out, 0xE0, Array[Byte]( // APP0 JFIF 1.1, no thumbnail
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0 (lum) always; table 1 (chr) for color
    val nQt = if (comps == 1) 1 else 2
    val dqt = new Array[Byte](65 * nQt)
    var t = 0
    while (t < nQt) {
      dqt(65 * t) = t.toByte // pq=0, tq=t
      val qt = if (t == 0) QT_LUM else QT_CHR
      var z = 0
      while (z < 64) { dqt(65 * t + 1 + z) = qt(ZIGZAG(z)).toByte; z += 1 }
      t += 1
    }
    writeSeg(out, 0xDB, dqt)
    // SOF0
    val sof = new java.io.ByteArrayOutputStream
    sof.write(8) // precision
    sof.write((h >>> 8) & 0xFF); sof.write(h & 0xFF)
    sof.write((w >>> 8) & 0xFF); sof.write(w & 0xFF)
    sof.write(comps)
    var c = 0
    while (c < comps) {
      sof.write(c + 1) // component id
      sof.write(0x11) // h=1, v=1 (4:4:4)
      sof.write(if (c == 0) 0 else 1) // quant table
      c += 1
    }
    writeSeg(out, 0xC0, sof.toByteArray)
    // DHT: one segment, all tables
    val dht = new java.io.ByteArrayOutputStream
    def addHuff(clazz: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      dht.write((clazz << 4) | id)
      var i = 0
      while (i < 16) { dht.write(bits(i)); i += 1 }
      i = 0
      while (i < vals.length) { dht.write(vals(i)); i += 1 }
    }
    addHuff(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    addHuff(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if (comps == 3) {
      addHuff(0, 1, DC_CHR_BITS, DC_CHR_VALS)
      addHuff(1, 1, AC_CHR_BITS, AC_CHR_VALS)
    }
    writeSeg(out, 0xC4, dht.toByteArray)
    if (restartInterval > 0)
      writeSeg(out, 0xDD, Array[Byte](
        ((restartInterval >>> 8) & 0xFF).toByte, (restartInterval & 0xFF).toByte))
    // SOS
    val sos = new java.io.ByteArrayOutputStream
    sos.write(comps)
    c = 0
    while (c < comps) {
      sos.write(c + 1)
      sos.write(if (c == 0) 0x00 else 0x11) // dc/ac table ids
      c += 1
    }
    sos.write(0); sos.write(63); sos.write(0) // Ss, Se, AhAl
    writeSeg(out, 0xDA, sos.toByteArray)

    // entropy-coded data
    val bw = new BitWriter(out)
    val mcusX = (w + 7) / 8; val mcusY = (h + 7) / 8
    val dcPred = new Array[Int](comps)
    val block = new Array[Double](64)
    var rstCount = 0; var rstMark = 0
    var my = 0; var done = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && done > 0 && done % restartInterval == 0) {
          bw.align()
          out.write(0xFF); out.write(0xD0 + rstMark)
          rstMark = (rstMark + 1) % 8
          java.util.Arrays.fill(dcPred, 0)
        }
        c = 0
        while (c < comps) {
          val plane = planes(c)
          // build level-shifted block with edge replication
          var by = 0
          while (by < 8) {
            val sy = math.min(my * 8 + by, h - 1)
            var bx = 0
            while (bx < 8) {
              val sx = math.min(mx * 8 + bx, w - 1)
              block(by * 8 + bx) = plane(sy * w + sx) - 128.0
              bx += 1
            }
            by += 1
          }
          // Orientation matters: blocks are row-major (by*8+bx), so
          // the fdct's first index is the VERTICAL axis and the
          // natural-order coefficient index is v_vert*8+u_horiz —
          // T.81's layout. Zigzag and the Annex K tables are NOT
          // (u,v)-symmetric, so a transposed block round-trips
          // through a mirrored decoder but breaks interop with any
          // conformant one (pinned against javax.imageio both
          // directions in MediaDecodePropertySpec).
          val coef = fdct(block)
          val qt = if (c == 0) QT_LUM else QT_CHR
          val qz = new Array[Int](64)
          var z = 0
          while (z < 64) {
            val n = ZIGZAG(z)
            qz(z) = math.round(snap(coef(n)) / qt(n)).toInt
            z += 1
          }
          val tb = if (c == 0) 0 else 1
          val diff = qz(0) - dcPred(c); dcPred(c) = qz(0)
          val s = magnitude(diff)
          bw.put(ENC_DC(tb).codeOf(s), ENC_DC(tb).lenOf(s))
          putMagBits(bw, diff, s)
          var run = 0
          z = 1
          while (z < 64) {
            if (qz(z) == 0) run += 1
            else {
              while (run >= 16) { bw.put(ENC_AC(tb).codeOf(0xF0), ENC_AC(tb).lenOf(0xF0)); run -= 16 }
              val sz = magnitude(qz(z))
              val sym = (run << 4) | sz
              bw.put(ENC_AC(tb).codeOf(sym), ENC_AC(tb).lenOf(sym))
              putMagBits(bw, qz(z), sz)
              run = 0
            }
            z += 1
          }
          if (run > 0) bw.put(ENC_AC(tb).codeOf(0x00), ENC_AC(tb).lenOf(0x00)) // EOB
          c += 1
        }
        done += 1
        mx += 1
      }
      my += 1
    }
    bw.align()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  // ---- decoder ----

  /** Entropy-segment bit reader with FF00 unstuffing. Any marker hit
    * during a bit read is a failure (restarts are consumed explicitly
    * at MCU boundaries by [[decodeNative]]). Throws Malformed — the
    * decode entry point catches it into a quarantine None. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw Malformed
        var by = b(pos) & 0xFF; pos += 1
        if (by == 0xFF) {
          if (pos >= b.length) throw Malformed
          val m = b(pos) & 0xFF; pos += 1
          if (m != 0x00) throw Malformed // marker mid-entropy
          by = 0xFF
        }
        acc = by; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Drop partial bits (restart / end-of-scan alignment). */
    def align(): Unit = nbits = 0
  }

  private object Malformed extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private def decodeHuff(br: BitReader, tab: HuffDec): Int = {
    var code = br.bit()
    var l = 1
    while (tab.maxCode(l) < 0 || code > tab.maxCode(l)) {
      l += 1
      if (l > 16) throw Malformed
      code = (code << 1) | br.bit()
    }
    tab.values(tab.valPtr(l) + code - tab.minCode(l))
  }

  /** T.81 EXTEND: map s received bits to the signed coefficient. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v + ((-1 << s) + 1) else v

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  /** STRICT baseline decode → (w, h, comps, pixels) where pixels is
    * row-major at 1 (gray) or 3 (RGB) bytes/px, or None for anything
    * malformed or out of scope: bad SOI, segment framing past the
    * buffer, progressive/extended/12-bit/arithmetic streams,
    * sampling factors above 2, undefined table references, invalid
    * Huffman codes, coefficient overrun, out-of-sequence restarts, a
    * truncated entropy stream, a missing EOI, or trailing bytes
    * after it. 4:2:2/4:2:0 subsampled color IS in scope (real camera
    * output). APPn/COM segments are skipped (a conformant reader
    * must tolerate metadata). */
  private[graft] def decodeNative(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (b == null || b.length < 4) return None
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    try {
      var pos = 2
      val qts = new Array[Array[Int]](4) // natural order
      val dcTabs = new Array[HuffDec](4)
      val acTabs = new Array[HuffDec](4)
      var w = -1; var h = -1; var ncomp = 0
      var compQt: Array[Int] = null
      var sampH: Array[Int] = null
      var sampV: Array[Int] = null
      var restartInterval = 0
      var sofSeen = false

      def segEnd(len: Int): Int = {
        if (len < 2 || pos + len > b.length) throw Malformed
        pos + len
      }

      var scanDone = false
      while (!scanDone) {
        // marker: FF (with optional fill FFs) + code
        if (pos + 2 > b.length) throw Malformed
        if ((b(pos) & 0xFF) != 0xFF) throw Malformed
        var mk = b(pos + 1) & 0xFF; pos += 2
        while (mk == 0xFF) { // fill bytes are legal before a marker
          if (pos >= b.length) throw Malformed
          mk = b(pos) & 0xFF; pos += 1
        }
        mk match {
          case 0xDB => // DQT
            val end = segEnd(u16(b, pos)); pos += 2
            while (pos < end) {
              val pqTq = b(pos) & 0xFF; pos += 1
              if ((pqTq >> 4) != 0) throw Malformed // 16-bit tables out of scope
              val tq = pqTq & 0x0F
              if (pos + 64 > end) throw Malformed
              val qt = new Array[Int](64)
              var z = 0
              while (z < 64) { qt(ZIGZAG(z)) = b(pos + z) & 0xFF; z += 1 }
              qts(tq) = qt
              pos += 64
            }
            if (pos != end) throw Malformed
          case 0xC4 => // DHT
            val end = segEnd(u16(b, pos)); pos += 2
            while (pos < end) {
              val tcTh = b(pos) & 0xFF; pos += 1
              val tc = tcTh >> 4; val th = tcTh & 0x0F
              if (tc > 1 || th > 3 || pos + 16 > end) throw Malformed
              val bits = new Array[Int](16)
              var n = 0
              var i = 0
              while (i < 16) { bits(i) = b(pos + i) & 0xFF; n += bits(i); i += 1 }
              pos += 16
              if (n > 256 || pos + n > end) throw Malformed
              val vals = new Array[Int](n)
              i = 0
              while (i < n) { vals(i) = b(pos + i) & 0xFF; i += 1 }
              pos += n
              val tab = new HuffDec(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            }
            if (pos != end) throw Malformed
          case 0xC0 => // SOF0 baseline
            val end = segEnd(u16(b, pos)); pos += 2
            if (end - pos < 6) throw Malformed
            if ((b(pos) & 0xFF) != 8) throw Malformed // 12-bit out of scope
            h = u16(b, pos + 1); w = u16(b, pos + 3)
            ncomp = b(pos + 5) & 0xFF
            pos += 6
            if (w <= 0 || h <= 0 || w.toLong * h > MAX_PIXELS) throw Malformed
            if (ncomp != 1 && ncomp != 3) throw Malformed
            if (end - pos != 3 * ncomp) throw Malformed
            compQt = new Array[Int](ncomp)
            sampH = new Array[Int](ncomp)
            sampV = new Array[Int](ncomp)
            var c = 0
            while (c < ncomp) {
              val hv = b(pos + 3 * c + 1) & 0xFF
              sampH(c) = hv >> 4; sampV(c) = hv & 0x0F
              // factors 1..2 cover 4:4:4, 4:2:2 and 4:2:0 — what real
              // camera/libjpeg output uses; 3-4x factors are exotic
              if (sampH(c) < 1 || sampH(c) > 2 ||
                sampV(c) < 1 || sampV(c) > 2) throw Malformed
              compQt(c) = b(pos + 3 * c + 2) & 0xFF
              if (compQt(c) > 3) throw Malformed
              c += 1
            }
            // a single-component scan is non-interleaved: its MCU is
            // one data unit regardless of declared factors (T.81
            // A.2.2), so factors are irrelevant — normalize
            if (ncomp == 1) { sampH(0) = 1; sampV(0) = 1 }
            // luma must carry the max factors (chroma-supersampled
            // streams are out of scope)
            if (ncomp == 3 && (sampH.max != sampH(0) || sampV.max != sampV(0)))
              throw Malformed
            pos = end
            sofSeen = true
          case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            throw Malformed // non-baseline frame types out of scope
          case 0xDD => // DRI
            val end = segEnd(u16(b, pos)); pos += 2
            if (end - pos != 2) throw Malformed
            restartInterval = u16(b, pos)
            pos = end
          case app if (app >= 0xE0 && app <= 0xEF) || app == 0xFE => // APPn / COM
            pos = segEnd(u16(b, pos))
          case 0xDA => // SOS → entropy decode, then EOI, then end
            if (!sofSeen) throw Malformed
            val end = segEnd(u16(b, pos)); pos += 2
            val ns = b(pos) & 0xFF; pos += 1
            if (ns != ncomp || end - pos != 2 * ns + 3) throw Malformed
            val dcSel = new Array[Int](ns); val acSel = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              // component ids must be the SOF's, in order (interleaved
              // single-scan baseline — the only in-scope scan shape)
              val tt = b(pos + 2 * c + 1) & 0xFF
              dcSel(c) = tt >> 4; acSel(c) = tt & 0x0F
              if (dcSel(c) > 3 || acSel(c) > 3) throw Malformed
              c += 1
            }
            pos = end
            c = 0
            while (c < ncomp) {
              if (dcTabs(dcSel(c)) == null || acTabs(acSel(c)) == null ||
                qts(compQt(c)) == null) throw Malformed
              c += 1
            }
            val pixels = decodeScan(b, pos, w, h, ncomp, compQt, qts,
              dcSel.map(dcTabs), acSel.map(acTabs), restartInterval,
              sampH, sampV) match {
              case (px, endPos) => pos = endPos; px
            }
            // EOI then nothing: trailing garbage quarantines (the d98
            // strictness carried over)
            if (pos + 2 > b.length || (b(pos) & 0xFF) != 0xFF ||
              (b(pos + 1) & 0xFF) != 0xD9) throw Malformed
            pos += 2
            if (pos != b.length) throw Malformed
            scanDone = true
            return Some((w, h, ncomp, pixels))
          case _ => throw Malformed
        }
      }
      None
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Interleaved single-scan entropy decode + dequant + IDCT + color
    * convert, with per-component sampling factors (4:4:4, 4:2:2,
    * 4:2:0): each MCU carries Hc×Vc blocks per component, the
    * component planes live at their natural (subsampled) resolution,
    * and chroma upsamples by replication at the color convert —
    * box/nearest, the T.81-neutral choice (libjpeg's optional
    * triangle filter differs by ≤ the inter-sample chroma delta,
    * which the interop property bounds on smooth content). Returns
    * (pixels, position after the last entropy byte). */
  private def decodeScan(b: Array[Byte], start: Int, w: Int, h: Int, ncomp: Int,
                         compQt: Array[Int], qts: Array[Array[Int]],
                         dcTab: Array[HuffDec], acTab: Array[HuffDec],
                         restartInterval: Int,
                         sampH: Array[Int], sampV: Array[Int]): (Array[Byte], Int) = {
    val br = new BitReader(b, start)
    val hMax = sampH.max; val vMax = sampV.max
    val mcuW = 8 * hMax; val mcuH = 8 * vMax
    val mcusX = (w + mcuW - 1) / mcuW; val mcusY = (h + mcuH - 1) / mcuH
    val planeW = new Array[Int](ncomp); val planeH = new Array[Int](ncomp)
    val planes = new Array[Array[Int]](ncomp)
    var c0 = 0
    while (c0 < ncomp) {
      planeW(c0) = mcusX * sampH(c0) * 8
      planeH(c0) = mcusY * sampV(c0) * 8
      planes(c0) = new Array[Int](planeW(c0) * planeH(c0))
      c0 += 1
    }
    val dcPred = new Array[Int](ncomp)
    val coef = new Array[Double](64)
    var rstMark = 0
    var done = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && done > 0 && done % restartInterval == 0) {
          br.align()
          // the next two bytes MUST be the expected RSTn — resync
          if (br.pos + 2 > b.length || (b(br.pos) & 0xFF) != 0xFF ||
            (b(br.pos + 1) & 0xFF) != (0xD0 + rstMark)) throw Malformed
          br.pos += 2
          rstMark = (rstMark + 1) % 8
          java.util.Arrays.fill(dcPred, 0)
        }
        var c = 0
        while (c < ncomp) {
          var v = 0
          while (v < sampV(c)) {
            var u = 0
            while (u < sampH(c)) {
              java.util.Arrays.fill(coef, 0.0)
              val qt = qts(compQt(c))
              // DC
              val s = decodeHuff(br, dcTab(c))
              if (s > 11) throw Malformed
              val diff = extend(br.bits(s), s)
              dcPred(c) += diff
              coef(0) = dcPred(c).toDouble * qt(0)
              // AC
              var z = 1
              var eob = false
              while (z < 64 && !eob) {
                val rs = decodeHuff(br, acTab(c))
                val run = rs >> 4; val sz = rs & 0x0F
                if (sz == 0) {
                  if (run == 15) z += 16 // ZRL
                  else eob = true // EOB (run must be 0 in-scope)
                } else {
                  z += run
                  if (z > 63 || sz > 10) throw Malformed
                  val n = ZIGZAG(z)
                  coef(n) = extend(br.bits(sz), sz).toDouble * qt(n)
                  z += 1
                }
              }
              if (z > 64) throw Malformed
              val spatial = idct(coef)
              // place into the component plane (natural resolution);
              // spatial is row-major (by*8+bx), the T.81 layout
              val pw = planeW(c)
              val ox = (mx * sampH(c) + u) * 8
              val oy = (my * sampV(c) + v) * 8
              var by = 0
              while (by < 8) {
                val row = (oy + by) * pw + ox
                var bx = 0
                while (bx < 8) {
                  planes(c)(row + bx) =
                    clamp255(math.round(snap(spatial(by * 8 + bx) + 128.0)))
                  bx += 1
                }
                by += 1
              }
              u += 1
            }
            v += 1
          }
          c += 1
        }
        done += 1
        mx += 1
      }
      my += 1
    }
    br.align()
    val pixels = if (ncomp == 1) {
      val out = new Array[Byte](w * h)
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = planes(0)(y * pw + x).toByte; x += 1 }
        y += 1
      }
      out
    } else {
      val out = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = planes(0)((y * sampV(0) / vMax) * planeW(0) +
            (x * sampH(0) / hMax)).toDouble
          val cb = planes(1)((y * sampV(1) / vMax) * planeW(1) +
            (x * sampH(1) / hMax)) - 128.0
          val cr = planes(2)((y * sampV(2) / vMax) * planeW(2) +
            (x * sampH(2) / hMax)) - 128.0
          val i = y * w + x
          out(3 * i) = clamp255(math.round(snap(yy + 1.402 * cr))).toByte
          out(3 * i + 1) = clamp255(math.round(snap(yy - 0.344136 * cb - 0.714136 * cr))).toByte
          out(3 * i + 2) = clamp255(math.round(snap(yy + 1.772 * cb))).toByte
          x += 1
        }
        y += 1
      }
      out
    }
    (pixels, br.pos)
  }

  /** (w, h, sumR, sumG, sumB) or None — the gate's projection;
    * grayscale contributes its value to all three channels (the
    * PngCodec.decodeSums convention). */
  private[graft] def decodeSums(b: Array[Byte]): Option[Array[Long]] =
    decodeNative(b).map { case (w, h, nc, px) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < px.length) {
        val r = px(i) & 0xFF
        val g = if (nc == 3) px(i + 1) & 0xFF else r
        val bl = if (nc == 3) px(i + 2) & 0xFF else r
        sr += r; sg += g; sb += bl
        i += nc
      }
      Array(w.toLong, h.toLong, sr, sg, sb)
    }
}

/** Deterministic in-plan JPEG synthesizer + gate for d101 — the
  * lossy-codec sibling of [[PngSim]]. Three content kinds cycle on
  * doc_id % 3 so the oracle stays exact THROUGH the lossy codec where
  * the math allows and verdict-bounded where it doesn't:
  *
  *  - kind 0 — GRAYSCALE solid 8×8 tiles (1-component stream): every
  *    block quantizes to a pure-DC coefficient, so the decoded tile
  *    value is the closed form "c rounded up to even, clamped at
  *    255" and the oracle replays exact channel sums.
  *  - kind 1 — gray-valued RGB tiles (3-component stream): R=G=B
  *    makes Cb=Cr=128 exactly, chroma blocks quantize to all-zero,
  *    and the same closed form holds through the FULL color pipeline
  *    (three interleaved components, per-component DC predictors,
  *    the chroma Huffman tables).
  *  - kind 2 — smooth color gradient planes (no mod-256 wrap, so no
  *    ringing): sums are not closed-form through quantization, so
  *    the gate emits NULL sums and an in-plan `close` verdict
  *    (max per-pixel |decoded − original| ≤ 16 — planes quantize
  *    nearly losslessly; literal TRUE in the oracle, the d13/d41
  *    pattern).
  *
  * doc_id % 5 == 2 rows encode with restart interval 3 (DRI + RSTn
  * resync — the marker machinery real camera output uses). Damage
  * slice on doc_id % 7: 0 → truncated to half (entropy stream or
  * segment framing falls off the buffer), 3 → SOI stomped, 5 → SOF0
  * precision byte set to 12 (conformant framing, out-of-scope frame
  * — the scope-quarantine path). */
object JpegSim {

  /** (w, h) — multiples of 8 so solid tiles align exactly to JPEG
    * blocks (kinds 0/1's exactness needs block-aligned tiles; kind 2
    * simply inherits the shape). */
  private[graft] def dims(docId: Long): (Int, Int) =
    ((8 * (1 + docId % 4)).toInt, (8 * (1 + (docId * 3) % 5)).toInt)

  private[graft] def kind(docId: Long): Int = (docId % 3).toInt

  private[graft] def restartInterval(docId: Long): Int =
    if (docId % 5 == 2) 3 else 0

  private[graft] def tileColor(docId: Long, tx: Int, ty: Int): Int =
    ((docId * 9 + 5 * tx + 11 * ty) % 256).toInt

  /** The closed-form decoded value of a solid tile of color c after
    * the q=16 DC quantizer: c rounded up to even, clamped at 255. */
  private[graft] def decodedTile(c: Int): Int =
    if (c % 2 == 0) c else math.min(c + 1, 255)

  /** Original raster (pre-codec) for the doc: bytes at 1 bpp (kind
    * 0) or 3 bpp (kinds 1/2). */
  private[graft] def raster(docId: Long, w: Int, h: Int): Array[Byte] = kind(docId) match {
    case 0 =>
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) = tileColor(docId, x / 8, y / 8).toByte
          x += 1
        }
        y += 1
      }
      px
    case 1 =>
      val px = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val c = tileColor(docId, x / 8, y / 8).toByte
          val i = 3 * (y * w + x)
          px(i) = c; px(i + 1) = c; px(i + 2) = c
          x += 1
        }
        y += 1
      }
      px
    case _ =>
      // smooth planes, amplitude-bounded so values never wrap
      // (wrap discontinuities would ring and break the close bound)
      val px = new Array[Byte](3 * w * h)
      val br = (docId % 96).toInt; val bg = ((docId * 7) % 96).toInt
      val bb = ((docId * 5) % 96).toInt
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = 3 * (y * w + x)
          px(i) = (br + 2 * x + 2 * y).toByte
          px(i + 1) = (bg + x + 2 * y).toByte
          px(i + 2) = (bb + 3 * x + y).toByte
          x += 1
        }
        y += 1
      }
      px
  }

  private[graft] def cleanJpeg(docId: Long): Array[Byte] = {
    val (w, h) = dims(docId)
    JpegCodec.encode(w, h, raster(docId, w, h),
      comps = if (kind(docId) == 0) 1 else 3,
      restartInterval = restartInterval(docId))
  }

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val jpg = cleanJpeg(docId)
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(jpg, jpg.length / 2)
      case 3 => val d = jpg.clone(); d(0) = 'X'; d(1) = 'X'; d
      case 5 =>
        // SOF0 precision byte → 12: segment framing stays intact, so
        // ONLY the scope check can catch it (the PNG CRC-flip analog
        // for a format with no checksums). SOF0 follows SOI(2) +
        // APP0(2+16) + DQT(2+2+65·nQt); precision is at marker+4.
        val d = jpg.clone()
        var i = 2
        var found = false
        while (!found && i + 4 < d.length) {
          if ((d(i) & 0xFF) == 0xFF && (d(i + 1) & 0xFF) == 0xC0) {
            d(i + 4) = 12.toByte
            found = true
          }
          // markers before SOF are all length-prefixed segments
          i += 2 + (((d(i + 2) & 0xFF) << 8) | (d(i + 3) & 0xFF))
        }
        require(found, "SOF0 not found in clean stream")
        d
      case _ => jpg
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
    StructField("sum_b", LongType),
    StructField("close", BooleanType)))

  /** Batched strict JPEG decode → per-image stats with quarantine —
    * the d101 gate, same mapPartitions batch contract as
    * [[PngCodec.pngStats]]. Exact-sum columns carry only for the
    * tile kinds (NULL for kind 2, whose sums are not closed-form
    * through quantization); `close` is the in-plan round-trip bound
    * vs the deterministic original raster (≤ 1 for tiles by the DC
    * closed form, ≤ 16 for the smooth planes). */
  def stats(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    withPayloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            JpegCodec.decodeNative(r.getAs[Array[Byte]](1)) match {
              case Some((w, h, nc, px)) =>
                var sr = 0L; var sg = 0L; var sb = 0L
                var i = 0
                while (i < px.length) {
                  val red = px(i) & 0xFF
                  val g = if (nc == 3) px(i + 1) & 0xFF else red
                  val bl = if (nc == 3) px(i + 2) & 0xFF else red
                  sr += red; sg += g; sb += bl
                  i += nc
                }
                val orig = raster(id, w, h)
                var maxErr = 0
                if (orig.length == px.length) {
                  var j = 0
                  while (j < px.length) {
                    val e = math.abs((px(j) & 0xFF) - (orig(j) & 0xFF))
                    if (e > maxErr) maxErr = e
                    j += 1
                  }
                } else maxErr = 256
                val k = kind(id)
                val exact = k != 2
                Row(id, "ok", w, h,
                  if (exact) java.lang.Long.valueOf(sr) else null,
                  if (exact) java.lang.Long.valueOf(sg) else null,
                  if (exact) java.lang.Long.valueOf(sb) else null,
                  java.lang.Boolean.valueOf(maxErr <= 16))
              case None =>
                Row(id, "quarantined", null, null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
